"""Full-model parity vs a from-spec PyTorch oracle (tests/torch_ref.py).

The strongest composition-level check available while the released ``.pt``
checkpoints are absent from the mount: a randomly-initialized torch model
with the reference's exact architecture and state_dict keys is exported
through m2trans_tpu.train.convert and its forward compared against our
f32+HIGHEST JAX forward. Any divergence in layout conversion, padding
semantics, rel-pos application, wavelet band order, pixel-shuffle channel
order, or the pad-to-32/crop rule fails here even if every per-op oracle
passes (reference test.py:64-93 is the corresponding eval path).
"""

import numpy as np
import pytest
import torch

import jax

from m2trans_tpu.config import Config
from m2trans_tpu.models import ComputePolicy, m2trans_apply
from m2trans_tpu.train.convert import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)

from torch_ref import TorchM2Trans, TBlock


def _rand_torch_model(scale, n_feats, n_blocks, seed):
    torch.manual_seed(seed)
    m = TorchM2Trans(scale=scale, n_feats=n_feats, n_blocks=n_blocks)
    for mod in m.modules():
        if isinstance(mod, TBlock):
            mod.reset_parameters_like_reference()
    return m.eval()


@pytest.mark.parametrize("scale,hw", [(2, (24, 40)), (3, (32, 32)),
                                      (4, (20, 28))])
def test_full_model_matches_torch_oracle(scale, hw):
    """f32/HIGHEST forward vs torch double-precision forward, <=1e-5.

    Shapes include non-multiples of 32 so the reflect pad-to-32 + crop path
    (reference :76-86) is exercised through both stacks."""
    cfg = Config(scale=scale, n_feats=8, n_blocks=2, colors=3)
    tm = _rand_torch_model(scale, cfg.n_feats, cfg.n_blocks, seed=scale)
    params = torch_state_dict_to_params(tm.state_dict(), cfg)

    rng = np.random.default_rng(scale)
    x = rng.uniform(0.0, 1.0, (2, *hw, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tm.double()(torch.from_numpy(
            x.transpose(0, 3, 1, 2)).double()).numpy().transpose(0, 2, 3, 1)

    ours = np.asarray(m2trans_apply(params, jax.numpy.asarray(x), cfg,
                                    policy=ComputePolicy()))
    assert ours.shape == ref.shape == (2, hw[0] * scale, hw[1] * scale, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_full_model_matches_torch_oracle_flagship_width():
    """One block at the flagship width (n_feats=64) so all four branch
    channel widths (16/64/256/256) cross the converter and both forwards."""
    cfg = Config(scale=4, n_feats=64, n_blocks=1, colors=3)
    tm = _rand_torch_model(4, 64, 1, seed=7)
    params = torch_state_dict_to_params(tm.state_dict(), cfg)

    rng = np.random.default_rng(7)
    x = rng.uniform(0.0, 1.0, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm.double()(torch.from_numpy(
            x.transpose(0, 3, 1, 2)).double()).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(m2trans_apply(params, jax.numpy.asarray(x), cfg,
                                    policy=ComputePolicy()))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_export_roundtrip_through_torch_model():
    """params -> torch state_dict loads strict=True into the torch oracle
    (key-set and shape parity with the reference's checkpoint format,
    train.py:342-349), and the round trip is bit-exact."""
    cfg = Config(scale=4, n_feats=8, n_blocks=2, colors=3)
    tm = _rand_torch_model(4, 8, 2, seed=3)
    params = torch_state_dict_to_params(tm.state_dict(), cfg)

    sd = params_to_torch_state_dict(params, cfg, module_prefix=False)
    tm2 = TorchM2Trans(scale=4, n_feats=8, n_blocks=2)
    tm2.load_state_dict({k: torch.from_numpy(np.asarray(v))
                         for k, v in sd.items()}, strict=True)
    for k, v in tm.state_dict().items():
        np.testing.assert_array_equal(v.numpy(), tm2.state_dict()[k].numpy())
