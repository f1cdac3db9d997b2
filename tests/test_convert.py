"""Checkpoint converter: key-set parity, layout round-trip, tail transfer."""

import jax
import numpy as np
import pytest
import torch

from m2trans_tpu.config import Config
from m2trans_tpu.models import init_m2trans
from m2trans_tpu.train.convert import (
    load_torch_checkpoint,
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)


def reference_key_set(scale, n_blocks):
    """The exact key set of the reference model's state_dict (derived from
    models/M2Trans_network.py module structure)."""
    keys = {
        "sub_mean.weight", "sub_mean.bias",
        "add_mean.weight", "add_mean.bias",
        "head.weight", "head.bias",
    }
    for i in range(n_blocks):
        for a in ("attn1", "attn2", "attn3", "attn4"):
            keys |= {
                f"body.{i}.{a}.rel_h", f"body.{i}.{a}.rel_w",
                f"body.{i}.{a}.qkv_conv.weight",
            }
        keys |= {f"body.{i}.feed_forward.0.weight",
                 f"body.{i}.feed_forward.0.bias"}
    if scale == 4:
        keys |= {"tail.0.weight", "tail.0.bias", "tail.3.weight",
                 "tail.3.bias", "tail.6.weight"}
    else:
        keys |= {"tail.0.weight", "tail.0.bias", "tail.3.weight"}
    return {f"module.{k}" for k in keys}


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_export_produces_reference_keys(scale):
    cfg = Config(scale=scale, n_feats=8, n_blocks=2)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    sd = params_to_torch_state_dict(params, cfg)
    assert set(sd.keys()) == reference_key_set(scale, 2)


@pytest.mark.parametrize("scale", [2, 4])
def test_roundtrip_is_identity(scale, rng):
    cfg = Config(scale=scale, n_feats=8, n_blocks=2)
    params = init_m2trans(jax.random.PRNGKey(1), cfg)
    sd = params_to_torch_state_dict(params, cfg)
    back = torch_state_dict_to_params(sd, cfg)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat1) == len(flat2)
    for path, leaf in flat1:
        np.testing.assert_allclose(np.asarray(leaf), flat2[path], atol=0,
                                   err_msg=str(path))


def test_shapes_match_reference_conventions():
    cfg = Config(scale=4, n_feats=64, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    sd = params_to_torch_state_dict(params, cfg)
    # torch conventions: conv OIHW; rel embeddings 4-D
    assert sd["module.head.weight"].shape == (64, 3, 3, 3)
    assert sd["module.body.0.attn1.qkv_conv.weight"].shape == (48, 16, 1, 1)
    assert sd["module.body.0.attn3.qkv_conv.weight"].shape == (768, 256, 1, 1)
    assert sd["module.body.0.attn1.rel_h"].shape == (1, 10, 1, 8)
    assert sd["module.body.0.attn1.rel_w"].shape == (1, 1, 10, 8)
    assert sd["module.tail.0.weight"].shape == (256, 64, 1, 1)
    assert sd["module.tail.6.weight"].shape == (3, 64, 3, 3)


def test_load_torch_pt_file(tmp_path):
    cfg = Config(scale=2, n_feats=8, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(2), cfg)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          params_to_torch_state_dict(params, cfg).items()}
    path = tmp_path / "model_x2_1.pt"
    torch.save({"epoch": 1, "model_state_dict": sd}, path)
    loaded = load_torch_checkpoint(str(path), cfg)
    np.testing.assert_allclose(np.asarray(params["head"]["w"]),
                               loaded["head"]["w"], atol=0)
    np.testing.assert_allclose(np.asarray(params["body"][0]["attn2"]["rel_h"]),
                               loaded["body"][0]["attn2"]["rel_h"], atol=0)


def test_scale_transfer_skips_tail(tmp_path):
    # an x2 checkpoint seeds an x4 model: backbone loads, tail stays fresh
    # (reference load_state_dict tail tolerance, models/M2Trans_network.py:88-112)
    cfg2 = Config(scale=2, n_feats=8, n_blocks=1)
    params2 = init_m2trans(jax.random.PRNGKey(3), cfg2)
    sd = params_to_torch_state_dict(params2, cfg2)
    cfg4 = cfg2.replace(scale=4)
    partial = torch_state_dict_to_params(sd, cfg4, load_tail=False)
    assert "tail" not in partial
    np.testing.assert_allclose(np.asarray(params2["head"]["w"]),
                               partial["head"]["w"], atol=0)


def test_orbax_save_load_roundtrip(tmp_path, rng):
    from m2trans_tpu.train.checkpoint import load_params_any, save_params

    cfg = Config(scale=2, n_feats=8, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(5), cfg)
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    loaded = load_params_any(path, cfg)
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(loaded)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=0)
