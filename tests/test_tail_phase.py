"""Phase-plane tail (ops/tail_phase.py): parity with the conv->shuffle
composition (the f32 reference path), differentiability, and the bf16
fast-path wiring in tail_apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2trans_tpu.config import Config
from m2trans_tpu.models import init_m2trans
from m2trans_tpu.models.m2trans import ComputePolicy, tail_apply
from m2trans_tpu.ops.tail_phase import tail_phase_apply

HIGH = jax.lax.Precision.HIGHEST


def _ref_tail(params, x, scale):
    pol = ComputePolicy(dtype=jnp.float32, precision=HIGH, use_pallas=False)
    return tail_apply(params, x, scale=scale, policy=pol)


@pytest.mark.parametrize("scale", [2, 3, 4])
@pytest.mark.parametrize("shape", [(2, 16, 24), (1, 8, 8), (3, 24, 16)])
def test_matches_conv_composition(scale, shape, rng):
    """Same math as [1x1 conv -> PixelShuffle -> GELU]* -> 3x3 reflect conv
    (reference models/M2Trans_network.py:40-56), to float rounding."""
    cfg = Config(scale=scale, n_feats=16, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)["tail"]
    b, h, w = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, 16)).astype(np.float32))
    want = np.asarray(_ref_tail(params, x, scale))
    got = np.asarray(tail_phase_apply(params, x, scale=scale,
                                      dtype=jnp.float32, precision=HIGH))
    assert got.shape == (b, h * scale, w * scale, 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_reflect_ring_semantics(rng):
    """The HR border must match the conv path exactly — the phase-space
    reflect remap is the subtle part (HR[-1] = HR[1] across phase planes);
    check the border pixels specifically at a rectangular shape."""
    cfg = Config(scale=4, n_feats=16, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)["tail"]
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16)).astype(np.float32))
    want = np.asarray(_ref_tail(params, x, 4))
    got = np.asarray(tail_phase_apply(params, x, scale=4,
                                      dtype=jnp.float32, precision=HIGH))
    for sl in [np.s_[:, 0, :, :], np.s_[:, -1, :, :],
               np.s_[:, :, 0, :], np.s_[:, :, -1, :]]:
        np.testing.assert_allclose(got[sl], want[sl], atol=2e-5)


def test_differentiable_and_grads_match(rng):
    """Unlike the retired Pallas tail kernel, the phase tail is plain XLA:
    gradients flow and match the conv composition's."""
    cfg = Config(scale=4, n_feats=16, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)["tail"]
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))

    g_ref = jax.grad(lambda p: jnp.sum(_ref_tail(p, x, 4) ** 2))(params)
    g_new = jax.grad(lambda p: jnp.sum(tail_phase_apply(
        p, x, scale=4, dtype=jnp.float32, precision=HIGH) ** 2))(params)
    for k in g_ref:
        for kk in g_ref[k]:
            np.testing.assert_allclose(np.asarray(g_new[k][kk]),
                                       np.asarray(g_ref[k][kk]),
                                       atol=5e-4, rtol=1e-4)


def test_bf16_policy_routes_to_phase_tail(rng):
    """tail_apply(dtype=bf16) must produce the phase-tail result (and stay
    close to the f32 composition)."""
    cfg = Config(scale=4, n_feats=16, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)["tail"]
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    pol = ComputePolicy(dtype=jnp.bfloat16, precision=None, use_pallas=False)
    via_apply = np.asarray(tail_apply(params, x, scale=4, policy=pol))
    direct = np.asarray(tail_phase_apply(params, x, scale=4))
    np.testing.assert_array_equal(via_apply, direct)
    f32 = np.asarray(_ref_tail(params, x, 4))
    np.testing.assert_allclose(via_apply.astype(np.float32), f32,
                               atol=0.1, rtol=0.05)
