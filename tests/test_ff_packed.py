"""Fused packed feed-forward conv (ops/pallas/ff_packed.py) — interpret-
mode parity with the unpack -> conv2d -> repack composition it replaces,
including the packed residual add and zero edge padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2trans_tpu.ops.conv import conv2d
from m2trans_tpu.ops.pallas.ff_packed import packed_ff_conv
from m2trans_tpu.ops.pallas.halo_attn_packed import pack_body, unpack_body


@pytest.mark.parametrize("h,w", [(32, 32), (32, 96), (24, 40)])
def test_packed_ff_conv_matches_composition(h, w, rng):
    g, nb, cb = 8, 4, 16
    c = nb * cb
    x = jnp.asarray(rng.normal(0, 0.5, (g, h, w, c)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(0, 0.5, (g, h, w, c)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32))

    oc = pack_body(x, g, interpret=True)
    xp = pack_body(res, g, interpret=True)

    got = packed_ff_conv(oc, xp, wgt.astype(jnp.bfloat16), bias, g=g,
                         nb=nb, interpret=True)
    got_u = np.asarray(unpack_body(got, g, interpret=True), np.float32)

    ff = conv2d(x, wgt, bias, padding="zeros", dtype=jnp.bfloat16)
    want = np.asarray((ff.astype(jnp.float32)
                       + res.astype(jnp.float32)).astype(jnp.bfloat16),
                      np.float32)
    np.testing.assert_allclose(got_u, want, atol=3e-2, rtol=3e-2)
    assert float(np.abs(got_u - want).mean()) < 3e-3


@pytest.mark.parametrize("mode", ["fused", "pair"])
def test_packed_ff_conv_in_model_packed_core(rng, monkeypatch, mode):
    """Every alternative _FF_MODE must reproduce the default 'unpack'
    CFTM output through the whole packed-core path."""
    import m2trans_tpu.models.m2trans as mm
    from m2trans_tpu.config import Config
    from m2trans_tpu.models import init_m2trans
    from m2trans_tpu.models.m2trans import (
        ComputePolicy,
        _cftm_apply_fused_packed,
    )

    cfg = Config(scale=4, n_feats=64, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)["body"][0]
    pol = ComputePolicy(dtype=jnp.bfloat16, precision=None,
                        use_pallas=True, packed_body=True)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 64)).astype(np.float32))

    want = np.asarray(_cftm_apply_fused_packed(
        params, x, policy=pol, block=8, halo=1), np.float32)
    monkeypatch.setattr(mm, "_FF_MODE", mode)
    got = np.asarray(_cftm_apply_fused_packed(
        params, x, policy=pol, block=8, halo=1), np.float32)
    scale = float(np.abs(want).max()) or 1.0
    np.testing.assert_allclose(got, want, atol=3e-2 * scale)
    assert float(np.abs(got - want).mean()) < 3e-3 * scale


def test_ff_pair_conv_matches_composition(rng):
    """_ff_pair_conv (pair-major permutation + block-diagonal K=128
    conv + inverse permutation) must match the exact unpack -> conv2d ->
    repack composition tightly — the permutation einsums move one
    product per lane (exact for bf16) and the conv rounds to bf16 at
    the same point; only f32 tap-summation order differs."""
    import m2trans_tpu.models.m2trans as mm
    from m2trans_tpu.models.m2trans import ComputePolicy

    g, nb, cb, h, w = 8, 4, 16, 24, 40
    c = nb * cb
    x = jnp.asarray(rng.normal(0, 0.5, (g, h, w, c)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(0, 0.5, (g, h, w, c)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32))

    oc = pack_body(x, g, interpret=True)
    xp = pack_body(res, g, interpret=True)

    got = mm._ff_pair_conv(oc, xp, wgt, bias, g=g)
    got_u = np.asarray(unpack_body(got, g, interpret=True), np.float32)

    ff = conv2d(x, wgt, bias, padding="zeros", dtype=jnp.bfloat16)
    want = np.asarray((ff.astype(jnp.float32)
                       + res.astype(jnp.float32)).astype(jnp.bfloat16),
                      np.float32)
    np.testing.assert_allclose(got_u, want, atol=1e-2, rtol=1e-2)
    assert float(np.abs(got_u - want).mean()) < 1e-3


@pytest.mark.parametrize("h,w", [(32, 32), (24, 40)])
def test_ff_pair_fused_kernel_matches_xla_pair(h, w, rng):
    """The fused pair-major kernel (ops/pallas/ff_pair.py, interpret
    mode) must match the XLA pair composition it mirrors bit-closely —
    identical permutation/conv/rounding sequence, MXU dots in VMEM."""
    import m2trans_tpu.models.m2trans as mm
    from m2trans_tpu.ops.pallas.ff_pair import ff_pair_conv_fused

    g, nb, cb = 8, 4, 16
    c = nb * cb
    x = jnp.asarray(rng.normal(0, 0.5, (g, h, w, c)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(0, 0.5, (g, h, w, c)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32))

    oc = pack_body(x, g, interpret=True)
    xp = pack_body(res, g, interpret=True)

    got = np.asarray(ff_pair_conv_fused(
        oc, xp, wgt.astype(jnp.bfloat16), bias.astype(jnp.float32),
        g=g, interpret=True).astype(jnp.float32))
    want = np.asarray(mm._ff_pair_conv(oc, xp, wgt, bias, g=g)
                      .astype(jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_ff_pairk_vjp_matches_xla_pair(rng):
    """_ff_pairk's custom VJP (fused kernel fwd + XLA-pair composition
    bwd) must match differentiating the XLA pair composition directly.
    The packed-body flow itself is inference-only (training takes the
    per-branch fused path), so this is belt-and-braces coverage for the
    kernel's differentiation rule."""
    import m2trans_tpu.models.m2trans as mm

    g, nb, cb, h, w = 8, 4, 16, 32, 32
    c = nb * cb
    x = jnp.asarray(rng.normal(0, 0.5, (g, h, w, c)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(0, 0.5, (g, h, w, c)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32))
    oc = pack_body(x, g, interpret=True)
    xp = pack_body(res, g, interpret=True)

    def f_k(o, ww, bb):
        y = mm._ff_pairk(o, xp, ww, bb, g, None, True)
        return (y.astype(jnp.float32) ** 2).mean()

    def f_x(o, ww, bb):
        y = mm._ff_pair_conv(o, xp, ww, bb, g=g)
        return (y.astype(jnp.float32) ** 2).mean()

    gk = jax.grad(f_k, argnums=(0, 1, 2))(oc, wgt, bias)
    gx = jax.grad(f_x, argnums=(0, 1, 2))(oc, wgt, bias)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gx)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        tol = max(2e-3, 2e-2 * float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, atol=tol)
