"""Fused Pallas halo-attention kernel vs the XLA path (interpret mode on
CPU; the compiled path is exercised on real TPU by bench.py and the
TPU-marked test below when a TPU is present)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2trans_tpu.ops.halo_attention import halo_attention
from m2trans_tpu.ops.pallas.halo_attn import halo_attention_qkv_fused


def xla_ref(x, w_qkv, rel_h, rel_w, block=8, halo=1):
    c = x.shape[-1]
    qkv = jnp.einsum("bhwc,cd->bhwd", x, w_qkv,
                     precision=jax.lax.Precision.HIGHEST)
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    return halo_attention(q, k, v, rel_h, rel_w, block=block, halo=halo,
                          precision=jax.lax.Precision.HIGHEST)


@pytest.mark.parametrize("c,h,w", [(8, 8, 8), (16, 16, 24), (32, 8, 16)])
def test_fused_kernel_matches_xla(c, h, w, rng):
    block, halo = 8, 1
    x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
    w_qkv = jnp.asarray(
        rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.2)
    rel_h = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))
    rel_w = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))

    got = halo_attention_qkv_fused(x, w_qkv, rel_h, rel_w, block=block,
                                   halo=halo, interpret=True)
    want = xla_ref(x, w_qkv, rel_h, rel_w, block, halo)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fused_kernel_grad_matches_xla(rng):
    c, h, w = 8, 8, 16
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    w_qkv = jnp.asarray(
        rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.2)
    rel_h = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))
    rel_w = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))

    def loss_fused(x, w, rh, rw):
        return jnp.sum(halo_attention_qkv_fused(
            x, w, rh, rw, interpret=True) ** 2)

    def loss_xla(x, w, rh, rw):
        return jnp.sum(xla_ref(x, w, rh, rw) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w_qkv, rel_h, rel_w)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, w_qkv, rel_h, rel_w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_model_with_pallas_matches_xla_path(rng):
    # the Pallas path is the bf16 fast path (f32 parity mode stays on
    # XLA+HIGHEST, see models/m2trans.py tblock_apply); compare bf16 pallas
    # against bf16 XLA
    from m2trans_tpu.config import Config
    from m2trans_tpu.models import init_m2trans, m2trans_apply
    from m2trans_tpu.models.m2trans import ComputePolicy

    cfg = Config(scale=2, n_feats=8, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    pol_xla = ComputePolicy(dtype=jnp.bfloat16, precision=None,
                            use_pallas=False)
    pol_pal = ComputePolicy(dtype=jnp.bfloat16, precision=None,
                            use_pallas=True)
    y_xla = np.asarray(m2trans_apply(params, x, cfg, policy=pol_xla))
    y_pal = np.asarray(m2trans_apply(params, x, cfg, policy=pol_pal))
    assert y_pal.shape == y_xla.shape
    assert np.abs(y_pal - y_xla).mean() < 1e-2


@pytest.mark.parametrize("levels,cb,h,w", [(1, 8, 16, 16), (2, 4, 32, 64)])
def test_wavelet_fused_branch_matches_xla(levels, cb, h, w, rng):
    from m2trans_tpu.ops.wavelet import haar_dwt, haar_iwt

    c = cb * 4 ** levels
    x = jnp.asarray(rng.standard_normal((2, h, w, cb)).astype(np.float32))
    w_qkv = jnp.asarray(
        rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.1)
    rel_h = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))
    rel_w = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))

    got = halo_attention_qkv_fused(x, w_qkv, rel_h, rel_w, levels=levels,
                                   interpret=True)
    z = x
    for _ in range(levels):
        z = haar_dwt(z)
    want = xla_ref(z, w_qkv, rel_h, rel_w)
    for _ in range(levels):
        want = haar_iwt(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_wavelet_fused_branch_grad(rng):
    from m2trans_tpu.ops.wavelet import haar_dwt, haar_iwt

    levels, cb, h, w = 1, 4, 16, 16
    c = cb * 4 ** levels
    x = jnp.asarray(rng.standard_normal((1, h, w, cb)).astype(np.float32))
    w_qkv = jnp.asarray(
        rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.1)
    rel_h = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))
    rel_w = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))

    def loss_fused(x, wq):
        return jnp.sum(halo_attention_qkv_fused(
            x, wq, rel_h, rel_w, levels=levels, interpret=True) ** 2)

    def loss_xla(x, wq):
        z = haar_dwt(x)
        return jnp.sum(haar_iwt(xla_ref(z, wq, rel_h, rel_w)) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, w_qkv)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(x, w_qkv)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("levels,cb", [(0, 16), (1, 8), (2, 4)])
def test_banded_kernel_matches_xla(levels, cb, rng):
    # the banded (row-band grid) variant stays in use for large frames;
    # keep it covered now that small shapes route to the whole-image kernel
    from m2trans_tpu.ops.pallas.halo_attn import _halo_attention_banded_impl
    from m2trans_tpu.ops.wavelet import haar_dwt, haar_iwt

    c = cb * 4 ** levels
    h = w = 8 * 2 ** levels * 2
    x = jnp.asarray(rng.standard_normal((1, h, w, cb)).astype(np.float32))
    w_qkv = jnp.asarray(
        rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.1)
    rel_h = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))
    rel_w = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))
    got = _halo_attention_banded_impl(x, w_qkv, rel_h, rel_w, block=8,
                                      halo=1, levels=levels, interpret=True)
    z = x
    for _ in range(levels):
        z = haar_dwt(z)
    want = xla_ref(z, w_qkv, rel_h, rel_w)
    for _ in range(levels):
        want = haar_iwt(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


@pytest.mark.parametrize("levels,cb,w", [(2, 16, 256), (0, 16, 640)])
def test_tiled_wide_frame_matches_xla(levels, cb, w, rng):
    """Wide frames route to the width-blocked (4-view) tiled kernel."""
    from m2trans_tpu.ops.pallas.halo_attn import _halo_attention_tiled_impl
    from m2trans_tpu.ops.wavelet import haar_dwt, haar_iwt

    c = cb * 4 ** levels
    h = 8 * 2 ** levels * 2
    x = jnp.asarray(rng.standard_normal((1, h, w, cb)).astype(np.float32))
    w_qkv = jnp.asarray(
        rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.05)
    rel_h = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))
    rel_w = jnp.asarray(rng.standard_normal((10, c // 2)).astype(np.float32))
    got = _halo_attention_tiled_impl(x, w_qkv, rel_h, rel_w, block=8,
                                     halo=1, levels=levels, interpret=True)
    z = x
    for _ in range(levels):
        z = haar_dwt(z)
    want = xla_ref(z, w_qkv, rel_h, rel_w)
    for _ in range(levels):
        want = haar_iwt(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
