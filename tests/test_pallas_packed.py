"""Parity tests for the lane-packed fused cascade kernel (round 3).

Oracle: the XLA composition (halo_attn._cascade_xla) — itself parity-
tested against torch semantics in test_cftm_fused.py / test_torch_parity.
The packed kernel must reproduce it to f32-accumulation noise for every
DWT level, G, and cascade-add arrangement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2trans_tpu.ops.pallas import halo_attn_packed as pk
from m2trans_tpu.ops.pallas.halo_attn import _cascade_xla


def _mk(rng, b, h, w, cb, levels, with_add, dtype=jnp.bfloat16):
    c = cb * 4 ** levels
    x = jnp.asarray(rng.standard_normal((b, h, w, cb)), dtype)
    xa = (jnp.asarray(rng.standard_normal((b, h, w, cb)), dtype)
          if with_add else None)
    s = jnp.asarray(rng.uniform(0.5, 1.5, (b, cb)), jnp.float32)
    t = jnp.asarray(rng.uniform(-0.5, 0.5, (b, cb)), jnp.float32)
    w_qkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * c ** -0.5, dtype)
    rel_h = jnp.asarray(rng.standard_normal((10, c // 2)) * 0.3, jnp.float32)
    rel_w = jnp.asarray(rng.standard_normal((10, c // 2)) * 0.3, jnp.float32)
    return x, xa, s, t, w_qkv, rel_h, rel_w


@pytest.mark.parametrize("levels,cb,g", [
    (0, 16, 4), (0, 16, 8), (0, 16, 2),
    (1, 16, 2), (1, 16, 4),
    (2, 16, 2),
])
@pytest.mark.parametrize("with_add", [False, True])
def test_packed_matches_xla(levels, cb, g, with_add):
    rng = np.random.default_rng(42 + levels * 10 + g)
    b, h, w = g, 32, 32
    x, xa, s, t, w_qkv, rel_h, rel_w = _mk(rng, b, h, w, cb, levels,
                                           with_add)
    r = 0.5 if with_add else 0.0

    got = pk.packed_cascade_impl(x, xa, s, t, w_qkv, rel_h, rel_w,
                                 block=8, halo=1, levels=levels, g=g,
                                 r=r, interpret=True)
    want = _cascade_xla(x, xa, s, t, w_qkv, rel_h, rel_w, block=8,
                        halo=1, levels=levels, r=r)
    g32, w32 = np.asarray(got, np.float32), np.asarray(want, np.float32)
    np.testing.assert_allclose(g32, w32, atol=5e-2, rtol=5e-2)
    assert float(np.abs(g32 - w32).mean()) < 5e-3


def test_packed_multiple_groups_per_batch():
    """B > G: several packed programs along the batch grid axis."""
    rng = np.random.default_rng(7)
    levels, cb, g = 0, 16, 2
    x, xa, s, t, w_qkv, rel_h, rel_w = _mk(rng, 6, 16, 24, cb, levels, True)
    got = pk.packed_cascade_impl(x, xa, s, t, w_qkv, rel_h, rel_w,
                                 block=8, halo=1, levels=levels, g=g,
                                 r=0.5, interpret=True)
    want = _cascade_xla(x, xa, s, t, w_qkv, rel_h, rel_w, block=8,
                        halo=1, levels=levels, r=0.5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 4, 4, 16)), jnp.float32)
    for g in (2, 4, 8):
        y = pk.unpack_batch(pk.pack_batch(x, g), g)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_packed_weight_layout():
    """The packed projection must equal the per-image projection."""
    rng = np.random.default_rng(11)
    cb, g, levels = 16, 4, 1
    c = cb * 4 ** levels
    w_qkv = jnp.asarray(rng.standard_normal((c, 3 * c)), jnp.float32)
    rel_h = jnp.zeros((10, c // 2), jnp.float32)
    w_p, _, _ = pk.pack_branch_weights(w_qkv, rel_h, rel_h, cb=cb, g=g,
                                       levels=levels)
    # packed input: per-image coarse vectors scattered into p-layout
    z = rng.standard_normal((g, c)).astype(np.float32)
    d = pk._d_of_packed(cb, g, g * c)
    slot = pk._slot_of_packed(cb, g, g * c)
    zp = np.zeros(g * c, np.float32)
    for p in range(g * c):
        zp[p] = z[slot[p], d[p]]
    got = np.asarray(jnp.asarray(zp)[None, :] @ w_p)[0]
    want_per_img = z @ np.asarray(w_qkv)  # (g, 3c)
    for j in range(3):
        for p in range(g * c):
            np.testing.assert_allclose(
                got[j * g * c + p], want_per_img[slot[p], j * c + d[p]],
                rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_add", [False, True])
@pytest.mark.parametrize("levels", [1, 2])
def test_packed_front_matches_xla(levels, with_add):
    """Packed-front variant (packed affine/DWT/IWT, per-subgroup native-C
    attention) == XLA composition."""
    rng = np.random.default_rng(5 + levels)
    g, cb = 8, 16
    b, h, w = g, 32, 32
    x, xa, s, t, w_qkv, rel_h, rel_w = _mk(rng, b, h, w, cb, levels,
                                           with_add)
    r = 0.5 if with_add else 0.0
    got = pk.packed_front_cascade_impl(
        x, xa, s, t, w_qkv, rel_h, rel_w, block=8, halo=1, levels=levels,
        g=g, r=r, interpret=True)
    want = _cascade_xla(x, xa, s, t, w_qkv, rel_h, rel_w, block=8,
                        halo=1, levels=levels, r=r)
    g32, w32 = np.asarray(got, np.float32), np.asarray(want, np.float32)
    np.testing.assert_allclose(g32, w32, atol=5e-2, rtol=5e-2)
    assert float(np.abs(g32 - w32).mean()) < 5e-3


@pytest.mark.parametrize("levels,cb,g", [
    (0, 16, 4), (0, 16, 8), (1, 16, 2), (1, 16, 4),
])
@pytest.mark.parametrize("with_add", [False, True])
def test_packed_bwd_matches_banded_bwd(levels, cb, g, with_add):
    """Packed backward vs the (gradient-parity-tested) banded backward:
    identical math in packed lanes, so all grads must match to bf16
    boundary noise."""
    from m2trans_tpu.ops.pallas.halo_attn import _cascade_bwd_impl

    rng = np.random.default_rng(17 + levels * 10 + g)
    b, h, w = max(g, 4), 32, 32
    x, xa, s, t, w_qkv, rel_h, rel_w = _mk(rng, b, h, w, cb, levels,
                                           with_add)
    r = 0.5 if with_add else 0.0
    g_out = jnp.asarray(rng.standard_normal((b, h, w, cb)), jnp.bfloat16)

    got = pk.packed_cascade_bwd_impl(
        x, xa, s, t, w_qkv, rel_h, rel_w, g_out, block=8, halo=1,
        levels=levels, g=g, r=r, interpret=True)
    want = _cascade_bwd_impl(
        x, xa, s, t, w_qkv, rel_h, rel_w, g_out, block=8, halo=1,
        levels=levels, r=r, interpret=True)

    names = (("dx", "dx_add", "ds", "dt", "dw_qkv", "drel_h", "drel_w")
             if with_add else
             ("dx", "ds", "dt", "dw_qkv", "drel_h", "drel_w"))
    for name, a, bnd in zip(names, got, want):
        bb = np.asarray(bnd, np.float32)
        tol = max(2e-3, 8e-3 * float(np.abs(bb).max()))
        np.testing.assert_allclose(np.asarray(a, np.float32), bb,
                                   atol=tol, err_msg=name)


def test_unpack_weight_grads_adjoint():
    """unpack_weight_grads must be the exact adjoint of
    pack_branch_weights: <pack(W), Gp> == <W, unpack(Gp)> for random
    cotangents (f32, both levels)."""
    rng = np.random.default_rng(5)
    for levels, cb, g in ((0, 16, 4), (1, 4, 4), (2, 4, 2)):
        c = cb * 4 ** levels
        gc = g * c
        w = jnp.asarray(rng.standard_normal((c, 3 * c)), jnp.float32)
        rh = jnp.asarray(rng.standard_normal((10, c // 2)), jnp.float32)
        rw = jnp.asarray(rng.standard_normal((10, c // 2)), jnp.float32)
        wp, rhp, rwp = pk.pack_branch_weights(w, rh, rw, cb=cb, g=g,
                                              levels=levels)
        gw = jnp.asarray(rng.standard_normal(wp.shape), jnp.float32)
        grh = jnp.asarray(rng.standard_normal(rhp.shape), jnp.float32)
        grw = jnp.asarray(rng.standard_normal(rwp.shape), jnp.float32)
        dw, drh, drw = pk.unpack_weight_grads(gw, grh, grw, cb=cb, g=g,
                                              levels=levels)
        np.testing.assert_allclose(float(jnp.vdot(wp, gw)),
                                   float(jnp.vdot(w, dw)), rtol=1e-5)
        np.testing.assert_allclose(float(jnp.vdot(rhp, grh)),
                                   float(jnp.vdot(rh, drh)), rtol=1e-5)
        np.testing.assert_allclose(float(jnp.vdot(rwp, grw)),
                                   float(jnp.vdot(rw, drw)), rtol=1e-5)


@pytest.mark.parametrize("levels,g,slab,hw", [(0, 4, 32, 64),
                                              (1, 2, 32, 96)])
@pytest.mark.parametrize("with_add", [False, True])
def test_packed_bwd_tiled_matches_banded(levels, g, slab, hw, with_add):
    """Column-slab tiled packed backward vs the banded backward: the 2-D
    overlap-add of packed dz tiles plus the packed weight-grad
    accumulation across the 3-D grid must reproduce the full-width
    grads."""
    from m2trans_tpu.ops.pallas.halo_attn import _cascade_bwd_impl

    rng = np.random.default_rng(23 + levels * 10 + g)
    b = max(g, 4)
    x, xa, s, t, w_qkv, rel_h, rel_w = _mk(rng, b, 32, hw, 16, levels,
                                           with_add)
    r = 0.5 if with_add else 0.0
    g_out = jnp.asarray(rng.standard_normal((b, 32, hw, 16)),
                        jnp.bfloat16)

    got = pk.packed_cascade_bwd_tiled_impl(
        x, xa, s, t, w_qkv, rel_h, rel_w, g_out, block=8, halo=1,
        levels=levels, g=g, slab=slab, r=r, interpret=True)
    want = _cascade_bwd_impl(
        x, xa, s, t, w_qkv, rel_h, rel_w, g_out, block=8, halo=1,
        levels=levels, r=r, interpret=True)

    names = (("dx", "dx_add", "ds", "dt", "dw_qkv", "drel_h", "drel_w")
             if with_add else
             ("dx", "ds", "dt", "dw_qkv", "drel_h", "drel_w"))
    for name, a, bnd in zip(names, got, want):
        bb = np.asarray(bnd, np.float32)
        tol = max(2e-3, 8e-3 * float(np.abs(bb).max()))
        np.testing.assert_allclose(np.asarray(a, np.float32), bb,
                                   atol=tol, err_msg=name)


def test_packed_front_tiled_matches_full_width():
    """Column-slab packed-front (slab + halo*2^L real overlap columns +
    col_off interior mask) must match the full-width core exactly,
    including a ragged last slab."""
    rng = np.random.default_rng(31)
    levels, cb, g = 2, 16, 8
    b, h, w = 8, 32, 96
    x, _, s, t, w_qkv, rel_h, rel_w = _mk(rng, b, h, w, cb, levels, False)
    xp = pk.pack_batch(x, g, True)
    sp = s.astype(jnp.float32).reshape(b // g, g * cb)
    tp = t.astype(jnp.float32).reshape(b // g, g * cb)
    kw = dict(cb=cb, block=8, halo=1, levels=levels, g=g, r=0.0,
              interpret=True, sub=2)

    full = np.asarray(pk.packed_front_core(
        xp, None, sp, tp, w_qkv, rel_h, rel_w, **kw), np.float32)
    for slab in (32, 64):  # 64 -> ragged last slab of 32
        tiled = np.asarray(pk.packed_front_tiled(
            xp, None, sp, tp, w_qkv, rel_h, rel_w, slab=slab, **kw),
            np.float32)
        np.testing.assert_allclose(tiled, full, atol=2e-2, rtol=2e-2)
        assert float(np.abs(tiled - full).mean()) < 2e-3


@pytest.mark.parametrize("with_add", [False, True])
@pytest.mark.parametrize("slab,hw", [(32, 96), (64, 96)])
def test_packed_front_bwd_matches_banded(with_add, slab, hw):
    """Packed-front backward (packed full-res adjoints + native-C
    per-subgroup attention adjoint on the slab grid) vs the banded
    backward: all grads to bf16 boundary noise, incl. ragged slabs."""
    from m2trans_tpu.ops.pallas.halo_attn import _cascade_bwd_impl

    rng = np.random.default_rng(41 + slab)
    levels, cb, g = 2, 16, 8
    b = 8
    x, xa, s, t, w_qkv, rel_h, rel_w = _mk(rng, b, 32, hw, cb, levels,
                                           with_add)
    r = 0.5 if with_add else 0.0
    g_out = jnp.asarray(rng.standard_normal((b, 32, hw, cb)),
                        jnp.bfloat16)

    got = pk.packed_front_bwd_impl(
        x, xa, s, t, w_qkv, rel_h, rel_w, g_out, block=8, halo=1,
        levels=levels, g=g, sub=2, slab=slab, r=r, interpret=True)
    want = _cascade_bwd_impl(
        x, xa, s, t, w_qkv, rel_h, rel_w, g_out, block=8, halo=1,
        levels=levels, r=r, interpret=True)

    names = (("dx", "dx_add", "ds", "dt", "dw_qkv", "drel_h", "drel_w")
             if with_add else
             ("dx", "ds", "dt", "dw_qkv", "drel_h", "drel_w"))
    for name, a, bnd in zip(names, got, want):
        bb = np.asarray(bnd, np.float32)
        tol = max(2e-3, 8e-3 * float(np.abs(bb).max()))
        np.testing.assert_allclose(np.asarray(a, np.float32), bb,
                                   atol=tol, err_msg=name)
