"""Fused CFTM cascade branch (cftm_branch_fused): interpret-mode parity
with the XLA composition — instance-norm apply, cascade average, masked
zero padding, attention, residual — plus gradients, and the full
_cftm_apply_fused module against the plain bf16 cftm_apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2trans_tpu.config import Config
from m2trans_tpu.models import init_m2trans
from m2trans_tpu.models.m2trans import ComputePolicy, cftm_apply
from m2trans_tpu.ops.pallas.halo_attn import _cascade_xla, cftm_branch_fused


def _mk(levels, cb=4, bsz=2, hw=32, seed=0):
    rng = np.random.default_rng(seed)
    c = cb * 4 ** levels
    x = jnp.asarray(rng.normal(0, 1, (bsz, hw, hw, cb)).astype(np.float32))
    w_qkv = jnp.asarray(rng.normal(0, c ** -0.5,
                                   (c, 3 * c)).astype(np.float32))
    rel = jnp.asarray(rng.normal(0, 1, (10, c // 2)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.5, 1.5, (bsz, cb)).astype(np.float32))
    t = jnp.asarray(rng.normal(0, 0.2, (bsz, cb)).astype(np.float32))
    add = jnp.asarray(rng.normal(0, 1, (bsz, hw, hw, cb)).astype(np.float32))
    return x, w_qkv, rel, s, t, add


@pytest.mark.parametrize("levels,with_add", [(0, False), (0, True),
                                             (1, True), (2, True)])
def test_cascade_branch_matches_xla(levels, with_add):
    x, w_qkv, rel, s, t, add = _mk(levels)
    xb = x.astype(jnp.bfloat16)
    ab = add.astype(jnp.bfloat16) if with_add else None
    got = np.asarray(cftm_branch_fused(
        xb, w_qkv.astype(jnp.bfloat16), rel, rel, s, t, x_add=ab, r=0.5,
        levels=levels, interpret=True)).astype(np.float32)
    want = np.asarray(_cascade_xla(
        xb, ab, s, t, w_qkv.astype(jnp.bfloat16), rel, rel, block=8,
        halo=1, levels=levels, r=0.5)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
    assert float(np.abs(got - want).mean()) < 5e-3


@pytest.mark.parametrize("levels,with_add,hw", [(0, True, 16), (0, False, 24),
                                                (1, True, 32), (2, True, 32)])
def test_cascade_branch_gradients(levels, with_add, hw):
    """The Pallas backward kernel (recompute + reverse chain + overlap-add
    scatter) must match the XLA vjp of the composition, for every wavelet
    level, with and without the cascade input — including the rel-pos and
    qkv weight grads and the per-image affine grads."""
    x, w_qkv, rel, s, t, add = _mk(levels, bsz=2, hw=hw, seed=1)

    def mk_loss(force_xla):
        def loss(xx, aa, ss, tt, ww, rh, rw):
            import m2trans_tpu.ops.pallas.halo_attn as ha

            old = ha._PALLAS_BWD
            ha._PALLAS_BWD = not force_xla
            try:
                y = cftm_branch_fused(
                    xx.astype(jnp.bfloat16), ww.astype(jnp.bfloat16),
                    rh, rw, ss, tt,
                    x_add=(aa.astype(jnp.bfloat16) if with_add else None),
                    r=0.5, levels=levels, interpret=True)
            finally:
                ha._PALLAS_BWD = old
            return (y.astype(jnp.float32) ** 2).mean()
        return loss

    args = (x, add, s, t, w_qkv, rel, rel)
    gf = jax.grad(mk_loss(False), argnums=tuple(range(7)))(*args)
    gx = jax.grad(mk_loss(True), argnums=tuple(range(7)))(*args)
    names = ("dx", "dx_add", "ds", "dt", "dw_qkv", "drel_h", "drel_w")
    for name, a, b in zip(names, gf, gx):
        if not with_add and name == "dx_add":
            continue
        bb = np.asarray(b, np.float32)
        tol = max(2e-3, 2e-2 * float(np.abs(bb).max()))
        np.testing.assert_allclose(np.asarray(a, np.float32), bb,
                                   atol=tol, err_msg=name)


def test_cftm_fused_module_matches_plain(rng):
    """Full CFTM: the fused path must match the plain bf16 composition."""
    cfg = Config(scale=2, n_feats=16, n_blocks=1)
    blk = init_m2trans(jax.random.PRNGKey(0), cfg)["body"][0]
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 16)).astype(np.float32))

    plain = ComputePolicy(dtype=jnp.bfloat16, precision=None,
                          use_pallas=False)
    fused = ComputePolicy(dtype=jnp.bfloat16, precision=None,
                          use_pallas=True)
    want = np.asarray(cftm_apply(blk, x.astype(jnp.bfloat16),
                                 policy=plain)).astype(np.float32)
    got = np.asarray(cftm_apply(blk, x.astype(jnp.bfloat16),
                                policy=fused)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
    assert float(np.abs(got - want).mean()) < 5e-3


@pytest.mark.parametrize("levels,with_add", [(0, True), (1, False),
                                             (2, True)])
def test_cascade_tiled_matches_xla(levels, with_add):
    """Column-slab tiled cascade == XLA composition (wide-width path)."""
    from m2trans_tpu.ops.pallas.halo_attn import _cascade_tiled_impl

    x, w_qkv, rel, s, t, add = _mk(levels, hw=64)
    xb = x.astype(jnp.bfloat16)
    ab = add.astype(jnp.bfloat16) if with_add else None
    # force a multi-slab grid by shrinking the slab via a small limit
    import m2trans_tpu.ops.pallas.halo_attn as ha
    got = np.asarray(_cascade_tiled_impl(
        xb, ab, s, t, w_qkv.astype(jnp.bfloat16), rel, rel, block=8,
        halo=1, levels=levels, r=0.5, interpret=True)).astype(np.float32)
    want = np.asarray(_cascade_xla(
        xb, ab, s, t, w_qkv.astype(jnp.bfloat16), rel, rel, block=8,
        halo=1, levels=levels, r=0.5)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
    assert float(np.abs(got - want).mean()) < 5e-3


def test_cascade_tiled_multi_slab_exact():
    """Slab boundaries must be seamless: shrink the gate so W=64 splits
    into multiple slabs and compare against the single-program path."""
    import m2trans_tpu.ops.pallas.halo_attn as ha
    from m2trans_tpu.ops.pallas import device as dev_mod

    x, w_qkv, rel, s, t, add = _mk(1, hw=64)
    xb = x.astype(jnp.bfloat16)
    kw = dict(block=8, halo=1, levels=1, r=0.5, interpret=True)
    whole = np.asarray(ha._cascade_tiled_impl(
        xb, None, s, t, w_qkv.astype(jnp.bfloat16), rel, rel, **kw))
    prof = dev_mod.gate_profile()
    small = dict(prof, banded_limits={},
                 banded_limit_default=int(ha._banded_vmem_bytes(
                     32, 4, 16, 8, 1, 1)) + 1)
    dev_mod.gate_profile.cache_clear()
    try:
        import unittest.mock as mock
        with mock.patch.object(dev_mod, "gate_profile", lambda: small):
            # re-resolve inside halo_attn via the device module call
            split = np.asarray(ha._cascade_tiled_impl(
                xb, None, s, t, w_qkv.astype(jnp.bfloat16), rel, rel,
                **kw))
    finally:
        dev_mod.gate_profile.cache_clear()
    np.testing.assert_allclose(split.astype(np.float32),
                               whole.astype(np.float32), atol=2e-2,
                               rtol=2e-2)


def test_cftm_packed_body_matches_plain(rng):
    """Whole-CFTM packed flow (packed_body policy): must match the plain
    bf16 composition at a flagship-like shape (n_feats=64, bsz=8)."""
    from m2trans_tpu.models.m2trans import _packed_body_ok

    cfg = Config(scale=4, n_feats=64, n_blocks=1)
    blk = init_m2trans(jax.random.PRNGKey(1), cfg)["body"][0]
    x = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 64)).astype(np.float32))
    assert _packed_body_ok(8, 32, 32, 16, 8, 1)

    plain = ComputePolicy(dtype=jnp.bfloat16, precision=None,
                          use_pallas=False)
    packed = ComputePolicy(dtype=jnp.bfloat16, precision=None,
                           use_pallas=True, packed_body=True)
    want = np.asarray(cftm_apply(blk, x.astype(jnp.bfloat16),
                                 policy=plain)).astype(np.float32)
    got = np.asarray(cftm_apply(blk, x.astype(jnp.bfloat16),
                                policy=packed)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
    assert float(np.abs(got - want).mean()) < 5e-3


def test_ad_fwd_rule_avoids_packed_front(monkeypatch):
    """The packed-front L=2 kernel runs within ~1 MB of the 16 MB scoped-
    VMEM ceiling, and the effective limit varies with the surrounding
    program (observed OOM at 16.96M inside grad programs on v5e). The
    custom_vjp fwd rule must therefore dispatch conservatively: plain
    evaluation at a packed-front-eligible shape uses the kernel, the same
    call under jax.grad must not."""
    import m2trans_tpu.ops.pallas.halo_attn_packed as pk

    calls = []
    orig_full = pk.packed_front_cascade_impl
    orig_tiled = pk.packed_front_tiled_impl

    def spy_full(*a, **k):
        calls.append(1)
        return orig_full(*a, **k)

    def spy_tiled(*a, **k):
        calls.append(1)
        return orig_tiled(*a, **k)

    monkeypatch.setattr(pk, "packed_front_cascade_impl", spy_full)
    monkeypatch.setattr(pk, "packed_front_tiled_impl", spy_tiled)

    # flagship-eligible shape: B=8, W=96, cb=16, L=2 (the column-slab
    # gate under the v5e calibration used on CPU)
    assert (pk.pick_packed_front(8, 96, 16, 2) is not None
            or pk.pick_packed_front_tiled(8, 96, 16, 2) is not None)
    rng = np.random.default_rng(0)
    cb, levels = 16, 2
    c = cb * 4 ** levels
    x = jnp.asarray(rng.normal(0, 1, (8, 96, 96, cb))).astype(jnp.bfloat16)
    w_qkv = jnp.asarray(rng.normal(0, c ** -0.5, (c, 3 * c))
                        ).astype(jnp.bfloat16)
    rel = jnp.asarray(rng.normal(0, 1, (10, c // 2)).astype(np.float32))
    s = jnp.ones((8, cb), jnp.float32)
    t = jnp.zeros((8, cb), jnp.float32)

    def f(xx):
        out = cftm_branch_fused(xx, w_qkv, rel, rel, s, t, levels=levels,
                                interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    jax.grad(f)(x)
    assert not calls, "packed-front kernel dispatched inside the AD fwd"

    cftm_branch_fused(x, w_qkv, rel, rel, s, t, levels=levels,
                      interpret=True)
    assert calls, "packed-front kernel missing from plain evaluation"


def test_cftm_packed_body_tiled_l2_fallback(rng):
    """Packed-body flow at a width where packed-front is VMEM-ineligible
    (W=128: est 21.6M > the 19M v5e budget): branches 3/4 must route
    through the unpack -> banded/tiled fused dispatch -> repack fallback
    and still match the plain composition (the ×3 body width)."""
    from m2trans_tpu.models.m2trans import _packed_body_ok
    from m2trans_tpu.ops.pallas.halo_attn_packed import pick_packed_front

    assert pick_packed_front(8, 128, 16, 2) is None
    assert _packed_body_ok(8, 32, 128, 16, 8, 1)

    cfg = Config(scale=4, n_feats=64, n_blocks=1)
    blk = init_m2trans(jax.random.PRNGKey(1), cfg)["body"][0]
    x = jnp.asarray(rng.uniform(0, 1, (8, 32, 128, 64)).astype(np.float32))

    plain = ComputePolicy(dtype=jnp.bfloat16, precision=None,
                          use_pallas=False)
    packed = ComputePolicy(dtype=jnp.bfloat16, precision=None,
                           use_pallas=True, packed_body=True)
    want = np.asarray(cftm_apply(blk, x.astype(jnp.bfloat16),
                                 policy=plain)).astype(np.float32)
    got = np.asarray(cftm_apply(blk, x.astype(jnp.bfloat16),
                                policy=packed)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
    assert float(np.abs(got - want).mean()) < 5e-3


@pytest.mark.parametrize("with_add,slab,hw", [(False, 32, 96),
                                              (True, 32, 96),
                                              (True, 64, 96)])
def test_cascade_bwd_tiled_matches_xla_vjp(with_add, slab, hw):
    """Column-slab tiled backward (L=2): grads must match the XLA vjp,
    including the 2-D overlap-add of the extended dz tiles (slab=32 ->
    3 slabs; slab=64 -> ragged second slab covering 32 real columns)."""
    import m2trans_tpu.ops.pallas.halo_attn as ha

    levels = 2
    x, w_qkv, rel, s, t, add = _mk(levels, bsz=2, hw=hw, seed=2)
    xb = x.astype(jnp.bfloat16)
    ab = add.astype(jnp.bfloat16) if with_add else None
    wb = w_qkv.astype(jnp.bfloat16)
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(0, 1, x.shape)).astype(jnp.bfloat16)

    got = ha._cascade_bwd_tiled_impl(
        xb, ab, s, t, wb, rel, rel, g, block=8, halo=1, levels=levels,
        r=0.5, interpret=True, slab=slab)
    # oracle: the (gradient-parity-tested) banded backward — identical
    # math, so the tiled fold must match it to f32-reassociation noise;
    # the shared deviation vs the XLA vjp is bf16 numerics at this size
    want = ha._cascade_bwd_impl(
        xb, ab, s, t, wb, rel, rel, g, block=8, halo=1, levels=levels,
        r=0.5, interpret=True)

    names = (("dx", "dx_add", "ds", "dt", "dw_qkv", "drel_h", "drel_w")
             if with_add else
             ("dx", "ds", "dt", "dw_qkv", "drel_h", "drel_w"))
    for name, a, b in zip(names, got, want):
        # dz tiles leave the kernels in bf16, so boundary elements differ
        # by up to ~2 bf16 ulps between the banded and tiled folds
        bb = np.asarray(b, np.float32)
        tol = max(2e-3, 8e-3 * float(np.abs(bb).max()))
        np.testing.assert_allclose(np.asarray(a, np.float32), bb,
                                   atol=tol, err_msg=name)


def test_bwd_mode_gates():
    """Backward dispatch: the flagship L=2 full-width banded backward is
    scoped-VMEM-marginal and must route to the tiled backward; narrow
    L=0/L=1 stay banded; a Pallas-backward slab must exist at the x2/x3
    body widths (W=192/128, L=2)."""
    from m2trans_tpu.ops.pallas.halo_attn import (
        _banded_limit,
        _banded_vmem_bytes,
        _bwd_tiled_slab,
    )
    from m2trans_tpu.ops.pallas.device import gate_profile

    bwd_limit = gate_profile()["bwd_banded_limit_default"]
    # flagship L=2 (cb=16, W=96): banded fwd-est passes the fwd limit but
    # not the backward limit -> tiled; and a slab exists
    est = _banded_vmem_bytes(96, 16, 256, 8, 1, 2)
    assert est <= _banded_limit(2) and est > bwd_limit
    assert _bwd_tiled_slab(96, 16, 256, 8, 1, 2) is not None
    # L=0/L=1 flagship stay banded
    assert _banded_vmem_bytes(96, 16, 16, 8, 1, 0) <= bwd_limit
    assert _banded_vmem_bytes(96, 16, 64, 8, 1, 1) <= bwd_limit
    # x2/x3 L=2 widths get a Pallas backward via the tiled slab
    assert _bwd_tiled_slab(128, 16, 256, 8, 1, 2) is not None
    assert _bwd_tiled_slab(192, 16, 256, 8, 1, 2) is not None
