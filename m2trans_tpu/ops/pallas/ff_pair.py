"""Fused pair-major packed feed-forward conv (r5).

The CFTM feed-forward (reference models/M2Trans_network.py:158-163: 3x3
zero-pad conv + module residual) applied to a branch-major PACKED body
tensor in ONE Pallas kernel, with every relayout riding the MXU:

  1. one (gc, gc) PERMUTATION dot takes the bf16 band from branch-major
     lanes (k, s, cb) to pair-major lanes (s//2, s%2, k, cb) — each
     128-lane block then holds one image PAIR's full channel set;
  2. the 3x3 conv becomes four independent block-diagonal K=128
     contractions (w2 = kron(I2, W) per tap) — full MXU depth, no
     per-image gather (ops/pallas/ff_packed.py's f32 image staging ran
     masked sub-128 VPU copies and measured SLOWER than the XLA
     round-trip, +0.23 ms/step r5 compare_fori);
  3. one inverse-permutation dot back to branch-major, then the packed
     residual add.

Why a kernel at all: the XLA formulations are HBM-round-trip-bound, not
MXU-bound — unpack/conv/pack (and equally the XLA pair form, measured a
wash) each materialize ~9.4 MB to HBM per CFTM hop (~60 MB/CFTM); the
fused kernel reads oc + xp once and writes once (~28 MB/CFTM).

Exactness: the permutation dots move exactly one product per output
lane (exact for bf16 inputs); the conv accumulates f32 and rounds to
bf16 BEFORE the bf16 bias add, matching conv2d's sequence in the unpack
path; only f32 tap-summation order differs from conv2d
(tests/test_ff_packed.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 8  # rows per grid band


@functools.lru_cache(maxsize=None)
def _pair_perm_np(g: int = 8, nb: int = 4, cb: int = 16):
    """(gc, gc) 0/1 permutation (and its inverse): branch-major lane
    l = k*(g*cb) + s*cb + c -> pair-major lane
    m = (s//2)*(2*nb*cb) + (s%2)*(nb*cb) + k*cb + c."""
    n = g * nb * cb
    c_im = nb * cb
    p = np.zeros((n, n), np.float32)
    for k in range(nb):
        for s in range(g):
            for c in range(cb):
                l = k * (g * cb) + s * cb + c
                m = (s // 2) * (2 * c_im) + (s % 2) * c_im + k * cb + c
                p[l, m] = 1.0
    return p, p.T


def _kernel(oc_a, oc_b, oc_c, xp_ref, p_ref, pinv_ref, w2_ref, b2_ref,
            out_ref, *, w: int, gc: int, c2: int, precision):
    rows = _BLOCK + 2
    nblk = gc // c2

    # rows [8i-1, 8i+9) of the zero-band-padded input (see wrapper)
    band = jnp.concatenate(
        [oc_a[0, _BLOCK - 1:], oc_b[0], oc_c[0, :1]], axis=0)

    # branch-major -> pair-major: one MXU permutation dot (exact)
    xpair = jnp.dot(band.reshape(rows * (w + 2), gc), p_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=precision).astype(band.dtype)
    xpair = xpair.reshape(rows, w + 2, gc)

    # block-diagonal conv: each 128-lane block = one image pair, K=128
    # full depth; 128-aligned lane slices are free
    parts = []
    for j in range(nblk):
        xb = xpair[:, :, j * c2:(j + 1) * c2]
        acc = None
        for dr in range(3):
            for dc in range(3):
                win = xb[dr:dr + _BLOCK, dc:dc + w].reshape(
                    _BLOCK * w, c2)
                d = jnp.dot(win, w2_ref[dr, dc],
                            preferred_element_type=jnp.float32,
                            precision=precision)
                acc = d if acc is None else acc + d
        # round to bf16 BEFORE the bf16 bias add (conv2d's sequence)
        parts.append(acc.astype(band.dtype) + b2_ref[:])
    y = jnp.concatenate(parts, axis=-1)            # (8*w, gc) pair-major

    # pair-major -> branch-major + packed residual
    yb = jnp.dot(y, pinv_ref[:], preferred_element_type=jnp.float32,
                 precision=precision).astype(band.dtype)
    out_ref[0] = yb.reshape(_BLOCK, w, gc) + xp_ref[0]


def ff_pair_vmem_bytes(w: int, gc: int) -> float:
    """Scoped-VMEM estimate at frame width w. Calibration (v5e, real
    scoped peak via scripts/calibrate_vmem.py): see the gate comment in
    models/m2trans.py."""
    wp2 = w + 2
    rows = _BLOCK + 2
    total = 3 * 2 * 2 * _BLOCK * wp2 * gc      # 3 input views, dbl-buf
    total += 2 * 2 * _BLOCK * w * gc           # xp block, dbl-buf
    total += 2 * 2 * _BLOCK * w * gc           # out block, dbl-buf
    total += 2 * rows * wp2 * gc               # band concat (bf16)
    total += 4 * rows * wp2 * gc               # perm dot f32 transient
    total += 2 * rows * wp2 * gc               # xpair bf16
    total += 4 * _BLOCK * w * gc               # conv acc f32 (4 blocks)
    total += 2 * 2 * _BLOCK * w * gc           # y + inv-dot transient
    total += 2 * 2 * gc * gc + 9 * 2 * (gc // 4) ** 2  # perms + w2
    return total


def ff_pair_conv_fused(oc: jnp.ndarray, xp: jnp.ndarray, w: jnp.ndarray,
                       b: jnp.ndarray, *, g: int = 8, nb: int = 4,
                       interpret=None, precision=None) -> jnp.ndarray:
    """pack_body(conv2d(unpack_body(oc), w, b, 'zeros')) + xp, fused via
    pair-major MXU permutation dots.

    oc, xp: (bp, H, W, nb*g*cb) packed bf16; w: (3, 3, C, C) HWIO with
    C = nb*cb; b: (C,). H a multiple of 8 (model pad-to-32)."""
    if interpret is None:
        from m2trans_tpu.ops.pallas.halo_attn import _is_tpu_backend

        interpret = not _is_tpu_backend()
    bp, h, ww, gc = oc.shape
    c = w.shape[-1]
    cb = c // nb
    assert gc == nb * g * cb, (gc, nb, g, cb)
    c2 = 2 * c
    nh = h // _BLOCK

    p_np, pinv_np = _pair_perm_np(g, nb, cb)
    p_m = jnp.asarray(p_np, oc.dtype)
    pinv_m = jnp.asarray(pinv_np, oc.dtype)
    w2 = jax.vmap(jax.vmap(
        lambda wt: jnp.kron(jnp.eye(2, dtype=wt.dtype), wt)))(
        w.astype(oc.dtype))                        # (3, 3, 2C, 2C)
    b2 = jnp.tile(b, 2).astype(oc.dtype)           # (2C,)

    # zero column halo in XLA; zero row halo via one pad band each side
    ocp = jnp.pad(oc, ((0, 0), (_BLOCK, _BLOCK), (1, 1), (0, 0)))

    kern = functools.partial(_kernel, w=ww, gc=gc, c2=c2,
                             precision=precision)
    band = lambda off: pl.BlockSpec(  # noqa: E731
        (1, _BLOCK, ww + 2, gc), lambda bb, i, o=off: (bb, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    plain = pl.BlockSpec((1, _BLOCK, ww, gc),
                         lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda bb, i: tuple(0 for _ in shp),
        memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(bp, nh),
        in_specs=[band(0), band(1), band(2), plain,
                  const((gc, gc)), const((gc, gc)),
                  const((3, 3, c2, c2)), const((c2,))],
        out_specs=plain,
        out_shape=jax.ShapeDtypeStruct((bp, h, ww, gc), oc.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * bp * h * ww * gc * (2 * gc + 9 * c2)),
            bytes_accessed=int(2 * 3 * bp * h * ww * gc),
            transcendentals=0),
        interpret=interpret,
    )(ocp, ocp, ocp, xp, p_m, pinv_m, w2, b2)
