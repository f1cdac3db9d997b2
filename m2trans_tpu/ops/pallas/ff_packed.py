"""Fused packed feed-forward conv: the CFTM's 3x3 conv applied to a
branch-major PACKED body tensor without the per-CFTM unpack -> per-image
conv -> repack round trip (NOTES_ROUND4 'Historical' items 3/4: the
unpack kernel alone costs 2-4x the pack, and the trio measured
~0.27 ms/CFTM = ~2.2 ms/step at the flagship).

Mirrors the reference CFTM feed-forward (models/M2Trans_network.py:
158-163, conv 3x3 zero-pad + module residual) on the packed layout
(halo_attn_packed.pack_body): lanes are branch-major [k*g*cb + s*cb + c]
for branch k, slot (image) s, channel c. Per 8-row band the kernel:

  1. stages the bf16 (10, W+2, gc) input band to f32 scratch (sub-128-
     lane ref access is 32-bit-only on Mosaic — the same staging trick
     as pack/unpack, but in-kernel so the tensor never round-trips HBM
     in image-major layout);
  2. per image: gathers its nb cb-lane blocks into an image-major
     (10, W+2, C) window, computes the 3x3 conv as 9 shifted
     (rows*W, C) x (C, C) MXU dots accumulating in f32;
  3. scatters each image's (8, W, C) result back to packed lanes in an
     f32 staging buffer, adds the packed residual, writes bf16.

Zero column padding is pre-applied in XLA (W+2 input columns); zero row
padding comes from the one-band top/bottom pad. Output is exactly
``pack_body(conv2d(unpack_body(oc), w, b, padding='zeros')) + xp`` to
f32-accumulation noise (tests/test_ff_packed.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 8  # rows per grid band


def _kernel(oc_a, oc_b, oc_c, xp_ref, w_ref, b_ref, out_ref, st, img_st,
            pk, *, g: int, nb: int, cb: int, w: int, precision):
    # rows [8i-1, 8i+9) of the (un-padded) input, from three 8-row bands
    # of the one-band-top-padded array
    band = jnp.concatenate(
        [oc_a[0, _BLOCK - 1:], oc_b[0], oc_c[0, :1]], axis=0)
    st[:] = band.astype(jnp.float32)

    c = nb * cb
    gcb = g * cb
    rows = _BLOCK

    for img in range(g):
        # image-major gather: nb cb-lane blocks -> (10, W+2, C) f32
        img_st[:] = jnp.concatenate(
            [st[:, :, k * gcb + img * cb:k * gcb + (img + 1) * cb]
             for k in range(nb)], axis=-1)
        xin = img_st[:].astype(oc_a.dtype)
        acc = jnp.broadcast_to(b_ref[:],
                               (rows * w, c)).astype(jnp.float32)
        for dr in range(3):
            for dc in range(3):
                win = xin[dr:dr + rows, dc:dc + w].reshape(rows * w, c)
                acc = acc + jnp.dot(win, w_ref[dr, dc],
                                    preferred_element_type=jnp.float32,
                                    precision=precision)
        out_im = acc.reshape(rows, w, c)
        # scatter back to packed lanes (f32 staging; static offsets)
        for k in range(nb):
            pk[:, :, k * gcb + img * cb:k * gcb + (img + 1) * cb] = \
                out_im[:, :, k * cb:(k + 1) * cb]

    out_ref[0] = (pk[:]
                  + xp_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def packed_ff_vmem_bytes(w: int, gc: int, c: int) -> float:
    """Scoped-VMEM estimate at frame width w (per-program peak)."""
    wp2 = w + 2
    total = 3 * 2 * 2 * _BLOCK * wp2 * gc          # 3 input views, dbl-buf
    total += 2 * 2 * _BLOCK * w * gc               # xp block
    total += 2 * 2 * _BLOCK * w * gc               # out block
    total += 4 * (_BLOCK + 2) * wp2 * gc           # f32 band staging
    total += 4 * (_BLOCK + 2) * wp2 * c            # f32 image window
    total += 4 * _BLOCK * w * gc                   # f32 pack staging
    total += 4 * _BLOCK * w * c * 4                # conv acc + dot temps
    total += 2 * 9 * c * c + 4 * c                 # weights + bias
    return total


def packed_ff_fits(w: int, gc: int, c: int, limit: float = 13e6) -> bool:
    return packed_ff_vmem_bytes(w, gc, c) <= limit


def packed_ff_conv(oc: jnp.ndarray, xp: jnp.ndarray, w: jnp.ndarray,
                   b: jnp.ndarray, *, g: int = 8, nb: int = 4,
                   interpret=None, precision=None) -> jnp.ndarray:
    """pack_body(conv2d(unpack_body(oc), w, b, 'zeros')) + xp, fused.

    oc, xp: (bp, H, W, nb*g*cb) packed bf16; w: (3, 3, C, C) with
    C = nb*cb; b: (C,). H a multiple of 8 (model pad-to-32)."""
    if interpret is None:
        from m2trans_tpu.ops.pallas.halo_attn import _is_tpu_backend

        interpret = not _is_tpu_backend()
    bp, h, ww, gc = oc.shape
    c = w.shape[-1]
    cb = c // nb
    assert gc == nb * g * cb, (gc, nb, g, cb)
    nh = h // _BLOCK

    # zero column halo in XLA; zero row halo via one pad band each side
    ocp = jnp.pad(oc, ((0, 0), (_BLOCK, _BLOCK), (1, 1), (0, 0)))

    kern = functools.partial(_kernel, g=g, nb=nb, cb=cb, w=ww,
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

    out = pl.pallas_call(
        kern,
        grid=(bp, nh),
        in_specs=[band(0), band(1), band(2), plain,
                  const((3, 3, c, c)), const((c,))],
        out_specs=plain,
        out_shape=jax.ShapeDtypeStruct((bp, h, ww, gc), oc.dtype),
        scratch_shapes=[
            pltpu.VMEM((_BLOCK + 2, ww + 2, gc), jnp.float32),  # st
            pltpu.VMEM((_BLOCK + 2, ww + 2, c), jnp.float32),   # img_st
            pltpu.VMEM((_BLOCK, ww, gc), jnp.float32),          # pk
        ],
        interpret=interpret,
    )(ocp, ocp, ocp, xp, w.astype(oc.dtype), b.astype(jnp.float32))
    return out
