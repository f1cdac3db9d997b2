"""Lane-packed fused CFTM cascade branch — Pallas TPU kernel (round 3).

The round-2 banded kernels (halo_attn.py) are op-issue-bound, not
FLOP/HBM-bound: branch1 (C=16) runs every VPU op at 16/128 lane occupancy
and issues ~100 tiny K=16 MXU matmuls per band, and per-call time is
schedule-invariant at ~0.48 ms (NOTES_ROUND3.md item 1). This kernel
removes the wall structurally by PACKING G batch images onto the lane
axis:

  * the input is pre-transposed in XLA to (B/G, H, W, G*cb) — every VPU
    op (affine, masks, DWT adds, patch builds, softmax) then processes G
    images per instruction at G*cb/128 lane occupancy, and the VMEM
    blocks stop paying the 128/cb lane-padding tax (the very tax that
    forced the W-gates on the x2/x3 shapes);
  * the qkv projection becomes ONE matmul against a block-diagonal
    packed weight W_p (G*C, 3*G*C) — per-image weights on the diagonal,
    exact zeros elsewhere, so results match the per-image projections;
  * the per-window attention contracts per image WITHOUT unpacking via a
    block-diagonal stacked-query trick: the packed per-window query
    q_p (bb, G*C) is replicated G times along rows and masked to
    Q_bd[i*bb+m, p] = q_p[m, p] * (slot(p) == i); then ONE batched dot
      Q_bd (nw, G*bb, G*C) @ K_p^T (nw, G*C, win^2)
    yields every image's logits stacked on the M axis (cross-image lanes
    contract against exact zeros). Softmax runs on the stacked rows, and
    the attn @ V_p dot computes all images at once; the per-image output
    is the slot-diagonal of the (G*bb, G*C) result, extracted with one
    masked reduction. nw batched (M=G*bb, K=G*C) matmuls replace G*nw
    tiny (M=bb, K=C) ones.

Packed channel layout ("p-layout"): full-res packed channel
p = slot*cb + c; after DWT^L the coarse packed channel is
p = s*(G*cb) + slot*cb + c for subband s (DWT concatenates subband
blocks, each G*cb wide). A per-image coarse channel is d = s*cb + c, so
slot(p) = (p % (G*cb)) // cb — pure iota arithmetic in-kernel; the
packed weight / rel-bias permutations are static numpy index maps
applied in XLA (pack_branch_weights).

Semantics match halo_attn.cftm_branch_fused (reference CFTM.forward
models/M2Trans_network.py:132-164 per branch, TBlock :290-340) to f32-
accumulation association noise; parity is tested in interpret mode
against the XLA composition (tests/test_pallas_packed.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m2trans_tpu.ops.pallas.halo_attn import (
    _affine_band,
    _is_tpu_backend,
    _window_patches,
)


def _slot_of_packed(cb: int, g: int, n: int) -> np.ndarray:
    """slot index of each packed channel p in a width-n packed block
    (n a multiple of g*cb, p-layout)."""
    p = np.arange(n)
    return (p % (g * cb)) // cb


def _d_of_packed(cb: int, g: int, n: int) -> np.ndarray:
    """per-image channel d = s*cb + c of each packed channel p."""
    p = np.arange(n)
    return (p // (g * cb)) * cb + (p % cb)


def pack_branch_weights(w_qkv, rel_h, rel_w, *, cb: int, g: int,
                        levels: int):
    """Packed projection weight and rel biases for a G-image lane pack.

    Returns (w_p, relh_p, relw_p):
      w_p    (G*C, 3*G*C): block-diagonal per-slot qkv in p-layout on both
             axes (the q/k/v thirds each packed independently);
      relh_p (win_rows_dim..) -> (rel_h.shape[0], 2*G*C) bias added to the
             fused [k|v] tensor before window patching (k first half);
      relw_p same shape, added after patching (k second half).
    """
    c = cb * 4 ** levels
    gc = g * c
    ns = 4 ** levels

    # w_p[p_in, j*GC + p_out] = w_qkv[d(p_in), j*C + d(p_out)]
    #                           * (slot(p_in) == slot(p_out)).
    # Built as one broadcast-multiply against eye(G) over the (s, slot, c)
    # factorization of the p-layout — a static GATHER formulation lowers
    # to ~0.17 ms/call of TPU gather ops (profiled), this fuses to one
    # elementwise pass.
    eye = jnp.eye(g, dtype=w_qkv.dtype)
    parts = []
    for j in range(3):
        wj = w_qkv[:, j * c:(j + 1) * c].reshape(ns, cb, ns, cb)
        # (s_in, slot_in, c_in, s_out, slot_out, c_out)
        wp6 = jnp.einsum("abcd,ij->aibcjd", wj, eye)
        parts.append(wp6.reshape(gc, gc))
    w_p = jnp.concatenate(parts, axis=1)

    win = rel_h.shape[0]
    c2 = c // 2
    zeros = jnp.zeros((win, gc), rel_h.dtype)

    def tile_k(rel, half):
        # bias over the k block in p-layout: d < c2 (half 0) / d >= c2
        # (half 1) gets rel[:, d mod c2]; the complementary half is 0.
        # rel (win, c2) with c2 = (ns * cb) / 2: factor as (ns/2, cb) [or
        # (1, cb/2) halves for L=0] and broadcast over slots.
        if ns == 1:
            relk = jnp.concatenate([rel, jnp.zeros_like(rel)]
                                   if half == 0 else
                                   [jnp.zeros_like(rel), rel], axis=1)
            r3 = relk.reshape(win, 1, 1, c)
            out = jnp.broadcast_to(r3, (win, 1, g, c))
            return out.reshape(win, gc)
        r3 = rel.reshape(win, ns // 2, 1, cb)
        out = jnp.broadcast_to(r3, (win, ns // 2, g, cb))
        out = out.reshape(win, gc // 2)
        z2 = jnp.zeros((win, gc // 2), rel.dtype)
        return jnp.concatenate([out, z2] if half == 0 else [z2, out],
                               axis=1)

    relh_p = jnp.concatenate([tile_k(rel_h, 0), zeros], axis=1)
    relw_p = jnp.concatenate([tile_k(rel_w, 1), zeros], axis=1)
    return w_p, relh_p, relw_p


def _attend_packed(q_full, kv_full, relw_p, *, block, halo, wc, g, cb,
                   levels, precision):
    """Packed per-band attention: one stacked-query qk dot, one wide
    softmax, one av dot, one masked diagonal extraction.

    q_full  (block, wc, GC) scaled queries (f32);
    kv_full (win, wp, 2*GC) fused k|v with relh added (f32);
    relw_p  (win, 2*GC) window-column bias (k second half).
    Returns (block, wc, GC) f32."""
    win = block + 2 * halo
    c = cb * 4 ** levels
    gc = g * c
    nw = wc // block
    bb = block * block

    kvb = _window_patches(kv_full[None], block=block, halo=halo, wc=wc)[0]
    kvb = kvb + relw_p[None, None, :, :]          # (nw, win, win, 2GC)
    kvb = kvb.reshape(nw, win * win, 2 * gc)
    kb = kvb[..., :gc]
    vb = kvb[..., gc:]

    qb = q_full.reshape(block, nw, block, gc).transpose(1, 0, 2, 3)
    qb = qb.reshape(nw, bb, gc)
    # stacked block-diagonal queries: row block i keeps only slot i lanes
    # (slot(p) = (p % (g*cb)) // cb — the p-layout repeats every g*cb
    # lanes in blocks of cb)
    qs = jnp.concatenate([qb] * g, axis=1)        # (nw, G*bb, GC)
    row_slot = jax.lax.broadcasted_iota(jnp.int32, (g * bb, gc), 0) // bb
    lane = jax.lax.broadcasted_iota(jnp.int32, (g * bb, gc), 1)
    lane_slot = (lane % (g * cb)) // cb
    bd = (row_slot == lane_slot)
    qs = jnp.where(bd[None], qs, 0.0)

    sim = jax.lax.dot_general(
        qs, kb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    e = jnp.exp(sim)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)   # (nw, G*bb, win^2)

    r = jax.lax.dot_general(
        attn, vb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    # slot-diagonal extraction: (nw, G, bb, GC) masked-sum over G
    r = r.reshape(nw, g, bb, gc)
    gi = jax.lax.broadcasted_iota(jnp.int32, (g, gc), 0)
    gl = (jax.lax.broadcasted_iota(jnp.int32, (g, gc), 1) % (g * cb)) // cb
    dmask = (gi == gl).astype(jnp.float32)
    out_w = jnp.sum(r * dmask[None, :, None, :], axis=1)  # (nw, bb, GC)

    out = out_w.reshape(nw, block, block, gc).transpose(1, 0, 2, 3)
    return out.reshape(block, wc, gc)


def _packed_band_body(z, scratch, wp_ref, relh_ref, relw_ref, *,
                      block: int, halo: int, wc: int, levels: int, g: int,
                      precision):
    """DWT^L -> packed qkv -> packed attention -> IWT^L on one packed
    band. z: (rows, wp_full, G*cb) f32 affine-transformed band values.
    Returns (block*2^L, w_full, G*cb) f32."""
    win = block + 2 * halo
    wp = wc + 2 * halo
    gcb = z.shape[-1]
    cb = gcb // g
    dwt_bufs = scratch[:levels + 1] if levels else []
    iwt_bufs = scratch[levels + 1:] if levels else []

    if levels:
        dwt_bufs[0][:] = z
        for l in range(levels):
            src, dst = dwt_bufs[l], dwt_bufs[l + 1]
            a = src[0::2, 0::2, :]
            b = src[1::2, 0::2, :]
            cc = src[0::2, 1::2, :]
            dd = src[1::2, 1::2, :]
            dst[:] = jnp.concatenate(
                [(a + b + cc + dd), (-a - b + cc + dd), (-a + b - cc + dd),
                 (a - b - cc + dd)], axis=-1) * 0.5
        z = dwt_bufs[levels][:]

    c = cb * 4 ** levels
    gc = g * c
    zf = z.reshape(win * wp, gc).astype(jnp.bfloat16)
    qkv = jnp.dot(zf, wp_ref[:], preferred_element_type=jnp.float32,
                  precision=precision).reshape(win, wp, 3 * gc)
    q_full = qkv[halo:halo + block, halo:halo + wc, :gc] * (c ** -0.5)
    kv_full = qkv[..., gc:] + relh_ref[:][:, None, :]

    out = _attend_packed(q_full, kv_full, relw_ref[:], block=block,
                         halo=halo, wc=wc, g=g, cb=cb, levels=levels,
                         precision=precision)

    for l in range(levels):
        dst = iwt_bufs[l]
        ll, hl, lh, hh = jnp.split(out, 4, axis=-1)
        dst[0::2, 0::2, :] = (ll - hl - lh + hh) * 0.5
        dst[0::2, 1::2, :] = (ll + hl - lh - hh) * 0.5
        dst[1::2, 0::2, :] = (ll - hl + lh - hh) * 0.5
        dst[1::2, 1::2, :] = (ll + hl + lh + hh) * 0.5
        out = dst[:]
    return out


def _packed_cascade_kernel(*refs, block: int, halo: int, wc: int,
                           levels: int, g: int, precision, h: int, w: int,
                           r: float, has_add: bool, col_off: int = 0):
    """Packed banded cascade: affine (IN-apply) + masked zero-pad +
    optional cascade add in, attention, residual out — one packed image
    group per (batch-group, row-band) grid step."""
    if has_add:
        (xa, xb, aa, ab, s_ref, t_ref, wp_ref, relh_ref, relw_ref,
         out_ref, *scratch) = refs
    else:
        (xa, xb, s_ref, t_ref, wp_ref, relh_ref, relw_ref,
         out_ref, *scratch) = refs
        aa = ab = None
    sf = 2 ** levels
    b = pl.program_id(0)
    i = pl.program_id(1)
    x = jnp.concatenate([xa[:], xb[:, : 2 * halo * sf]], axis=1)
    x_add = None
    if has_add:
        x_add = jnp.concatenate([aa[:], ab[:, : 2 * halo * sf]], axis=1)
    sv = s_ref[pl.ds(b, 1), :]
    tv = t_ref[pl.ds(b, 1), :]
    # the band views carry a leading block dim of 1 == the affine's group
    z = _affine_band(x, x_add, sv, tv, i=i, h=h, w=w, block=block,
                     halo=halo, levels=levels, r=r,
                     col_off=col_off)[0].astype(jnp.float32)
    out = _packed_band_body(z, scratch, wp_ref, relh_ref, relw_ref,
                            block=block, halo=halo, wc=wc, levels=levels,
                            g=g, precision=precision)
    blk_full = block * sf
    hs = halo * sf
    # slice by the COMPUTE width (wc*sf == slab width in column-slab
    # mode); ``w`` is the global frame width for the interior mask only
    res = z[hs: hs + blk_full, hs: hs + wc * sf, :]
    out_ref[0] = (out + res).astype(out_ref.dtype)


def _packed_scratch_shapes(wp_full, wc, gcb, gc, block, halo, levels):
    shapes = []
    if levels:
        rows0 = (block + 2 * halo) * 2 ** levels
        for l in range(levels + 1):
            shapes.append(pltpu.VMEM(
                (rows0 >> l, wp_full >> l, gcb * 4 ** l), jnp.float32))
        for l in range(levels):
            shapes.append(pltpu.VMEM(
                (block << (l + 1), wc << (l + 1), gc // 4 ** (l + 1)),
                jnp.float32))
    return shapes


def _lanes(n):
    return max(n, 128)


def packed_vmem_bytes(w, cb, g, block, halo, levels):
    """Per-program VMEM estimate for the packed kernel. The big entries:
    stacked queries / logits / av result at (nw, G*bb, ...) f32, the
    patch tensor, the packed qkv band, and the (no longer lane-padded)
    input/output blocks."""
    sf = 2 ** levels
    win = block + 2 * halo
    wp_full = w + 2 * halo * sf
    blk_full = block * sf
    wc = w // sf
    nw = wc // block
    bb = block * block
    c = cb * 4 ** levels
    gc = g * c
    gcb = g * cb
    total = 2 * 2 * 2 * blk_full * wp_full * _lanes(gcb)   # in views x bufs
    total += 2 * 2 * blk_full * w * _lanes(gcb)            # out blocks
    rows0 = win * sf
    for l in range(levels + 1):                            # DWT scratch
        total += 4 * (rows0 >> l) * (wp_full >> l) * _lanes(gcb * 4 ** l)
    for l in range(levels):                                # IWT scratch
        total += 4 * (block << (l + 1)) * (wc << (l + 1)) * _lanes(
            gc // 4 ** (l + 1))
    total += 4 * rows0 * wp_full * _lanes(gcb)             # z band f32
    total += 4 * win * (wc + 2 * halo) * _lanes(3 * gc)    # qkv band f32
    total += 4 * nw * win * win * _lanes(2 * gc)           # patches
    total += 2 * 4 * nw * g * bb * _lanes(gc)              # qs + av result
    total += 2 * 4 * nw * g * bb * _lanes(win * win)       # sim + attn
    total += 4 * g * bb * _lanes(gc)                       # bd mask
    return total


_PACK_ROWS = 8  # max rows per pack-kernel grid step


def _pack_rows(h: int, w: int, gcb: int) -> int:
    """Rows per pack/unpack grid step: the kernel's footprint is
    ~16*rows*w*gcb bytes (double-buffered bf16 in/out blocks + f32
    staging); observed 16.43M scoped OOM at rows=8, W=192, gcb=512 —
    halve rows until comfortably under the ceiling."""
    import math

    rows = _PACK_ROWS
    while rows > 1 and 16 * rows * w * gcb > 12e6:
        rows //= 2
    return math.gcd(h, rows)


def _pack_kernel(x_ref, out_ref, *, g):
    # lane-concat G images' row bands; f32 staging (bf16 sub-register
    # lane concats are not supported by Mosaic)
    parts = [x_ref[s].astype(jnp.float32) for s in range(g)]
    out_ref[0] = jnp.concatenate(parts, axis=-1).astype(out_ref.dtype)


def _unpack_kernel(x_ref, out_ref, *, g):
    cb = out_ref.shape[-1]
    band = x_ref[0].astype(jnp.float32)
    for s in range(g):
        out_ref[s] = band[..., s * cb:(s + 1) * cb].astype(out_ref.dtype)


def _pack_body_kernel(x_ref, out_ref, *, g, nb):
    cb = x_ref.shape[-1] // nb
    imgs = [x_ref[s].astype(jnp.float32) for s in range(g)]
    parts = [imgs[s][..., k * cb:(k + 1) * cb]
             for k in range(nb) for s in range(g)]
    out_ref[0] = jnp.concatenate(parts, axis=-1).astype(out_ref.dtype)


def _unpack_body_kernel(x_ref, out_ref, *, g, nb):
    cb = out_ref.shape[-1] // nb
    band = x_ref[0].astype(jnp.float32)
    for s in range(g):
        parts = [band[..., (k * g + s) * cb:(k * g + s + 1) * cb]
                 for k in range(nb)]
        out_ref[s] = jnp.concatenate(parts, axis=-1).astype(out_ref.dtype)


def pack_batch_dma(x, g, interpret=None):
    """(B, H, W, cb) -> (B/G, H, W, G*cb) slot-major lane pack as a
    Pallas DMA kernel (grid over row bands; f32-staged lane concat).

    Superseded as the default by the MXU selection-einsum formulation
    (pack_batch): the staged lane concats run masked 16-lane VPU copies
    at 1/8 occupancy — swapping every pack/unpack in the model for the
    einsum measured -0.54 ms/step at the flagship (scripts/ab_pack2.py,
    device-loop paired delta). Kept for A/B and as the fallback."""
    b, h, w, cb = x.shape
    if g == 1:
        return x
    if interpret is None:
        interpret = not _is_tpu_backend()
    rows = _pack_rows(h, w, g * x.shape[-1])
    return pl.pallas_call(
        functools.partial(_pack_kernel, g=g),
        grid=(b // g, h // rows),
        in_specs=[pl.BlockSpec((g, rows, w, cb),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, w, g * cb),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b // g, h, w, g * cb), x.dtype),
        interpret=interpret,
    )(x)


def pack_body_dma(x, g, nb=4, interpret=None):
    """Pallas DMA formulation of pack_body (see pack_batch_dma)."""
    b, h, w, c = x.shape
    if interpret is None:
        interpret = not _is_tpu_backend()
    rows = _pack_rows(h, w, g * x.shape[-1])
    return pl.pallas_call(
        functools.partial(_pack_body_kernel, g=g, nb=nb),
        grid=(b // g, h // rows),
        in_specs=[pl.BlockSpec((g, rows, w, c),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, w, g * c),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b // g, h, w, g * c), x.dtype),
        interpret=interpret,
    )(x)


def unpack_body_dma(x, g, nb=4, interpret=None):
    """Pallas DMA formulation of unpack_body (see pack_batch_dma)."""
    bp, h, w, gc = x.shape
    if interpret is None:
        interpret = not _is_tpu_backend()
    c = gc // g
    rows = _pack_rows(h, w, gc)
    return pl.pallas_call(
        functools.partial(_unpack_body_kernel, g=g, nb=nb),
        grid=(bp, h // rows),
        in_specs=[pl.BlockSpec((1, rows, w, gc),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, rows, w, c),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp * g, h, w, c), x.dtype),
        interpret=interpret,
    )(x)


def unpack_batch_dma(x, g, interpret=None):
    """Pallas DMA formulation of unpack_batch (see pack_batch_dma)."""
    bp, h, w, gcb = x.shape
    if g == 1:
        return x
    if interpret is None:
        interpret = not _is_tpu_backend()
    cb = gcb // g
    rows = _pack_rows(h, w, gcb)
    return pl.pallas_call(
        functools.partial(_unpack_kernel, g=g),
        grid=(bp, h // rows),
        in_specs=[pl.BlockSpec((1, rows, w, gcb),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, rows, w, cb),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp * g, h, w, cb), x.dtype),
        interpret=interpret,
    )(x)


@functools.lru_cache(maxsize=None)
def _sel_np(g: int, c: int, nb: int):
    """(G, G*C, C) 0/1 selection tensor: S[s, k*G*cb + s*cb + cc,
    k*cb + cc] = 1 (branch-major packed lane <-> image channel)."""
    import numpy as np

    cb = c // nb
    k = np.arange(nb)[:, None]
    cc = np.arange(cb)[None, :]
    col = (k * cb + cc).reshape(-1)                   # (c,)
    s = np.zeros((g, g * c, c), np.float32)
    for slot in range(g):
        lane = (k * g * cb + slot * cb + cc).reshape(-1)
        s[slot, lane, col] = 1.0
    return s


def _sel(g: int, c: int, nb: int, dtype):
    return jnp.asarray(_sel_np(g, c, nb), dtype)


def pack_body(x, g, nb=4, interpret=None, precision=None):
    """(B, H, W, C) -> (B/G, H, W, G*C) BRANCH-MAJOR lane pack: output
    lane p = k*(G*cb) + slot*cb + c for branch-group k (cb = C/nb). Each
    branch's G-image slot-major pack occupies one contiguous G*cb-lane
    block, so the whole-CFTM packed flow reads branch k at lane offset
    k*G*cb with no relayout (the per-branch 16-lane slicing of the
    64-lane body tensor is what forced XLA's {3,0,2,1} staging copies).

    Implementation: a 0/1 selection-matrix einsum riding the MXU — each
    output lane accumulates exactly one product (1.0 * x) in f32, so the
    relayout is EXACT for bf16 inputs while running at full lane
    occupancy (the Pallas DMA kernels' masked 16-lane copies ran the VPU
    at 1/8 occupancy, ~4x the HBM floor; swapping measured -0.54 ms/step
    at the flagship, scripts/ab_pack2.py). Non-bf16 inputs take the XLA
    transpose formulation instead (a default-precision f32 contraction
    would round mantissas to bf16 on TPU).

    ``interpret`` is accepted for call-site compatibility with the DMA
    kernels and ignored (the einsum runs on every backend)."""
    b, h, w, c = x.shape
    if x.dtype != jnp.bfloat16:
        cb = c // nb
        x6 = x.reshape(b // g, g, h, w, nb, cb)
        return jnp.transpose(x6, (0, 2, 3, 4, 1, 5)).reshape(
            b // g, h, w, g * c)
    y = jnp.einsum("bshwc,slc->bhwl", x.reshape(b // g, g, h, w, c),
                   _sel(g, c, nb, x.dtype),
                   preferred_element_type=jnp.float32,
                   precision=precision)
    return y.astype(x.dtype)


def unpack_body(x, g, nb=4, interpret=None, precision=None):
    """Inverse of pack_body (same MXU selection-einsum strategy)."""
    bp, h, w, gc = x.shape
    c = gc // g
    if x.dtype != jnp.bfloat16:
        cb = c // nb
        x6 = x.reshape(bp, h, w, nb, g, cb)
        return jnp.transpose(x6, (0, 4, 1, 2, 3, 5)).reshape(
            bp * g, h, w, c)
    y = jnp.einsum("bhwl,slc->bshwc", x, _sel(g, c, nb, x.dtype),
                   preferred_element_type=jnp.float32,
                   precision=precision)
    return y.astype(x.dtype).reshape(bp * g, h, w, c)


def pack_batch(x, g, interpret=None, precision=None):
    """(B, H, W, cb) -> (B/G, H, W, G*cb) slot-major lane pack (the
    nb=1 case of pack_body: lane p = slot*cb + c). MXU selection-einsum;
    see pack_body."""
    if g == 1:
        return x
    return pack_body(x, g, nb=1, interpret=interpret, precision=precision)


def unpack_batch(x, g, interpret=None, precision=None):
    """Inverse of pack_batch."""
    if g == 1:
        return x
    return unpack_body(x, g, nb=1, interpret=interpret,
                       precision=precision)


# ---------------------------------------------------------------------------
# Packed-FRONT cascade (round-3, for L=2): full packing of the attention
# contraction is counterproductive at C=256 (G*C >= 512 lanes thrash
# VMEM; measured), but the L=2 kernel's cost is dominated by its
# FULL-RESOLUTION stages — the affine and first DWT level run every VPU
# op at 16/128 lane occupancy. This variant packs G images through the
# affine + DWT pyramid (full lanes), unstacks per-image coarse tensors
# in VMEM (cb-wide lane chunks; the p-layout scatters a per-image coarse
# channel across subband blocks), runs the round-2 batched attention per
# subgroup at the native C, re-packs, and runs the IWT packed.
# ---------------------------------------------------------------------------


def _rev4(s: int, digits: int) -> int:
    """Digit-reverse s in base 4 over `digits` digits.

    The recursive pyramid in _packed_front_kernel stores subbands
    first-transform-major (buffer index s1*4^{L-1}+...+sL), while the
    XLA cascade's channel layout after L stacked DWTs is
    last-transform-major (flat index sL*4^{L-1}+...+s1) — the two are
    base-4 digit reversals of each other.
    """
    r_ = 0
    for _ in range(digits):
        r_ = r_ * 4 + (s % 4)
        s //= 4
    return r_


def _packed_front_kernel(*refs, block: int, halo: int, wc: int,
                         levels: int, g: int, sub: int, precision,
                         h: int, w: int, r: float, has_add: bool,
                         col_off: int = 0):
    from m2trans_tpu.ops.pallas.halo_attn import _attend_batched

    if has_add:
        (xa, xb, aa, ab, s_ref, t_ref, wqkv_ref, relh_ref, relw_ref,
         out_ref, *scratch) = refs
    else:
        (xa, xb, s_ref, t_ref, wqkv_ref, relh_ref, relw_ref,
         out_ref, *scratch) = refs
        aa = ab = None
    sf = 2 ** levels
    hs = halo * sf
    ns = 4 ** levels
    b = pl.program_id(0)
    i = pl.program_id(1)
    win = block + 2 * halo
    wp = wc + 2 * halo
    gcb = xa.shape[-1]
    cb = gcb // g
    c = cb * ns

    # Scratch layout: every buffer stays exactly 128 lanes wide — Mosaic
    # has no strided/sliced access for wider base memrefs ("last dim size
    # is not 128 in original base memref"; the banded kernels never
    # exceed 256). The pyramid levels are LISTS of per-subband scratches
    # in s-major order: level l has 4^l buffers of (rows>>l, wp>>l, 128).
    # VMEM economies: the FINAL pyramid level and the attention outputs
    # are bf16 (both only read/written contiguously — the 32-bit-only
    # strided Mosaic restriction applies to the earlier levels and the
    # IWT stores, which stay f32).
    assert gcb == 128, "packed-front requires g*cb == 128"
    dwt_ls = []
    pos = 0
    for l in range(levels + 1):
        dwt_ls.append(scratch[pos:pos + 4 ** l])
        pos += 4 ** l
    att_ls = scratch[pos:pos + ns]
    pos += ns
    iwt_ls = []
    for l in range(levels):
        cnt = 4 ** (levels - 1 - l)
        iwt_ls.append(scratch[pos:pos + cnt])
        pos += cnt

    x = jnp.concatenate([xa[0], xb[0]], axis=0)
    x_add = None
    if has_add:
        x_add = jnp.concatenate([aa[0], ab[0]], axis=0)[None]
    sv = s_ref[pl.ds(b, 1), :]
    tv = t_ref[pl.ds(b, 1), :]
    z = _affine_band(x[None], x_add, sv, tv, i=i, h=h, w=w, block=block,
                     halo=halo, levels=levels, r=r, col_off=col_off)[0]

    # packed DWT pyramid (full-lane strided quad loads per 128-wide
    # subband; strided access must go through f32 refs, never values)
    dwt_ls[0][0][:] = z.astype(jnp.float32)
    for l in range(levels):
        for si, src in enumerate(dwt_ls[l]):
            a = src[0::2, 0::2, :]
            bb_ = src[1::2, 0::2, :]
            cc = src[0::2, 1::2, :]
            dd = src[1::2, 1::2, :]
            dsts = dwt_ls[l + 1][4 * si:4 * si + 4]
            for dst, val in zip(dsts, (
                    (a + bb_ + cc + dd), (-a - bb_ + cc + dd),
                    (-a + bb_ - cc + dd), (a - bb_ - cc + dd))):
                dst[:] = (val * 0.5).astype(dst.dtype)

    relh = relh_ref[:].astype(jnp.float32)
    relw = relw_ref[:].astype(jnp.float32)
    c2 = c // 2
    # full-buffer contiguous loads, cast to f32 BEFORE the cb-wide lane
    # slicing (sub-128 bf16 lane slices are a Mosaic hazard)
    groups = [buf[:].astype(jnp.float32) for buf in dwt_ls[levels]]
    if c < 128:
        # PACKED-ATTENTION subgroup mode (L=1: per-image C=64 sits below
        # the 128-lane floor — sub-128 batched dots crash Mosaic). Each
        # subgroup of ``sub`` images runs the packed-weight attention at
        # sub*C lanes; wqkv/relh/relw refs carry pack_branch_weights(
        # g=sub) outputs and att_ls is f32 (64-lane-offset stores must
        # stay 32-bit). Kills the XLA lane-half restacks the model's
        # branch 2 paid ~2 ms/step for (scripts/dissect_glue.py).
        sc_ = sub * cb
        gc_ = sub * c
        for s0 in range(0, g, sub):
            zsub = jnp.concatenate(
                [groups[_rev4(sidx, levels)][:, :, s0 * cb:s0 * cb + sc_]
                 for sidx in range(ns)], axis=-1)
            zf = zsub.reshape(win * wp, gc_).astype(jnp.bfloat16)
            qkv = jnp.dot(zf, wqkv_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=precision).reshape(win, wp, 3 * gc_)
            q_full = qkv[halo:halo + block, halo:halo + wc, :gc_] \
                * (c ** -0.5)
            kv_full = qkv[..., gc_:] + relh[:, None, :]
            out_p = _attend_packed(q_full, kv_full, relw, block=block,
                                   halo=halo, wc=wc, g=sub, cb=cb,
                                   levels=levels, precision=precision)
            for sidx in range(ns):
                att_ls[_rev4(sidx, levels)][
                    :, :, s0 * cb:s0 * cb + sc_] = out_p[
                    :, :, sidx * sc_:(sidx + 1) * sc_].astype(
                        att_ls[0].dtype)
        outs = None
    else:
        outs = [None] * g
    for s0 in (() if outs is None else range(0, g, sub)):
        # unstack `sub` images: per image, its coarse channels are ns
        # cb-wide lane chunks (p-layout), sub-sliced from 128-wide values
        imgs = []
        for img in range(s0, s0 + sub):
            chunks = [groups[_rev4(sidx, levels)][:, :,
                                                  img * cb:(img + 1) * cb]
                      for sidx in range(ns)]
            imgs.append(jnp.concatenate(chunks, axis=-1))
        zsub = jnp.stack(imgs, axis=0).astype(jnp.bfloat16)

        zf = zsub.reshape(sub * win * wp, c)
        qkv = jnp.dot(zf, wqkv_ref[:], preferred_element_type=jnp.float32,
                      precision=precision).reshape(sub, win, wp, 3 * c)
        q_full = qkv[:, halo:halo + block, halo:halo + wc, :c] \
            * (c ** -0.5)
        kv_full = jnp.concatenate(
            [qkv[..., c:c + c2] + relh[None, :, None, :],
             qkv[..., c + c2:]], axis=-1)
        out_sub = _attend_batched(q_full, kv_full, relw, block=block,
                                  halo=halo, wc=wc, precision=precision)
        for k, img in enumerate(range(s0, s0 + sub)):
            outs[img] = out_sub[k]
    # re-pack: per subband, concat the g images' cb-wide chunks (sliced
    # through 128-wide intermediates when C > 128) into its 128-wide
    # scratch (packed-attention mode stored att_ls in the subgroup loop)
    if outs is not None:
        if c > 128:
            out128 = [[outs[img][:, :, k * 128:(k + 1) * 128]
                       for k in range(c // 128)] for img in range(g)]

            def chunk(img, sidx):
                p0 = sidx * cb
                return out128[img][p0 // 128][:, :,
                                              p0 % 128:p0 % 128 + cb]
        else:
            def chunk(img, sidx):
                return outs[img][:, :, sidx * cb:(sidx + 1) * cb]

        for sidx in range(ns):
            att_ls[_rev4(sidx, levels)][:] = jnp.concatenate(
                [chunk(img, sidx) for img in range(g)],
                axis=-1).astype(att_ls[0].dtype)

    # packed IWT: 4 subband scratches -> one double-resolution scratch
    cur = att_ls
    for l in range(levels):
        nxt = iwt_ls[l]
        for di, dst in enumerate(nxt):
            ll = cur[4 * di][:].astype(jnp.float32)
            hl = cur[4 * di + 1][:].astype(jnp.float32)
            lh = cur[4 * di + 2][:].astype(jnp.float32)
            hh = cur[4 * di + 3][:].astype(jnp.float32)
            dst[0::2, 0::2, :] = (ll - hl - lh + hh) * 0.5
            dst[0::2, 1::2, :] = (ll + hl - lh - hh) * 0.5
            dst[1::2, 0::2, :] = (ll - hl + lh - hh) * 0.5
            dst[1::2, 1::2, :] = (ll + hl + lh + hh) * 0.5
        cur = nxt

    blk_full = block * sf
    # slice by the COMPUTE width (wc*sf == the slab width in column-slab
    # mode); ``w`` is the global frame width for the interior mask only
    res = z[hs:hs + blk_full, hs:hs + wc * sf, :].astype(jnp.float32)
    out_ref[0] = (cur[0][:] + res).astype(out_ref.dtype)


def packed_front_vmem_bytes(w, cb, g, block, halo, levels):
    """Scratch + io + live estimate for the packed-front kernel."""
    sf = 2 ** levels
    win = block + 2 * halo
    wp_full = w + 2 * halo * sf
    blk_full = block * sf
    wc = w // sf
    gcb = g * cb
    rows0 = win * sf
    hs = halo * sf
    # in views: full band + 2*hs tail rows, 2 pipeline buffers, bf16
    total = 2 * 2 * (blk_full + 2 * hs) * wp_full * _lanes(gcb)
    total += 2 * 2 * blk_full * w * _lanes(gcb)            # out blocks
    total += 4 * rows0 * wp_full * _lanes(gcb)             # z band (f32)
    for l in range(levels + 1):                            # packed DWT
        bpe = 2 if l == levels else 4
        total += bpe * (rows0 >> l) * (wp_full >> l) * _lanes(gcb * 4 ** l)
    c = cb * 4 ** levels
    wp = wc + 2 * halo
    nw = wc // block
    bb = block * block
    if c < 128:
        # packed-attention subgroups (sub=4, stacked-query live sets;
        # att scratch f32 — see _packed_front_kernel packed-attn mode)
        sub = 4
        gc_ = sub * c
        total += 4 * block * wc * _lanes(gcb * 4 ** levels)  # att f32
        total += 4 * win * wp * 3 * gc_                      # qkv f32
        total += 4 * nw * win * win * _lanes(2 * gc_)        # patches
        total += 2 * 4 * nw * sub * bb * _lanes(gc_)         # qs + av
        total += 2 * 4 * nw * sub * bb * _lanes(win * win)   # sim + attn
    else:
        total += 2 * block * wc * _lanes(gcb * 4 ** levels)  # att bf16
        # per-subgroup live: qkv f32 + patches/logits (sub=2)
        total += 4 * 2 * win * wp * 3 * c
        total += 4 * 2 * nw * 2 * win * win * _lanes(c)
    for l in range(levels):                                # packed IWT f32
        total += 4 * (block << (l + 1)) * (wc << (l + 1)) * _lanes(
            gcb * 4 ** levels >> (2 * (l + 1)))
    return total


def packed_front_cascade_impl(x, x_add, s, t, w_qkv, rel_h, rel_w, *,
                              block, halo, levels, g, r, interpret,
                              sub: int = 2, precision=None):
    """Packed-front cascade branch (see _packed_front_kernel). Same
    contract as packed_cascade_impl."""
    bsz = x.shape[0]
    xp = pack_batch(x, g, interpret)
    ap = pack_batch(x_add, g, interpret) if x_add is not None else None
    sp = s.astype(jnp.float32).reshape(bsz // g, g * x.shape[-1])
    tp = t.astype(jnp.float32).reshape(bsz // g, g * x.shape[-1])
    out = packed_front_core(
        xp, ap, sp, tp, w_qkv, rel_h, rel_w, cb=x.shape[-1], block=block,
        halo=halo, levels=levels, g=g, r=r, sub=sub, interpret=interpret,
        precision=precision)
    return unpack_batch(out, g, interpret)


def packed_front_core(xp, ap, sp, tp, w_qkv, rel_h, rel_w, *, cb, block,
                      halo, levels, g, r, interpret, sub: int = 2,
                      precision=None, col_off: int = 0,
                      frame_w=None, ext_cols: bool = False):
    """Packed-front cascade on an ALREADY slot-major-packed input
    (B/G, H, W, G*cb); returns the PACKED output of the same shape.

    Column-slab mode (packed_front_tiled): ``ext_cols=True`` marks the
    input as carrying halo*2^L REAL neighbor columns on each side (so no
    zero col-padding here), ``col_off`` is the slab's global first
    column and ``frame_w`` the global frame width for the interior
    mask."""
    bp, h, w, gcb = xp.shape
    assert gcb == g * cb
    bsz = bp * g
    sf = 2 ** levels
    c = cb * 4 ** levels
    win = block + 2 * halo
    packed_attn = c < 128  # see _packed_front_kernel packed-attn mode

    nh = h // (block * sf)
    blk_full = block * sf
    hs = halo * sf
    pad_bottom = (nh + 1) * blk_full - h - hs
    if ext_cols:
        w_out = w - 2 * hs
        xpp = jnp.pad(xp, ((0, 0), (hs, pad_bottom), (0, 0), (0, 0)))
    else:
        w_out = w
        xpp = jnp.pad(xp, ((0, 0), (hs, pad_bottom), (hs, hs), (0, 0)))
    wc = w_out // sf
    wp_full = w_out + 2 * hs
    frame_w = w_out if frame_w is None else frame_w
    has_add = ap is not None

    kernel = functools.partial(_packed_front_kernel, block=block,
                               halo=halo, wc=wc, levels=levels, g=g,
                               sub=sub, precision=precision, h=h,
                               w=frame_w, r=float(r), has_add=has_add,
                               col_off=col_off)
    band_spec = pl.BlockSpec(
        (1, blk_full, wp_full, gcb), lambda b, i: (b, i, 0, 0),
        memory_space=pltpu.VMEM)
    # the halo below band i is only 2*hs rows — view the same array at
    # 2*hs-row granularity instead of loading a second full band
    assert blk_full % (2 * hs) == 0
    step = blk_full // (2 * hs)
    tail_spec = pl.BlockSpec(
        (1, 2 * hs, wp_full, gcb),
        lambda b, i: (b, (i + 1) * step, 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: tuple(0 for _ in shp), memory_space=pltpu.VMEM)
    per_img = pl.BlockSpec((bsz // g, gcb), lambda b, i: (0, 0),
                           memory_space=pltpu.VMEM)

    operands = [xpp, xpp]
    in_specs = [band_spec, tail_spec]
    if has_add:
        if ext_cols:
            app = jnp.pad(ap, ((0, 0), (hs, pad_bottom), (0, 0), (0, 0)))
        else:
            app = jnp.pad(ap, ((0, 0), (hs, pad_bottom), (hs, hs),
                               (0, 0)))
        operands += [app, app]
        in_specs += [band_spec, tail_spec]
    if packed_attn:
        # packed-attention subgroups: the kernel consumes the g=sub
        # packed projection weight and [k|v]-wide rel biases
        w_att, relh_att, relw_att = pack_branch_weights(
            w_qkv, rel_h.astype(jnp.float32), rel_w.astype(jnp.float32),
            cb=cb, g=sub, levels=levels)
        gc_ = sub * c
        operands += [sp, tp, w_att.astype(xp.dtype), relh_att, relw_att]
        in_specs += [per_img, per_img, const((gc_, 3 * gc_)),
                     const((win, 2 * gc_)), const((win, 2 * gc_))]
    else:
        operands += [sp, tp, w_qkv.astype(xp.dtype),
                     rel_h.astype(jnp.float32), rel_w.astype(jnp.float32)]
        in_specs += [per_img, per_img, const((c, 3 * c)),
                     const((win, c // 2)), const((win, c // 2))]

    # Scratch: per-subband 128-lane buffers (see kernel header) — level l
    # of the DWT pyramid is 4^l buffers (final level bf16), attention
    # output is 4^levels bf16 buffers (f32 in packed-attention mode: its
    # 64-lane-offset stores must stay 32-bit), IWT level l is
    # 4^(levels-1-l) f32 buffers, all gcb lanes wide.
    rows0 = win * sf
    scratch = []
    for l in range(levels + 1):
        dt = jnp.bfloat16 if l == levels else jnp.float32
        scratch += [pltpu.VMEM(((rows0 >> l), (wp_full >> l), gcb),
                               dt)] * (4 ** l)
    att_dt = jnp.float32 if packed_attn else jnp.bfloat16
    scratch += [pltpu.VMEM((block, wc, gcb), att_dt)] * (4 ** levels)
    for l in range(levels):
        scratch += [pltpu.VMEM(
            (block << (l + 1), wc << (l + 1), gcb),
            jnp.float32)] * (4 ** (levels - 1 - l))

    nw = wc // block
    flops_per_band = (
        2 * g * win * (wc + 2 * halo) * c * 3 * c
        + nw * (2 * g * block * block * win * win * c * 2))
    out = pl.pallas_call(
        kernel,
        grid=(bsz // g, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk_full, w_out, gcb),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz // g, h, w_out, gcb), xp.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_band * (bsz // g) * nh),
            bytes_accessed=int((3 if has_add else 2) * xp.size
                               * xp.dtype.itemsize),
            transcendentals=int(bsz * h * w * win * win // sf ** 2)),
        interpret=interpret,
    )(*operands)
    return out


def pick_packed_front(bsz: int, w: int, cb: int, levels: int,
                      block: int = 8, halo: int = 1):
    """(g, sub) for the packed-front cascade variant, or None.

    Requires g*cb == 128 exactly (the kernel's scratch layout), g | bsz,
    and the VMEM estimate under the device budget (absent budget = off
    for that level; see device.py packed_front_budget for the v5e
    evidence)."""
    from m2trans_tpu.ops.pallas.device import gate_profile

    budget = gate_profile().get("packed_front_budget", {}).get(levels)
    if not budget or 128 % cb:
        return None
    g = 128 // cb
    if g < 2 or bsz % g or w % (block * 2 ** levels):
        return None
    if packed_front_vmem_bytes(w, cb, g, block, halo, levels) > budget:
        return None
    # sub-128-C levels use the packed-attention subgroup mode at
    # sub*C = 256 lanes (L=1: two gc=256 iterations, matching the
    # measured-good restacked g=4 shape); native-C levels use sub=2
    return g, (4 if cb * 4 ** levels < 128 else 2)


def pick_pack_g(bsz: int, w: int, cb: int, levels: int,
                block: int = 8, halo: int = 1) -> int:
    """Largest profitable lane-pack group for the cascade dispatch
    (1 = packing off, use the banded kernel).

    Constraints, all v5e-measured (see device.py packed_budget):
      * G must divide the batch;
      * G*C >= 128 — batched dot_generals with a sub-128-lane contraction
        crash the Mosaic compiler (L=0 g in {2,4} observed);
      * G*C <= 256 — beyond that the stacked-query/logit buffers thrash
        VMEM (L=1 g=8, est 28.6M: 12.9 ms vs 0.068 at g=4);
      * the VMEM estimate must fit the device budget (absent budget =
        packing disabled for that level, e.g. L=2)."""
    from m2trans_tpu.ops.pallas.device import gate_profile

    budget = gate_profile().get("packed_budget", {}).get(levels)
    if not budget:
        return 1
    c = cb * 4 ** levels
    best = 1
    for g in (2, 4, 8):
        if bsz % g or g * c < 128 or g * c > 256:
            continue
        if packed_vmem_bytes(w, cb, g, block, halo, levels) <= budget:
            best = g
    return best


def packed_cascade_impl(x, x_add, s, t, w_qkv, rel_h, rel_w, *, block,
                        halo, levels, g, r, interpret, precision=None):
    """Packed fused cascade branch. Args are the UNPACKED per-image
    tensors (same contract as halo_attn._cascade_banded_impl); packing
    and weight/bias preparation happen here in XLA."""
    bsz = x.shape[0]
    xp = pack_batch(x, g, interpret)
    ap = pack_batch(x_add, g, interpret) if x_add is not None else None
    sp = s.astype(jnp.float32).reshape(bsz // g, g * x.shape[-1])
    tp = t.astype(jnp.float32).reshape(bsz // g, g * x.shape[-1])
    out = packed_cascade_core(
        xp, ap, sp, tp, w_qkv, rel_h, rel_w, cb=x.shape[-1], block=block,
        halo=halo, levels=levels, g=g, r=r, interpret=interpret,
        precision=precision)
    return unpack_batch(out, g, interpret)


def packed_cascade_core(xp, ap, sp, tp, w_qkv, rel_h, rel_w, *, cb,
                        block, halo, levels, g, r, interpret,
                        precision=None, col_off: int = 0, frame_w=None,
                        ext_cols: bool = False):
    """Packed fused cascade on an ALREADY slot-major-packed input
    (B/G, H, W, G*cb); returns the PACKED output of the same shape
    (callers that hold the whole CFTM body packed skip the per-branch
    pack/unpack round trips). Column-slab mode: see packed_front_core —
    ``ext_cols`` marks halo*2^L real overlap columns on the input,
    ``col_off``/``frame_w`` offset the interior mask."""
    bp, h, w, gcb = xp.shape
    assert gcb == g * cb
    bsz = bp * g
    sf = 2 ** levels
    win = block + 2 * halo
    gc = g * cb * 4 ** levels

    w_p, relh_p, relw_p = pack_branch_weights(
        w_qkv, rel_h.astype(jnp.float32), rel_w.astype(jnp.float32),
        cb=cb, g=g, levels=levels)
    w_p = w_p.astype(xp.dtype)

    nh = h // (block * sf)
    blk_full = block * sf
    hs = halo * sf
    pad_bottom = (nh + 1) * blk_full - h - hs
    if ext_cols:
        w_out = w - 2 * hs
        pads = ((0, 0), (hs, pad_bottom), (0, 0), (0, 0))
    else:
        w_out = w
        pads = ((0, 0), (hs, pad_bottom), (hs, hs), (0, 0))
    xpp = jnp.pad(xp, pads)
    wc = w_out // sf
    wp_full = w_out + 2 * hs
    frame_w = w_out if frame_w is None else frame_w
    has_add = ap is not None

    kernel = functools.partial(_packed_cascade_kernel, block=block,
                               halo=halo, wc=wc, levels=levels, g=g,
                               precision=precision, h=h, w=frame_w,
                               r=float(r), has_add=has_add,
                               col_off=col_off)
    band_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, blk_full, wp_full, gcb), lambda b, i, o=off: (b, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: tuple(0 for _ in shp), memory_space=pltpu.VMEM)
    per_img = pl.BlockSpec((bsz // g, gcb), lambda b, i: (0, 0),
                           memory_space=pltpu.VMEM)

    operands = [xpp, xpp]
    in_specs = [band_spec(0), band_spec(1)]
    if has_add:
        app = jnp.pad(ap, pads)
        operands += [app, app]
        in_specs += [band_spec(0), band_spec(1)]
    operands += [sp, tp, w_p, relh_p, relw_p]
    in_specs += [per_img, per_img, const((gc, 3 * gc)),
                 const((win, 2 * gc)), const((win, 2 * gc))]

    nw = wc // block
    flops_per_band = (
        2 * win * (wc + 2 * halo) * gc * 3 * gc
        + nw * (2 * g * block * block * win * win * gc * 2))
    out = pl.pallas_call(
        kernel,
        grid=(bsz // g, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk_full, w_out, gcb),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz // g, h, w_out, gcb), xp.dtype),
        scratch_shapes=_packed_scratch_shapes(wp_full, wc, gcb, gc, block,
                                              halo, levels),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_band * (bsz // g) * nh),
            bytes_accessed=int((3 if has_add else 2) * xp.size
                               * xp.dtype.itemsize),
            transcendentals=int(bsz * h * w * win * win // sf ** 2)),
        interpret=interpret,
    )(*operands)
    return out


# ---------------------------------------------------------------------------
# Packed BACKWARD (round 3, late): the cascade backward kernels were the
# r2 banded design at 16-lane occupancy for the L=0/L=1 branches — the
# same op-issue wall lane packing removed from the forward (body bwd
# ~48 ms of the 66 ms flagship train step). This kernel runs the reverse
# chain fully packed: recompute (affine/DWT/packed qkv/stacked-query
# attention), then packed adjoints — the slot-diagonal extraction's
# adjoint broadcasts the cotangent onto the stacked rows with the SAME
# block-diagonal mask, the masked-query adjoint folds the stacked rows
# back with a masked sum. Weight/rel-pos grads accumulate in PACKED
# layout; unpacking them (adjoints of pack_branch_weights) is a few
# tiny XLA einsums per branch call.
# ---------------------------------------------------------------------------


def unpack_weight_grads(dwp, drhp, drwp, *, cb, g, levels):
    """Adjoints of pack_branch_weights: packed grads -> (dw_qkv (C, 3C),
    drel_h (win, C/2), drel_w (win, C/2))."""
    c = cb * 4 ** levels
    ns = 4 ** levels
    gc = g * c
    eye = jnp.eye(g, dtype=dwp.dtype)
    parts = []
    for j in range(3):
        wj = dwp[:, j * gc:(j + 1) * gc].reshape(ns, g, cb, ns, g, cb)
        parts.append(jnp.einsum("aibcjd,ij->abcd", wj, eye).reshape(c, c))
    dw = jnp.concatenate(parts, axis=1)

    win = drhp.shape[0]
    c2 = c // 2

    def untile_k(dr, half):
        dk = dr[:, :gc]  # the k block (the v block's bias is zero)
        if ns == 1:
            full = dk.reshape(win, g, c).sum(axis=1)
            return full[:, :c2] if half == 0 else full[:, c2:]
        halfd = (dk[:, :gc // 2] if half == 0 else dk[:, gc // 2:])
        return halfd.reshape(win, ns // 2, g, cb).sum(axis=2) \
                    .reshape(win, c2)

    return dw, untile_k(drhp, 0), untile_k(drwp, 1)


def _dwt3(v, bufs):
    """DWT^L of a 3-D (rows, W, GCb) value via f32 scratch refs."""
    if not bufs:
        return v
    bufs[0][:] = v.astype(jnp.float32)
    for l in range(len(bufs) - 1):
        src, dst = bufs[l], bufs[l + 1]
        a = src[0::2, 0::2, :]
        b = src[1::2, 0::2, :]
        cc = src[0::2, 1::2, :]
        d = src[1::2, 1::2, :]
        dst[:] = jnp.concatenate(
            [(a + b + cc + d), (-a - b + cc + d), (-a + b - cc + d),
             (a - b - cc + d)], axis=-1) * 0.5
    return bufs[-1][:]


def _iwt3(v, bufs):
    """IWT^L of a coarse 3-D (r, w, 4^L*GCb) value via f32 scratch refs."""
    for dst in bufs:
        ll, hl, lh, hh = jnp.split(v, 4, axis=-1)
        dst[0::2, 0::2, :] = (ll - hl - lh + hh) * 0.5
        dst[0::2, 1::2, :] = (ll + hl - lh - hh) * 0.5
        dst[1::2, 0::2, :] = (ll - hl + lh - hh) * 0.5
        dst[1::2, 1::2, :] = (ll + hl + lh + hh) * 0.5
        v = dst[:]
    return v


def _packed_bwd_body(x, x_add, g_band4, sv, tv, wp_ref, relh_ref,
                     relw_ref, z_bufs, g_bufs, iwt_bufs, *, block, halo,
                     wc, levels, g, precision, h, w, r, i, col_off=0):
    """Shared packed backward math on assembled band/tile values.
    ``x``: (1, win*2^L, Wp_full, GCb) packed band; ``g_band4``:
    (1, blk*2^L, W_cols, GCb) packed cotangent block. Returns
    (dz extended band f32 (3-D), dwp, drhp, drwp — all packed)."""
    sf = 2 ** levels
    win = block + 2 * halo
    wp = wc + 2 * halo
    nw = wc // block
    bb = block * block
    hs = halo * sf
    gcb = x.shape[-1]
    cb = gcb // g
    c = cb * 4 ** levels
    gc = g * c

    # ---- forward recompute (packed) ----
    z = _affine_band(x, x_add, sv, tv, i=i, h=h, w=w, block=block,
                     halo=halo, levels=levels, r=r,
                     col_off=col_off)[0].astype(jnp.float32)
    zc = _dwt3(z, z_bufs) if levels else z          # (win, wp, GC)
    zf = zc.reshape(win * wp, gc).astype(jnp.bfloat16)
    qkv = jnp.dot(zf, wp_ref[:], preferred_element_type=jnp.float32,
                  precision=precision).reshape(win, wp, 3 * gc)
    scale = c ** -0.5
    q_full = qkv[halo:halo + block, halo:halo + wc, :gc] * scale
    relh = relh_ref[:].astype(jnp.float32)
    relw = relw_ref[:].astype(jnp.float32)
    kv_full = qkv[..., gc:] + relh[:, None, :]
    kvb = _window_patches(kv_full[None], block=block, halo=halo, wc=wc)[0]
    kvb = kvb + relw[None, None, :, :]
    kvb = kvb.reshape(nw, win * win, 2 * gc)
    kb = kvb[..., :gc]
    vb = kvb[..., gc:]
    qb = q_full.reshape(block, nw, block, gc).transpose(1, 0, 2, 3)
    qb = qb.reshape(nw, bb, gc)
    qs = jnp.concatenate([qb] * g, axis=1)          # (nw, G*bb, GC)
    row_slot = jax.lax.broadcasted_iota(jnp.int32, (g * bb, gc), 0) // bb
    lane = jax.lax.broadcasted_iota(jnp.int32, (g * bb, gc), 1)
    lane_slot = (lane % (g * cb)) // cb
    bd = (row_slot == lane_slot)
    qs = jnp.where(bd[None], qs, 0.0)
    sim = jax.lax.dot_general(
        qs, kb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    e = jnp.exp(sim)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)   # (nw, G*bb, win^2)

    # ---- backward (packed) ----
    g_band = g_band4[0].astype(jnp.float32)         # (blk_full, w, GCb)
    gcoarse = _dwt3(g_band, g_bufs) if levels else g_band
    g_w = gcoarse.astype(jnp.float32).reshape(
        block, nw, block, gc).transpose(1, 0, 2, 3).reshape(nw, bb, gc)
    # adjoint of the slot-diagonal extraction: broadcast onto the stacked
    # rows under the same block-diagonal mask
    dr = jnp.concatenate([g_w] * g, axis=1)         # (nw, G*bb, GC)
    dr = jnp.where(bd[None], dr, 0.0)

    dattn = jax.lax.dot_general(                    # dr @ v^T
        dr, vb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    dvb = jax.lax.dot_general(                      # attn^T @ dr
        attn, dr, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    rs = jnp.sum(dattn * attn, axis=-1, keepdims=True)
    dsim = attn * (dattn - rs)
    dqs = jax.lax.dot_general(                      # dsim @ k
        dsim, kb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    dkb = jax.lax.dot_general(                      # dsim^T @ qs
        dsim, qs, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)

    # adjoint of the stacked-masked queries: masked sum over the g stacks
    dqs = jnp.where(bd[None], dqs, 0.0)
    dqb = jnp.sum(dqs.reshape(nw, g, bb, gc), axis=1)
    dq_full = dqb.reshape(nw, block, block, gc).transpose(1, 0, 2, 3)
    dq_full = dq_full.reshape(block, wc, gc) * scale

    dkvb = jnp.concatenate([dkb, dvb], axis=-1)     # (nw, win^2, 2GC)
    dkvb = dkvb.reshape(nw, win, win, 2 * gc)
    drwp_c = jnp.sum(dkvb, axis=(0, 1))             # (win, 2GC)
    from m2trans_tpu.ops.pallas.halo_attn import _unpatch

    dkv_full = _unpatch(dkvb[None], block=block, halo=halo, wp=wp)[0]
    drhp_c = jnp.sum(dkv_full, axis=1)              # (win, 2GC)

    dq_emb = jnp.pad(dq_full, ((halo, halo), (halo, halo), (0, 0)))
    dqkv = jnp.concatenate([dq_emb, dkv_full], axis=-1)
    dqkv_f = dqkv.reshape(win * wp, 3 * gc)
    dwp_c = jax.lax.dot_general(                    # zf^T @ dqkv
        zf, dqkv_f, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    dzc = jax.lax.dot_general(                      # dqkv @ w_p^T
        dqkv_f, wp_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision).reshape(win, wp, gc)
    dz = _iwt3(dzc, iwt_bufs) if levels else dzc    # (win*sf, wpf, GCb)

    g_pad = jnp.pad(g_band, ((hs, hs), (hs, hs), (0, 0)))
    dz = dz.astype(jnp.float32) + g_pad
    return dz, dwp_c, drhp_c, drwp_c


def _packed_acc_grads(first, dwp_ref, drhp_ref, drwp_ref, dwp_c, drhp_c,
                      drwp_c):
    @pl.when(first)
    def _():
        dwp_ref[:] = dwp_c.astype(dwp_ref.dtype)
        drhp_ref[:] = drhp_c.astype(drhp_ref.dtype)
        drwp_ref[:] = drwp_c.astype(drwp_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        dwp_ref[:] = dwp_ref[:] + dwp_c.astype(dwp_ref.dtype)
        drhp_ref[:] = drhp_ref[:] + drhp_c.astype(drhp_ref.dtype)
        drwp_ref[:] = drwp_ref[:] + drwp_c.astype(drwp_ref.dtype)


def _packed_bwd_kernel(*refs, block: int, halo: int, wc: int, levels: int,
                       g: int, precision, h: int, w: int, r: float,
                       has_add: bool):
    if has_add:
        (xa, xb, aa, ab, ga, s_ref, t_ref, wp_ref, relh_ref, relw_ref,
         dze_ref, dwp_ref, drhp_ref, drwp_ref, *scratch) = refs
    else:
        (xa, xb, ga, s_ref, t_ref, wp_ref, relh_ref, relw_ref,
         dze_ref, dwp_ref, drhp_ref, drwp_ref, *scratch) = refs
        aa = ab = None
    sf = 2 ** levels
    b = pl.program_id(0)
    i = pl.program_id(1)
    hs = halo * sf

    n_dwt = levels + 1 if levels else 0
    z_bufs = scratch[:n_dwt]
    g_bufs = scratch[n_dwt:2 * n_dwt]
    iwt_bufs = scratch[2 * n_dwt:]

    x = jnp.concatenate([xa[:], xb[:, : 2 * hs]], axis=1)
    x_add = None
    if has_add:
        x_add = jnp.concatenate([aa[:], ab[:, : 2 * hs]], axis=1)
    sv = s_ref[pl.ds(b, 1), :]
    tv = t_ref[pl.ds(b, 1), :]
    dz, dwp_c, drhp_c, drwp_c = _packed_bwd_body(
        x, x_add, ga[:], sv, tv, wp_ref, relh_ref, relw_ref, z_bufs,
        g_bufs, iwt_bufs, block=block, halo=halo, wc=wc, levels=levels,
        g=g, precision=precision, h=h, w=w, r=r, i=i)

    dze_ref[0, 0] = dz.astype(dze_ref.dtype)
    _packed_acc_grads((b == 0) & (i == 0), dwp_ref, drhp_ref, drwp_ref,
                      dwp_c, drhp_c, drwp_c)


def _packed_bwd_tile_kernel(*refs, block: int, halo: int, wc: int,
                            levels: int, g: int, precision, h: int,
                            w: int, slab: int, r: float, has_add: bool):
    """Column-slab tiled PACKED backward: grid (B/G, nh, n_slabs) —
    full-lane packed reverse chain at widths where the full-width packed
    backward exceeds VMEM (the x2/x3 body widths). Per-program footprint
    equals the verified full-width case at W == slab."""
    if has_add:
        (xaa, xab, xba, xbb, aaa, aab, aba, abb, ga, s_ref, t_ref,
         wp_ref, relh_ref, relw_ref,
         dze_ref, dwp_ref, drhp_ref, drwp_ref, *scratch) = refs
    else:
        (xaa, xab, xba, xbb, ga, s_ref, t_ref, wp_ref, relh_ref,
         relw_ref, dze_ref, dwp_ref, drhp_ref, drwp_ref, *scratch) = refs
        aaa = aab = aba = abb = None
    sf = 2 ** levels
    hh = 2 * halo * sf
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    n_dwt = levels + 1 if levels else 0
    z_bufs = scratch[:n_dwt]
    g_bufs = scratch[n_dwt:2 * n_dwt]
    iwt_bufs = scratch[2 * n_dwt:]

    def tile(va, vb, vc, vd):
        top = jnp.concatenate([va[0], vb[0][:, :hh]], axis=1)
        bot = jnp.concatenate([vc[0][:hh], vd[0][:hh, :hh]], axis=1)
        return jnp.concatenate([top, bot], axis=0)[None]

    x = tile(xaa, xab, xba, xbb)
    x_add = tile(aaa, aab, aba, abb) if has_add else None
    sv = s_ref[pl.ds(b, 1), :]
    tv = t_ref[pl.ds(b, 1), :]
    dz, dwp_c, drhp_c, drwp_c = _packed_bwd_body(
        x, x_add, ga[:], sv, tv, wp_ref, relh_ref, relw_ref, z_bufs,
        g_bufs, iwt_bufs, block=block, halo=halo, wc=wc, levels=levels,
        g=g, precision=precision, h=h, w=w, r=r, i=i, col_off=j * slab)

    dze_ref[0, 0, :, 0] = dz.astype(dze_ref.dtype)
    _packed_acc_grads((b == 0) & (i == 0) & (j == 0), dwp_ref, drhp_ref,
                      drwp_ref, dwp_c, drhp_c, drwp_c)


def packed_bwd_vmem_bytes(w, cb, g, block, halo, levels):
    """Estimate of the packed backward kernel's VMEM (bytes). Roughly the
    packed forward plus the cotangent-side live set: the g band block,
    the stacked (nw, G*bb, win^2)/(nw, G*bb, GC) f32 buffers live 2-3 at
    a time during the reverse dots, the dqkv band, and the dze out."""
    sf = 2 ** levels
    win = block + 2 * halo
    blk_full = block * sf
    hs = halo * sf
    wp_full = w + 2 * hs
    wc = w // sf
    wp = wc + 2 * halo
    nw = wc // block
    bb = block * block
    gcb = g * cb
    gc = gcb * 4 ** levels
    total = packed_vmem_bytes(w, cb, g, block, halo, levels)
    total += 2 * 2 * blk_full * w * _lanes(gcb)          # ga blocks
    total += 2 * 2 * (blk_full + 2 * hs) * wp_full * _lanes(gcb)  # dze
    total += 2 * 4 * nw * g * bb * _lanes(win * win)     # dattn + dsim
    total += 2 * 4 * nw * g * bb * _lanes(gc)            # dr + dqs
    total += 2 * 4 * nw * win * win * _lanes(gc)         # dkb + dvb
    total += 2 * 4 * win * wp * _lanes(3 * gc)           # dqkv + dzc
    for l in range(levels):                              # g pyramid
        total += 4 * (blk_full >> l) * (w >> l) * _lanes(gcb * 4 ** l)
    return total


def pick_packed_bwd_g(bsz: int, w: int, cb: int, levels: int,
                      block: int = 8, halo: int = 1):
    """Pack group for the packed backward, or None. Same lane rules as
    the forward (G*C in [128, 256]); per-level budgets in device.py
    ("bwd_packed_budget" — absent level = packed backward off)."""
    from m2trans_tpu.ops.pallas.device import gate_profile

    budget = gate_profile().get("bwd_packed_budget", {}).get(levels)
    if not budget:
        return None
    c = cb * 4 ** levels
    best = None
    for g in (8, 4, 2):
        gc = g * c
        if bsz % g or gc < 128 or gc > 256:
            continue
        if packed_bwd_vmem_bytes(w, cb, g, block, halo, levels) <= budget:
            best = g
            break
    return best


def packed_cascade_bwd_impl(x, x_add, s, t, w_qkv, rel_h, rel_w, gout, *,
                            block, halo, levels, g, r, interpret,
                            precision=None):
    """Packed Pallas backward for the fused cascade branch: same grads
    as halo_attn._cascade_bwd_impl, computed at full lane occupancy."""
    bsz, h, w, cb = x.shape
    sf = 2 ** levels
    c = cb * (4 ** levels)
    win = block + 2 * halo
    wc = w // sf
    gcb = g * cb
    gc = g * c
    blk_full = block * sf
    hs = halo * sf
    ext = blk_full + 2 * hs
    has_add = x_add is not None
    bp = bsz // g

    xp = pack_batch(x, g, interpret)
    ap = pack_batch(x_add, g, interpret) if has_add else None
    ga = pack_batch(gout, g, interpret)
    sp = s.astype(jnp.float32).reshape(bp, gcb)
    tp = t.astype(jnp.float32).reshape(bp, gcb)

    w_p, relh_p, relw_p = pack_branch_weights(
        w_qkv, rel_h.astype(jnp.float32), rel_w.astype(jnp.float32),
        cb=cb, g=g, levels=levels)
    w_p = w_p.astype(xp.dtype)

    nh = h // blk_full
    pad_bottom = (nh + 1) * blk_full - h - hs
    pads = ((0, 0), (hs, pad_bottom), (hs, hs), (0, 0))
    xpp = jnp.pad(xp, pads)
    wp_full = w + 2 * hs

    kernel = functools.partial(_packed_bwd_kernel, block=block, halo=halo,
                               wc=wc, levels=levels, g=g,
                               precision=precision, h=h, w=w, r=float(r),
                               has_add=has_add)
    band_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, blk_full, wp_full, gcb), lambda b, i, o=off: (b, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: tuple(0 for _ in shp), memory_space=pltpu.VMEM)
    per_img = pl.BlockSpec((bp, gcb), lambda b, i: (0, 0),
                           memory_space=pltpu.VMEM)

    operands = [xpp, xpp]
    in_specs = [band_spec(0), band_spec(1)]
    if has_add:
        app = jnp.pad(ap, pads)
        operands += [app, app]
        in_specs += [band_spec(0), band_spec(1)]
    operands += [ga]
    in_specs += [pl.BlockSpec((1, blk_full, w, gcb),
                              lambda b, i: (b, i, 0, 0),
                              memory_space=pltpu.VMEM)]
    operands += [sp, tp, w_p, relh_p, relw_p]
    in_specs += [per_img, per_img, const((gc, 3 * gc)),
                 const((win, 2 * gc)), const((win, 2 * gc))]

    scratch = []
    if levels:
        rows0 = win * sf
        for l in range(levels + 1):  # z pyramid (band geometry)
            scratch.append(pltpu.VMEM(
                (rows0 >> l, wp_full >> l, gcb * 4 ** l), jnp.float32))
        for l in range(levels + 1):  # g pyramid (block geometry)
            scratch.append(pltpu.VMEM(
                (blk_full >> l, w >> l, gcb * 4 ** l), jnp.float32))
        wpc = wc + 2 * halo
        for l in range(levels):  # dz IWT pyramid (band geometry)
            scratch.append(pltpu.VMEM(
                ((win * 2) << l, (wpc * 2) << l, gc // 4 ** (l + 1)),
                jnp.float32))

    out_shapes = [
        jax.ShapeDtypeStruct((bp, nh, ext, wp_full, gcb), x.dtype),
        jax.ShapeDtypeStruct((gc, 3 * gc), jnp.float32),
        jax.ShapeDtypeStruct((win, 2 * gc), jnp.float32),
        jax.ShapeDtypeStruct((win, 2 * gc), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, ext, wp_full, gcb),
                     lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        const((gc, 3 * gc)), const((win, 2 * gc)), const((win, 2 * gc)),
    ]
    dze, dwp, drhp, drwp = pl.pallas_call(
        kernel,
        grid=(bp, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    # fold overlapping extended bands (rows), crop, unpack
    dze = dze.astype(jnp.float32)
    main = dze[:, :, :blk_full].reshape(bp, nh * blk_full, wp_full, gcb)
    tailp = jnp.pad(dze[:, :, blk_full:],
                    ((0, 0), (0, 0), (0, blk_full - 2 * hs), (0, 0),
                     (0, 0)))
    tailp = tailp.reshape(bp, nh * blk_full, wp_full, gcb)
    acc_rows = jnp.pad(main, ((0, 0), (0, blk_full), (0, 0), (0, 0))) \
        + jnp.pad(tailp, ((0, 0), (blk_full, 0), (0, 0), (0, 0)))
    dz_packed = acc_rows[:, hs:hs + h, hs:hs + w, :]
    dz = unpack_batch(dz_packed, g, interpret)      # (bsz, h, w, cb) f32

    xf = x.astype(jnp.float32)
    dx = (dz * s.astype(jnp.float32)[:, None, None, :]).astype(x.dtype)
    ds = jnp.sum(dz * xf, axis=(1, 2)).astype(s.dtype)
    dt = jnp.sum(dz, axis=(1, 2)).astype(t.dtype)
    dw, drel_h, drel_w = unpack_weight_grads(dwp, drhp, drwp, cb=cb, g=g,
                                             levels=levels)
    dw_qkv = dw.astype(w_qkv.dtype)
    drel_h = drel_h.astype(rel_h.dtype)
    drel_w = drel_w.astype(rel_w.dtype)
    if has_add:
        dx_add = (r * dz).astype(x_add.dtype)
        return dx, dx_add, ds, dt, dw_qkv, drel_h, drel_w
    return dx, ds, dt, dw_qkv, drel_h, drel_w


def pick_packed_bwd_tiled(bsz: int, w: int, cb: int, levels: int,
                          block: int = 8, halo: int = 1):
    """(g, slab) for the column-slab tiled packed backward, or None.
    Slab widths reuse the full-width packed-bwd budget with W == slab
    (the per-program footprint is identical up to the two extra views);
    among fitting (g, slab), maximize g then minimize total tile compute
    nwb*(slab + 2*halo*2^L)."""
    from m2trans_tpu.ops.pallas.device import gate_profile

    budget = gate_profile().get("bwd_packed_budget", {}).get(levels)
    if not budget:
        return None
    c = cb * 4 ** levels
    sf = 2 ** levels
    blk_full = block * sf
    hs = halo * sf
    if w % blk_full:
        return None
    for g in (8, 4, 2):
        gc = g * c
        if bsz % g or gc < 128 or gc > 256:
            continue

        def est(sl, g=g):
            # two extra x views on top of the full-width estimate at W=sl
            extra = 2 * 2 * 2 * blk_full * (sl + 2 * hs) * _lanes(g * cb)
            return packed_bwd_vmem_bytes(sl, cb, g, block, halo,
                                         levels) + extra

        best, best_cost = None, None
        sl = blk_full
        while sl <= w:
            if sl < w and est(sl) <= budget:
                nwb = -(-w // sl)
                cost = nwb * (sl + 2 * hs)
                if best is None or cost < best_cost or (
                        cost == best_cost and sl > best):
                    best, best_cost = sl, cost
            sl += blk_full
        if best is not None:
            return g, best
    return None


def packed_cascade_bwd_tiled_impl(x, x_add, s, t, w_qkv, rel_h, rel_w,
                                  gout, *, block, halo, levels, g, slab,
                                  r, interpret, precision=None):
    """Column-slab tiled packed backward (see _packed_bwd_tile_kernel).
    Same grads as packed_cascade_bwd_impl at widths beyond its VMEM
    budget."""
    bsz, h, w, cb = x.shape
    sf = 2 ** levels
    c = cb * (4 ** levels)
    win = block + 2 * halo
    gcb = g * cb
    gc = g * c
    blk_full = block * sf
    hs = halo * sf
    ext = blk_full + 2 * hs
    has_add = x_add is not None
    bp = bsz // g
    wcs = slab // sf
    wps = slab + 2 * hs
    nwb = -(-w // slab)
    nh = h // blk_full

    xp = pack_batch(x, g, interpret)
    ap = pack_batch(x_add, g, interpret) if has_add else None
    ga = pack_batch(gout, g, interpret)
    ga = jnp.pad(ga, ((0, 0), (0, 0), (0, nwb * slab - w), (0, 0)))
    sp = s.astype(jnp.float32).reshape(bp, gcb)
    tp = t.astype(jnp.float32).reshape(bp, gcb)

    w_p, relh_p, relw_p = pack_branch_weights(
        w_qkv, rel_h.astype(jnp.float32), rel_w.astype(jnp.float32),
        cb=cb, g=g, levels=levels)
    w_p = w_p.astype(xp.dtype)

    pad_bottom = (nh + 1) * blk_full - h - hs
    pad_right = (nwb + 1) * slab - w - hs
    pads = ((0, 0), (hs, pad_bottom), (hs, pad_right), (0, 0))
    xpp = jnp.pad(xp, pads)

    kernel = functools.partial(_packed_bwd_tile_kernel, block=block,
                               halo=halo, wc=wcs, levels=levels, g=g,
                               precision=precision, h=h, w=w, slab=slab,
                               r=float(r), has_add=has_add)
    view = lambda oi, oj: pl.BlockSpec(  # noqa: E731
        (1, blk_full, slab, gcb),
        lambda b, i, j, a=oi, d=oj: (b, i + a, j + d, 0),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i, j: tuple(0 for _ in shp),
        memory_space=pltpu.VMEM)
    per_img = pl.BlockSpec((bp, gcb), lambda b, i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    operands = [xpp, xpp, xpp, xpp]
    in_specs = [view(0, 0), view(0, 1), view(1, 0), view(1, 1)]
    if has_add:
        app = jnp.pad(ap, pads)
        operands += [app, app, app, app]
        in_specs += [view(0, 0), view(0, 1), view(1, 0), view(1, 1)]
    operands += [ga]
    in_specs += [pl.BlockSpec((1, blk_full, slab, gcb),
                              lambda b, i, j: (b, i, j, 0),
                              memory_space=pltpu.VMEM)]
    operands += [sp, tp, w_p, relh_p, relw_p]
    in_specs += [per_img, per_img, const((gc, 3 * gc)),
                 const((win, 2 * gc)), const((win, 2 * gc))]

    scratch = []
    if levels:
        rows0 = win * sf
        for l in range(levels + 1):  # z pyramid (tile geometry)
            scratch.append(pltpu.VMEM(
                (rows0 >> l, wps >> l, gcb * 4 ** l), jnp.float32))
        for l in range(levels + 1):  # g pyramid (block geometry)
            scratch.append(pltpu.VMEM(
                (blk_full >> l, slab >> l, gcb * 4 ** l), jnp.float32))
        wpc = wcs + 2 * halo
        for l in range(levels):  # dz IWT pyramid (tile geometry)
            scratch.append(pltpu.VMEM(
                ((win * 2) << l, (wpc * 2) << l, gc // 4 ** (l + 1)),
                jnp.float32))

    out_shapes = [
        jax.ShapeDtypeStruct((bp, nh, ext, nwb, wps, gcb), x.dtype),
        jax.ShapeDtypeStruct((gc, 3 * gc), jnp.float32),
        jax.ShapeDtypeStruct((win, 2 * gc), jnp.float32),
        jax.ShapeDtypeStruct((win, 2 * gc), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, ext, 1, wps, gcb),
                     lambda b, i, j: (b, i, 0, j, 0, 0),
                     memory_space=pltpu.VMEM),
        const((gc, 3 * gc)), const((win, 2 * gc)), const((win, 2 * gc)),
    ]
    dze, dwp, drhp, drwp = pl.pallas_call(
        kernel,
        grid=(bp, nh, nwb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    # 2-D overlap-add (columns then rows), crop, unpack
    dze = dze.astype(jnp.float32)  # (bp, nh, ext, nwb, wps, gcb)
    mainc = dze[..., :slab, :].reshape(bp, nh, ext, nwb * slab, gcb)
    tailc = jnp.pad(dze[..., slab:, :],
                    ((0, 0), (0, 0), (0, 0), (0, 0),
                     (0, slab - 2 * hs), (0, 0)))
    tailc = tailc.reshape(bp, nh, ext, nwb * slab, gcb)
    acc_c = jnp.pad(mainc, ((0, 0), (0, 0), (0, 0), (0, slab), (0, 0))) \
        + jnp.pad(tailc, ((0, 0), (0, 0), (0, 0), (slab, 0), (0, 0)))

    cw = acc_c.shape[3]
    mainr = acc_c[:, :, :blk_full].reshape(bp, nh * blk_full, cw, gcb)
    tailr = jnp.pad(acc_c[:, :, blk_full:],
                    ((0, 0), (0, 0), (0, blk_full - 2 * hs), (0, 0),
                     (0, 0)))
    tailr = tailr.reshape(bp, nh * blk_full, cw, gcb)
    acc_rows = jnp.pad(mainr, ((0, 0), (0, blk_full), (0, 0), (0, 0))) \
        + jnp.pad(tailr, ((0, 0), (blk_full, 0), (0, 0), (0, 0)))
    dz_packed = acc_rows[:, hs:hs + h, hs:hs + w, :]
    dz = unpack_batch(dz_packed, g, interpret)      # (bsz, h, w, cb) f32

    xf = x.astype(jnp.float32)
    dx = (dz * s.astype(jnp.float32)[:, None, None, :]).astype(x.dtype)
    ds = jnp.sum(dz * xf, axis=(1, 2)).astype(s.dtype)
    dt = jnp.sum(dz, axis=(1, 2)).astype(t.dtype)
    dw, drel_h, drel_w = unpack_weight_grads(dwp, drhp, drwp, cb=cb, g=g,
                                             levels=levels)
    dw_qkv = dw.astype(w_qkv.dtype)
    drel_h = drel_h.astype(rel_h.dtype)
    drel_w = drel_w.astype(rel_w.dtype)
    if has_add:
        dx_add = (r * dz).astype(x_add.dtype)
        return dx, dx_add, ds, dt, dw_qkv, drel_h, drel_w
    return dx, ds, dt, dw_qkv, drel_h, drel_w


def pick_packed_front_tiled(bsz: int, w: int, cb: int, levels: int,
                            block: int = 8, halo: int = 1):
    """(g, sub, slab) for the COLUMN-SLAB packed-front cascade, or None.
    For widths where the full-width packed-front exceeds its VMEM budget
    (x2/x3 L=2 bodies: W=192/128 est 35/23.6M, both observed OOM), run
    the verified kernel per slab with halo*2^L real overlap columns and
    the interior mask offset by the slab's global column."""
    from m2trans_tpu.ops.pallas.device import gate_profile

    budget = gate_profile().get("packed_front_budget", {}).get(levels)
    if not budget or 128 % cb:
        return None
    g = 128 // cb
    sf = 2 ** levels
    blk_full = block * sf
    if g < 2 or bsz % g or w % blk_full:
        return None
    slab = ((w - blk_full) // blk_full) * blk_full  # strictly < w
    while slab >= blk_full and packed_front_vmem_bytes(
            slab, cb, g, block, halo, levels) > budget:
        slab -= blk_full
    if slab < blk_full:
        return None
    return g, (4 if cb * 4 ** levels < 128 else 2), slab


def packed_front_tiled(xp, ap, sp, tp, w_qkv, rel_h, rel_w, *, cb, block,
                       halo, levels, g, sub, slab, r, interpret,
                       precision=None):
    """Column-slab packed-front cascade on a packed input: slice each
    slab with halo*2^L REAL neighbor columns (zero at the frame edges),
    run packed_front_core per slab with the global column offset for the
    interior mask, and concatenate. Exact vs the full-width kernel — the
    halo windows never reach past the overlap (same invariant as the
    tiled cascade kernels)."""
    bp, h, w, gcb = xp.shape
    hs = halo * 2 ** levels
    xe = jnp.pad(xp, ((0, 0), (0, 0), (hs, hs), (0, 0)))
    ae = (jnp.pad(ap, ((0, 0), (0, 0), (hs, hs), (0, 0)))
          if ap is not None else None)
    outs = []
    for j0 in range(0, w, slab):
        sl = min(slab, w - j0)
        xq = xe[:, :, j0:j0 + sl + 2 * hs]
        aq = ae[:, :, j0:j0 + sl + 2 * hs] if ae is not None else None
        outs.append(packed_front_core(
            xq, aq, sp, tp, w_qkv, rel_h, rel_w, cb=cb, block=block,
            halo=halo, levels=levels, g=g, r=r, interpret=interpret,
            sub=sub, precision=precision, col_off=j0, frame_w=w,
            ext_cols=True))
    return jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]


def pick_packed_tiled(bsz: int, w: int, cb: int, levels: int,
                      block: int = 8, halo: int = 1):
    """(g, slab) for the COLUMN-SLAB full-pack cascade, or None. Engages
    where the full-width packed kernel's budget rejects the width —
    slabs of a verified width are both robust AND faster there (the
    W=192 L=1 g=4 full-width kernel measured 16.19M scoped, tipping
    over the 16M ceiling program-dependently)."""
    from m2trans_tpu.ops.pallas.device import gate_profile

    budget = gate_profile().get("packed_budget", {}).get(levels)
    if not budget:
        return None
    c = cb * 4 ** levels
    sf = 2 ** levels
    blk_full = block * sf
    if w % blk_full:
        return None
    for g in (8, 4, 2):
        gc = g * c
        if bsz % g or gc < 128 or gc > 256:
            continue
        slab = ((w - blk_full) // blk_full) * blk_full  # strictly < w
        while slab >= blk_full and packed_vmem_bytes(
                slab, cb, g, block, halo, levels) > budget:
            slab -= blk_full
        if slab >= blk_full:
            return g, slab
    return None


def packed_cascade_tiled(xp, ap, sp, tp, w_qkv, rel_h, rel_w, *, cb,
                         block, halo, levels, g, slab, r, interpret,
                         precision=None):
    """Column-slab full-pack cascade on a packed input (see
    packed_front_tiled — same slicing/mask/concat contract)."""
    bp, h, w, gcb = xp.shape
    hs = halo * 2 ** levels
    xe = jnp.pad(xp, ((0, 0), (0, 0), (hs, hs), (0, 0)))
    ae = (jnp.pad(ap, ((0, 0), (0, 0), (hs, hs), (0, 0)))
          if ap is not None else None)
    outs = []
    for j0 in range(0, w, slab):
        sl = min(slab, w - j0)
        xq = xe[:, :, j0:j0 + sl + 2 * hs]
        aq = ae[:, :, j0:j0 + sl + 2 * hs] if ae is not None else None
        outs.append(packed_cascade_core(
            xq, aq, sp, tp, w_qkv, rel_h, rel_w, cb=cb, block=block,
            halo=halo, levels=levels, g=g, r=r, interpret=interpret,
            precision=precision, col_off=j0, frame_w=w, ext_cols=True))
    return jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]


def packed_cascade_tiled_impl(x, x_add, s, t, w_qkv, rel_h, rel_w, *,
                              block, halo, levels, g, slab, r, interpret,
                              precision=None):
    """Unpacked-tensor entry for the column-slab full-pack cascade (the
    per-branch dispatch path)."""
    bsz = x.shape[0]
    xp = pack_batch(x, g, interpret)
    ap = pack_batch(x_add, g, interpret) if x_add is not None else None
    sp = s.astype(jnp.float32).reshape(bsz // g, g * x.shape[-1])
    tp = t.astype(jnp.float32).reshape(bsz // g, g * x.shape[-1])
    out = packed_cascade_tiled(
        xp, ap, sp, tp, w_qkv, rel_h, rel_w, cb=x.shape[-1], block=block,
        halo=halo, levels=levels, g=g, slab=slab, r=r,
        interpret=interpret, precision=precision)
    return unpack_batch(out, g, interpret)


def packed_front_tiled_impl(x, x_add, s, t, w_qkv, rel_h, rel_w, *,
                            block, halo, levels, g, sub, slab, r,
                            interpret, precision=None):
    """Unpacked-tensor entry for the column-slab packed-front cascade
    (the per-branch dispatch path)."""
    bsz = x.shape[0]
    xp = pack_batch(x, g, interpret)
    ap = pack_batch(x_add, g, interpret) if x_add is not None else None
    sp = s.astype(jnp.float32).reshape(bsz // g, g * x.shape[-1])
    tp = t.astype(jnp.float32).reshape(bsz // g, g * x.shape[-1])
    out = packed_front_tiled(
        xp, ap, sp, tp, w_qkv, rel_h, rel_w, cb=x.shape[-1], block=block,
        halo=halo, levels=levels, g=g, sub=sub, slab=slab, r=r,
        interpret=interpret, precision=precision)
    return unpack_batch(out, g, interpret)


# ---------------------------------------------------------------------------
# Packed-front BACKWARD (round 3, final): the L=2 cascade backward was
# the last 16-lane-occupancy path in training — the tiled backward's
# full-res stages (affine/DWT of z and gout, IWT of dz) run every VPU op
# at 16/128 lanes, the same wall packed-front removed from the forward.
# This kernel runs those stages PACKED on a column-slab grid (4-view
# tiles) and the attention-core adjoint per native-C subgroup (C=256 is
# already lane-healthy); weight/rel grads accumulate NATIVE (the
# projection runs per-subgroup at native C — no packed-weight adjoints).
# ---------------------------------------------------------------------------


def _packed_front_bwd_kernel(*refs, block: int, halo: int, wc: int,
                             levels: int, g: int, sub: int, precision,
                             h: int, w: int, slab: int, r: float,
                             has_add: bool):
    from m2trans_tpu.ops.pallas.halo_attn import _attn_core_adjoint

    if has_add:
        (xaa, xab, xba, xbb, aaa, aab, aba, abb, ga, s_ref, t_ref,
         wqkv_ref, relh_ref, relw_ref,
         dze_ref, dw_ref, drh_ref, drw_ref, *scratch) = refs
    else:
        (xaa, xab, xba, xbb, ga, s_ref, t_ref, wqkv_ref, relh_ref,
         relw_ref, dze_ref, dw_ref, drh_ref, drw_ref, *scratch) = refs
        aaa = aab = aba = abb = None
    sf = 2 ** levels
    ns = 4 ** levels
    hs = halo * sf
    hh = 2 * hs
    win = block + 2 * halo
    wp = wc + 2 * halo
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    gcb = xaa.shape[-1]
    cb = gcb // g
    c = cb * ns

    # scratch layout: z pyramid (1+4+...+4^L), g pyramid (same),
    # image-major staging (z leaf bf16, g leaf f32, dzc store f32). The
    # z pyramid is DEAD once its leaf is staged image-major, and its
    # level-l buffers have exactly the shapes the dz chain needs — the
    # packed datt subbands reuse level L and the IWT ladder reuses
    # levels L-1..0 (both (rows0>>l, wps>>l, gcb) == the dz shapes at
    # that depth).
    pos = 0
    dwt_ls = []
    for l in range(levels + 1):
        dwt_ls.append(scratch[pos:pos + 4 ** l])
        pos += 4 ** l
    g_ls = []
    for l in range(levels + 1):
        g_ls.append(scratch[pos:pos + 4 ** l])
        pos += 4 ** l
    z_img, g_img, datt_img = scratch[pos:pos + 3]
    datt_ls = dwt_ls[levels]
    iwt_dz_ls = [dwt_ls[levels - 1 - l] for l in range(levels)]

    def tile(va, vb, vc, vd):
        top = jnp.concatenate([va[0], vb[0][:, :hh]], axis=1)
        bot = jnp.concatenate([vc[0][:hh], vd[0][:hh, :hh]], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    x = tile(xaa, xab, xba, xbb)
    x_add = tile(aaa, aab, aba, abb)[None] if has_add else None
    sv = s_ref[pl.ds(b, 1), :]
    tv = t_ref[pl.ds(b, 1), :]
    z = _affine_band(x[None], x_add, sv, tv, i=i, h=h, w=w, block=block,
                     halo=halo, levels=levels, r=r,
                     col_off=j * slab)[0]

    def packed_dwt(v0, ls):
        ls[0][0][:] = v0.astype(jnp.float32)
        for l in range(len(ls) - 1):
            for si, src in enumerate(ls[l]):
                a = src[0::2, 0::2, :]
                bb_ = src[1::2, 0::2, :]
                cc = src[0::2, 1::2, :]
                dd = src[1::2, 1::2, :]
                dsts = ls[l + 1][4 * si:4 * si + 4]
                for dst, val in zip(dsts, (
                        (a + bb_ + cc + dd), (-a - bb_ + cc + dd),
                        (-a + bb_ - cc + dd), (a - bb_ - cc + dd))):
                    dst[:] = (val * 0.5).astype(dst.dtype)

    packed_dwt(z, dwt_ls)
    packed_dwt(ga[0].astype(jnp.float32), g_ls)

    relh = relh_ref[:].astype(jnp.float32)
    relw = relw_ref[:].astype(jnp.float32)
    wqkv = wqkv_ref[:]

    def unstack(ls, img):
        # slice the scratch REFS directly (strided f32 lane loads are
        # legal); materializing whole 128-wide values first costs ~1.4M
        chunks = [ls[_rev4(sidx, levels)][:, :, img * cb:(img + 1) * cb]
                  for sidx in range(ns)]
        return jnp.concatenate(chunks, axis=-1)

    # Stage the coarse leaves IMAGE-MAJOR (dim 0 = image): the subgroup
    # walk below then slices images on the SUBLANE-major leading dim with
    # a dynamic pl.ds — legal where dynamic LANE offsets are not — and,
    # crucially, runs as a lax.fori_loop, so only ONE subgroup's
    # attention-adjoint live set exists at a time. The r3-snapshot form
    # unrolled the subgroup loop in Python and Mosaic overlapped every
    # iteration's live set: 22.13M scoped at slab=32 (OOM at any sub;
    # scripts/ab_pf_bwd.py r4 calibration).
    for img in range(g):
        z_img[img, :, :, :] = unstack(dwt_ls[levels],
                                      img).astype(z_img.dtype)
        g_img[img, :, :, :] = unstack(g_ls[levels],
                                      img).astype(g_img.dtype)

    def subgroup_step(it, carry):
        dw_a, drh_a, drw_a = carry
        s0 = it * sub
        zsub = z_img[pl.ds(s0, sub), :, :, :]
        gsub = g_img[pl.ds(s0, sub), :, :, :]
        dzc, dw_c, drh_c, drw_c = _attn_core_adjoint(
            zsub, gsub, wqkv, relh, relw, block=block, halo=halo, wc=wc,
            precision=precision)
        datt_img[pl.ds(s0, sub), :, :, :] = dzc.astype(datt_img.dtype)
        return dw_a + dw_c, drh_a + drh_c, drw_a + drw_c

    dw_acc, drh_acc, drw_acc = jax.lax.fori_loop(
        0, g // sub, subgroup_step,
        (jnp.zeros((c, 3 * c), jnp.float32),
         jnp.zeros((block + 2 * halo, c // 2), jnp.float32),
         jnp.zeros((block + 2 * halo, c // 2), jnp.float32)))

    # restack per-image datt chunks into the packed dz subbands (static
    # lane slices only — outside the dynamic loop)
    for img in range(g):
        for sidx in range(ns):
            datt_ls[_rev4(sidx, levels)][:, :, img * cb:(img + 1) * cb] \
                = datt_img[img, :, :, sidx * cb:(sidx + 1) * cb]

    # packed IWT of the dz subbands (adjoint of the orthonormal DWT)
    cur = datt_ls
    for l in range(levels):
        nxt = iwt_dz_ls[l]
        for di, dst in enumerate(nxt):
            ll = cur[4 * di][:].astype(jnp.float32)
            hl = cur[4 * di + 1][:].astype(jnp.float32)
            lh = cur[4 * di + 2][:].astype(jnp.float32)
            hh_ = cur[4 * di + 3][:].astype(jnp.float32)
            dst[0::2, 0::2, :] = (ll - hl - lh + hh_) * 0.5
            dst[0::2, 1::2, :] = (ll + hl - lh - hh_) * 0.5
            dst[1::2, 0::2, :] = (ll - hl + lh - hh_) * 0.5
            dst[1::2, 1::2, :] = (ll + hl + lh + hh_) * 0.5
        cur = nxt

    g_pad = jnp.pad(ga[0].astype(jnp.float32),
                    ((hs, hs), (hs, hs), (0, 0)))
    dz = cur[0][:] + g_pad

    dze_ref[0, 0, :, 0] = dz.astype(dze_ref.dtype)
    first = (b == 0) & (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        dw_ref[:] = dw_acc.astype(dw_ref.dtype)
        drh_ref[:] = drh_acc.astype(drh_ref.dtype)
        drw_ref[:] = drw_acc.astype(drw_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[:] = dw_ref[:] + dw_acc.astype(dw_ref.dtype)
        drh_ref[:] = drh_ref[:] + drh_acc.astype(drh_ref.dtype)
        drw_ref[:] = drw_ref[:] + drw_acc.astype(drw_ref.dtype)


def packed_front_bwd_vmem_bytes(slab, cb, g, block, halo, levels,
                                sub=None):
    """Estimate for the packed-front backward kernel at slab width.

    r4: counts the image-major staging buffers AND one subgroup's
    attention-adjoint live set (the fori walk holds exactly one at a
    time; ~14 c-wide f32 (sub, win, wp) tensors live through the
    reverse chain: qkv 3c, kv windows 2c, kb c, vb c, dkv 2c, dqkv 3c,
    dq c, dzc c). The r3-snapshot estimator omitted the adjoint
    entirely and under-read the real footprint 2x (22.13M measured vs
    10.9M estimated at slab=32 sub=4 — scripts/ab_pf_bwd.py)."""
    if sub is None:
        sub = min(4, g)
    sf = 2 ** levels
    win = block + 2 * halo
    gcb = g * cb
    rows0 = win * sf
    blk_full = block * sf
    hs = halo * sf
    wps = slab + 2 * hs
    wc = slab // sf
    c = cb * 4 ** levels
    wpc = wc + 2 * halo
    total = 2 * 2 * 4 * blk_full * slab * _lanes(gcb)   # 4 views, dbl-buf
    total += 2 * 2 * blk_full * slab * _lanes(gcb)      # ga block
    total += 2 * 2 * (blk_full + 2 * hs) * wps * _lanes(gcb)  # dze out
    total += 4 * rows0 * wps * _lanes(gcb)              # z f32
    for l in range(levels + 1):                         # z pyramid
        total += 4 * (rows0 >> l) * (wps >> l) * _lanes(gcb * 4 ** l)
    for l in range(levels + 1):                         # g pyramid
        total += 4 * (blk_full >> l) * (slab >> l) * _lanes(gcb * 4 ** l)
    # (the packed datt subbands and the dz IWT ladder REUSE the dead
    # z-pyramid refs — no extra scratch terms for them)
    total += g * win * wpc * _lanes(c) * (2 + 4)        # z_img/datt_img
    total += g * block * wc * _lanes(c) * 4             # g_img
    total += sub * win * wpc * _lanes(c) * 4 * 14       # adjoint live
    total += 4 * c * 3 * c                              # dW carry
    return total


def pick_packed_front_bwd(bsz: int, w: int, cb: int, levels: int,
                          block: int = 8, halo: int = 1):
    """(g, sub, slab) for the packed-front backward, or None."""
    from m2trans_tpu.ops.pallas.device import gate_profile

    budget = gate_profile().get("bwd_pf_budget", {}).get(levels)
    if not budget or 128 % cb:
        return None
    g = 128 // cb
    sf = 2 ** levels
    blk_full = block * sf
    if g < 2 or bsz % g or w % blk_full:
        return None
    # prefer the widest slab, then the largest subgroup that fits: a
    # wider slab amortizes the packed full-res stages over more columns
    # (the kernel's whole point); sub only sizes the per-iteration
    # attention-adjoint live set inside the fori walk
    best = None
    sl = blk_full
    while sl <= w:
        for sub in (4, 2, 1):
            if sub > g or g % sub:
                continue
            if packed_front_bwd_vmem_bytes(sl, cb, g, block, halo,
                                           levels, sub) <= budget:
                best = (g, sub, sl)
                break
        sl += blk_full
    return best


def packed_front_bwd_impl(x, x_add, s, t, w_qkv, rel_h, rel_w, gout, *,
                          block, halo, levels, g, sub, slab, r,
                          interpret, precision=None):
    """Packed-front backward for the fused cascade branch: same grads as
    halo_attn._cascade_bwd_impl, with the full-res stages packed and the
    attention adjoint per native-C subgroup."""
    bsz, h, w, cb = x.shape
    sf = 2 ** levels
    ns = 4 ** levels
    c = cb * ns
    win = block + 2 * halo
    gcb = g * cb
    blk_full = block * sf
    hs = halo * sf
    ext = blk_full + 2 * hs
    wcs = slab // sf
    wps = slab + 2 * hs
    nwb = -(-w // slab)
    nh = h // blk_full
    has_add = x_add is not None
    bp = bsz // g

    xp = pack_batch(x, g, interpret)
    ap = pack_batch(x_add, g, interpret) if has_add else None
    ga = pack_batch(gout, g, interpret)
    ga = jnp.pad(ga, ((0, 0), (0, 0), (0, nwb * slab - w), (0, 0)))
    sp = s.astype(jnp.float32).reshape(bp, gcb)
    tp = t.astype(jnp.float32).reshape(bp, gcb)

    pad_bottom = (nh + 1) * blk_full - h - hs
    pad_right = (nwb + 1) * slab - w - hs
    pads = ((0, 0), (hs, pad_bottom), (hs, pad_right), (0, 0))
    xpp = jnp.pad(xp, pads)

    kernel = functools.partial(_packed_front_bwd_kernel, block=block,
                               halo=halo, wc=wcs, levels=levels, g=g,
                               sub=sub, precision=precision, h=h, w=w,
                               slab=slab, r=float(r), has_add=has_add)
    view = lambda oi, oj: pl.BlockSpec(  # noqa: E731
        (1, blk_full, slab, gcb),
        lambda b, i, j, a=oi, d=oj: (b, i + a, j + d, 0),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i, j: tuple(0 for _ in shp),
        memory_space=pltpu.VMEM)
    per_img = pl.BlockSpec((bp, gcb), lambda b, i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    operands = [xpp, xpp, xpp, xpp]
    in_specs = [view(0, 0), view(0, 1), view(1, 0), view(1, 1)]
    if has_add:
        app = jnp.pad(ap, pads)
        operands += [app, app, app, app]
        in_specs += [view(0, 0), view(0, 1), view(1, 0), view(1, 1)]
    operands += [ga]
    in_specs += [pl.BlockSpec((1, blk_full, slab, gcb),
                              lambda b, i, j: (b, i, j, 0),
                              memory_space=pltpu.VMEM)]
    operands += [sp, tp,
                 w_qkv.astype(x.dtype),
                 rel_h.astype(jnp.float32), rel_w.astype(jnp.float32)]
    in_specs += [per_img, per_img, const((c, 3 * c)),
                 const((win, c // 2)), const((win, c // 2))]

    rows0 = win * sf
    scratch = []
    # all pyramid/datt scratch stays f32: the unstack/restack slice refs
    # at cb=16-lane offsets, and sub-128-lane bf16 ref access is the
    # known Mosaic hazard (32-bit-only strided rule)
    for l in range(levels + 1):  # z pyramid
        scratch += [pltpu.VMEM(((rows0 >> l), (wps >> l), gcb),
                               jnp.float32)] * (4 ** l)
    for l in range(levels + 1):  # g pyramid
        scratch += [pltpu.VMEM(((blk_full >> l), (slab >> l), gcb),
                               jnp.float32)] * (4 ** l)
    wpc = wcs + 2 * halo
    # image-major leaf staging (the fori subgroup walk slices dim 0 —
    # see the kernel; the dz chain reuses the dead z-pyramid refs)
    scratch += [pltpu.VMEM((g, win, wpc, c), x.dtype),        # z_img
                pltpu.VMEM((g, block, wcs, c), jnp.float32),  # g_img
                pltpu.VMEM((g, win, wpc, c), jnp.float32)]    # datt_img

    out_shapes = [
        jax.ShapeDtypeStruct((bp, nh, ext, nwb, wps, gcb), x.dtype),
        jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
        jax.ShapeDtypeStruct((win, c // 2), jnp.float32),
        jax.ShapeDtypeStruct((win, c // 2), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, ext, 1, wps, gcb),
                     lambda b, i, j: (b, i, 0, j, 0, 0),
                     memory_space=pltpu.VMEM),
        const((c, 3 * c)), const((win, c // 2)), const((win, c // 2)),
    ]
    dze, dw, drh, drw = pl.pallas_call(
        kernel,
        grid=(bp, nh, nwb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    # 2-D overlap-add (columns then rows), crop, unpack
    dze = dze.astype(jnp.float32)  # (bp, nh, ext, nwb, wps, gcb)
    mainc = dze[..., :slab, :].reshape(bp, nh, ext, nwb * slab, gcb)
    tailc = jnp.pad(dze[..., slab:, :],
                    ((0, 0), (0, 0), (0, 0), (0, 0),
                     (0, slab - 2 * hs), (0, 0)))
    tailc = tailc.reshape(bp, nh, ext, nwb * slab, gcb)
    acc_c = jnp.pad(mainc, ((0, 0), (0, 0), (0, 0), (0, slab), (0, 0))) \
        + jnp.pad(tailc, ((0, 0), (0, 0), (0, 0), (slab, 0), (0, 0)))

    cw = acc_c.shape[3]
    mainr = acc_c[:, :, :blk_full].reshape(bp, nh * blk_full, cw, gcb)
    tailr = jnp.pad(acc_c[:, :, blk_full:],
                    ((0, 0), (0, 0), (0, blk_full - 2 * hs), (0, 0),
                     (0, 0)))
    tailr = tailr.reshape(bp, nh * blk_full, cw, gcb)
    acc_rows = jnp.pad(mainr, ((0, 0), (0, blk_full), (0, 0), (0, 0))) \
        + jnp.pad(tailr, ((0, 0), (blk_full, 0), (0, 0), (0, 0)))
    dz_packed = acc_rows[:, hs:hs + h, hs:hs + w, :]
    dz = unpack_batch(dz_packed, g, interpret)      # (bsz, h, w, cb) f32

    xf = x.astype(jnp.float32)
    dx = (dz * s.astype(jnp.float32)[:, None, None, :]).astype(x.dtype)
    ds = jnp.sum(dz * xf, axis=(1, 2)).astype(s.dtype)
    dt = jnp.sum(dz, axis=(1, 2)).astype(t.dtype)
    dw_qkv = dw.astype(w_qkv.dtype)
    drel_h = drh.astype(rel_h.dtype)
    drel_w = drw.astype(rel_w.dtype)
    if has_add:
        dx_add = (r * dz).astype(x_add.dtype)
        return dx, dx_add, ds, dt, dw_qkv, drel_h, drel_w
    return dx, ds, dt, dw_qkv, drel_h, drel_w
