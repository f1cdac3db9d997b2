"""Fused wavelet-branch halo attention — Pallas TPU kernel.

Computes one full CFTM branch in a single kernel:

    out = IWT^L( softmax( (z W_q)(z W_k + rel)^T / sqrt(C) ) (z W_v) ),
    z = DWT^L(x)

for L in {0, 1, 2} Haar levels (the reference's branch pyramid,
models/M2Trans_network.py:139-161), with the attention semantics of TBlock
(:290-340): non-overlapping 8x8 query blocks against their zero-padded
10x10 neighborhoods, single head, decomposed rel-pos added to keys.

Why a kernel: the XLA path materializes, per branch, the DWT output, the
3C qkv tensor, the win^2/block^2-duplicated unfold patches, the f32
attention logits, and the IWT input — all HBM round-trips. Here each grid
step loads one full-resolution row band into VMEM, runs DWT (strided
reshape adds, VPU), the qkv projections (MXU), per-block attention
(MXU + VPU softmax), IWT, and writes only the full-res output band:
HBM traffic = read x once + write out once.

Grid: (B, H_coarse/8). Bands overlap by 2*halo coarse rows = 2*halo*2^L
full-res rows; a single blocked BlockSpec cannot express overlap, so the
(zero-padded, extended) input is passed through TWO blocked views — band
i = all of full-res row block i (8*2^L rows) plus the first 2*halo*2^L
rows of block i+1 — which the Pallas pipeline prefetches like any other
blocked input.

Backward: jax.custom_vjp whose bwd is ALSO a Pallas kernel
(_cascade_bwd_kernel) — in-VMEM forward recompute + reverse chain; the
XLA composition remains as the over-VMEM fallback and the reference for
the gradient parity tests. Numerical parity with the XLA path is tested
in interpret mode on CPU and compiled on real TPU. bf16 is the intended
dtype (HIGHEST-precision multi-pass matmuls stall the remote Mosaic
compiler; f32 parity eval uses the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m2trans_tpu.ops.halo_attention import halo_attention
from m2trans_tpu.ops.wavelet import haar_dwt, haar_iwt


def _affine_band(x, x_add, s, t, *, i, h, w, block, halo, levels, r,
                 col_off=0):
    """In-band input transform for the fused CFTM cascade:
    z = (x*s + t)*interior_mask + r*x_add — folds the instance-norm apply
    (s = inv_std, t = -mean*inv_std, per image x channel) and the cascade
    average into the kernel; the mask re-zeroes the halo padding that the
    affine shift would otherwise pollute (the reference's unfold/conv see
    zeros beyond the frame). ``col_off``: global full-res column of the
    band's first (pre-halo) column, for column-slab tiled grids."""
    sfull = 2 ** levels
    zf = x.astype(jnp.float32) * s[:, None, None, :] + t[:, None, None, :]
    rows, wp = x.shape[1], x.shape[2]
    grow = (jax.lax.broadcasted_iota(jnp.int32, (1, rows, 1, 1), 1)
            + i * block * sfull - halo * sfull)
    gcol = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, wp, 1), 2)
            + col_off - halo * sfull)
    mask = ((grow >= 0) & (grow < h) & (gcol >= 0) & (gcol < w))
    zf = jnp.where(mask, zf, 0.0)
    if x_add is not None:
        zf = zf + r * x_add.astype(jnp.float32)
    return zf.astype(x.dtype)


def _band_body(z, scratch, wq_ref, wk_ref, wv_ref, relh_ref, relw_ref, *,
               block: int, halo: int, wc: int, levels: int, precision):
    """Process a group of overlapping full-res bands: DWT^L -> qkv ->
    per-block attention -> IWT^L. ``z``: (G, win*2^L, Wp_full, Cb) band
    values (bf16), one per batch image in the group — folding G images
    into one program amortizes Mosaic op-issue latency over G-wide ops
    (the per-band op stream, not FLOPs, bounds the small-channel
    branches). Returns the (G, block*2^L, W_full, Cb) output bands (f32).

    scratch: f32 VMEM buffers for the wavelet levels — Mosaic only supports
    strided ref loads/stores on 32-bit data, so each DWT level
    strided-reads quads from an f32 scratch and each IWT level
    strided-writes into one.
    """
    g = z.shape[0]
    win = block + 2 * halo
    wp = wc + 2 * halo  # coarse padded width
    nw = wc // block
    dwt_bufs = scratch[:levels + 1] if levels else []
    iwt_bufs = scratch[levels + 1:] if levels else []

    if levels:
        dwt_bufs[0][:] = z.astype(jnp.float32)
        for l in range(levels):
            src, dst = dwt_bufs[l], dwt_bufs[l + 1]
            a = src[:, 0::2, 0::2, :]
            b = src[:, 1::2, 0::2, :]
            cc = src[:, 0::2, 1::2, :]
            d = src[:, 1::2, 1::2, :]
            dst[:] = jnp.concatenate(
                [(a + b + cc + d), (-a - b + cc + d), (-a + b - cc + d),
                 (a - b - cc + d)], axis=-1) * 0.5
        z = dwt_bufs[levels][:].astype(z.dtype)

    c = z.shape[-1]  # coarse channels
    c2 = c // 2
    zf = z.reshape(g * win * wp, c)

    # ONE fused qkv projection: three separate (.., c)@(c, c) dots cost
    # 3x the M-passes at the same K; measured 0.23 -> ~0.08 ms/call for
    # branch1 (scripts/dissect_branch.py ablation)
    wqkv = jnp.concatenate([wq_ref[:], wk_ref[:], wv_ref[:]], axis=1)
    qkv = jnp.dot(zf, wqkv, preferred_element_type=jnp.float32,
                  precision=precision).reshape(g, win, wp, 3 * c)
    q_full = qkv[:, halo:halo + block, halo:halo + wc, :c] * (c ** -0.5)
    # kv kept fused: one window-patch pass serves both k and v
    relh = relh_ref[:].astype(jnp.float32)
    relw = relw_ref[:].astype(jnp.float32)
    kv_full = jnp.concatenate(
        [qkv[..., c:c + c2] + relh[None, :, None, :], qkv[..., c + c2:]],
        axis=-1)

    if _use_batched_blocks(c, nw) or g > 1:
        out = _attend_batched(q_full, kv_full, relw, block=block,
                              halo=halo, wc=wc, precision=precision)
    else:
        out = _attend_serial(q_full[0], kv_full[0, ..., :c],
                             kv_full[0, ..., c:], relw,
                             block=block, halo=halo, wc=wc,
                             precision=precision)[None]
    # synthesis: per level, split subbands and strided-write the pixel quad
    # into the next (f32) buffer
    for l in range(levels):
        dst = iwt_bufs[l]
        ll, hl, lh, hh = jnp.split(out, 4, axis=-1)
        dst[:, 0::2, 0::2, :] = (ll - hl - lh + hh) * 0.5
        dst[:, 0::2, 1::2, :] = (ll + hl - lh - hh) * 0.5
        dst[:, 1::2, 0::2, :] = (ll - hl + lh - hh) * 0.5
        dst[:, 1::2, 1::2, :] = (ll + hl + lh + hh) * 0.5
        out = dst[:]
    return out


def _use_batched_blocks(c: int, nw: int) -> bool:
    """Pick the per-band attention schedule. The serial per-block loop is a
    latency chain (qk matmul -> softmax -> av matmul per block, ~0.5 us per
    8x8 block on v5e); the batched schedule issues ALL qk matmuls, then one
    wide softmax, then all av matmuls, so independent blocks pipeline on
    the MXU instead of waiting on the VPU. Patch tensors are built with
    aligned+overflow strided slicing (cheap VPU copies) — NOT the
    gather-as-matmul trick, which was measured slower (NOTES_ROUND2.md)."""
    if _FORCE_SCHEDULE is not None:
        return _FORCE_SCHEDULE == "batched"
    return nw > 1


# A/B timing hook: None | "serial" | "batched" (env M2T_ATTN_SCHEDULE)
import os as _os  # noqa: E402

_FORCE_SCHEDULE = _os.environ.get("M2T_ATTN_SCHEDULE") or None

# Pallas backward kernels for the fused cascade (in-VMEM recompute +
# reverse chain); disable with M2T_PALLAS_BWD=0 to fall back to the XLA
# vjp of the composition.
_PALLAS_BWD = _os.environ.get("M2T_PALLAS_BWD", "1") != "0"

# AD-context forward dispatch: True (default) keeps the custom_vjp fwd
# rule off the full-width packed-front kernels (scoped-VMEM-marginal in
# grad programs, r3). The COLUMN-SLAB variants (packed_front_tiled) were
# re-budgeted robust in any program; False lets the AD forward use them
# too — flip for within-process A/Bs (scripts/ab_ad_fwd.py).
_AD_CONSERVATIVE = _os.environ.get("M2T_AD_CONSERVATIVE", "1") != "0"


def _attend_serial(q_full, k_full, v_full, relw, *, block, halo, wc,
                   precision):
    """One dependency chain per width block (original schedule)."""
    win = block + 2 * halo
    c = q_full.shape[-1]
    c2 = c // 2
    outs = []
    for j in range(wc // block):  # static unroll over width blocks
        q = q_full[:, j * block:(j + 1) * block, :].reshape(
            block * block, c)
        k = k_full[:, j * block:j * block + win, :]
        k = jnp.concatenate(
            [k[:, :, :c2], k[:, :, c2:] + relw[None, :, :]], axis=-1)
        k = k.reshape(win * win, c)
        v = v_full[:, j * block:j * block + win, :].reshape(win * win, c)

        sim = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(attn, v, preferred_element_type=jnp.float32,
                    precision=precision)
        outs.append(o.reshape(block, block, c))

    return jnp.concatenate(outs, axis=1)  # (block, wc, C) coarse band


def _window_patches(a, *, block, halo, wc):
    """(G, win, wp, c) bands -> (G, nw, win, win, c) per-block haloed
    windows via one aligned and one block-shifted strided view (window = a
    block plus 2*halo overflow columns; zero-pad keeps the shifted view in
    range)."""
    g, win = a.shape[0], a.shape[1]
    nw = wc // block
    wp = a.shape[2]
    a = jnp.pad(a, ((0, 0), (0, 0), (0, (nw + 1) * block - wp), (0, 0)))
    c = a.shape[-1]
    aligned = a[:, :, :nw * block].reshape(g, win, nw, block, c)
    shifted = a[:, :, block:(nw + 1) * block].reshape(g, win, nw, block, c)
    pat = jnp.concatenate([aligned, shifted[:, :, :, :2 * halo]], axis=3)
    return pat.transpose(0, 2, 1, 3, 4)  # (G, nw, win, win, c)


def _attend_batched(q_full, kv_full, relw, *, block, halo, wc,
                    precision):
    """All-blocks-at-once schedule over the whole group: one window-patch
    pass on the fused kv tensor, batched qk dot -> one wide softmax ->
    batched av dot (dot batch = G*nw)."""
    win = block + 2 * halo
    g, c = q_full.shape[0], q_full.shape[-1]
    c2 = c // 2
    nw = wc // block

    kvb = _window_patches(kv_full, block=block, halo=halo, wc=wc)
    kb = jnp.concatenate(
        [kvb[..., :c2], kvb[..., c2:c] + relw[None, None, None]],
        axis=-1).reshape(g * nw, win * win, c)
    vb = kvb[..., c:].reshape(g * nw, win * win, c)
    qb = q_full.reshape(g, block, nw, block, c).transpose(0, 2, 1, 3, 4)
    qb = qb.reshape(g * nw, block * block, c)

    sim = jax.lax.dot_general(
        qb, kb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    e = jnp.exp(sim)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        attn, vb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    o = o.reshape(g, nw, block, block, c).transpose(0, 2, 1, 3, 4)
    return o.reshape(g, block, wc, c)


def _kernel(xa_ref, xb_ref, wq_ref, wk_ref, wv_ref, relh_ref, relw_ref,
            out_ref, *scratch, block: int, halo: int, wc: int, levels: int,
            precision):
    """Banded variant: one (batch-group, coarse-row-band) grid step; each
    group's overlapping band is assembled from two blocked views (used for
    frames too large to keep resident in VMEM)."""
    s = 2 ** levels
    z = jnp.concatenate([xa_ref[:], xb_ref[:, : 2 * halo * s]], axis=1)
    out = _band_body(z, scratch, wq_ref, wk_ref, wv_ref, relh_ref, relw_ref,
                     block=block, halo=halo, wc=wc, levels=levels,
                     precision=precision)
    out_ref[:] = out.astype(out_ref.dtype)


def _cascade_kernel(*refs, block: int, halo: int, wc: int, levels: int,
                    precision, h: int, w: int, r: float, has_add: bool):
    """Banded variant with the CFTM glue folded in: affine (IN-apply) +
    masked zero-pad + optional cascade add on the way in, residual add on
    the way out. out = attn(z) + z, z = (x*s + t)*mask + r*x_add."""
    if has_add:
        (xa, xb, aa, ab, s_ref, t_ref, wq_ref, wk_ref, wv_ref, relh_ref,
         relw_ref, out_ref, *scratch) = refs
    else:
        (xa, xb, s_ref, t_ref, wq_ref, wk_ref, wv_ref, relh_ref,
         relw_ref, out_ref, *scratch) = refs
        aa = ab = None
    s = 2 ** levels
    b = pl.program_id(0)
    i = pl.program_id(1)
    x = jnp.concatenate([xa[:], xb[:, : 2 * halo * s]], axis=1)
    gb = x.shape[0]
    x_add = None
    if has_add:
        x_add = jnp.concatenate([aa[:], ab[:, : 2 * halo * s]], axis=1)
    sv = s_ref[pl.ds(b * gb, gb), :]
    tv = t_ref[pl.ds(b * gb, gb), :]
    z = _affine_band(x, x_add, sv, tv, i=i, h=h, w=w,
                     block=block, halo=halo, levels=levels, r=r)
    out = _band_body(z, scratch, wq_ref, wk_ref, wv_ref, relh_ref, relw_ref,
                     block=block, halo=halo, wc=wc, levels=levels,
                     precision=precision)
    blk_full = block * s
    res = z[:, halo * s: halo * s + blk_full, halo * s: halo * s + w, :]
    out_ref[:] = (out + res.astype(jnp.float32)).astype(out_ref.dtype)


def _tile_kernel(xaa_ref, xab_ref, xba_ref, xbb_ref, wq_ref, wk_ref, wv_ref,
                 relh_ref, relw_ref, out_ref, *scratch, block: int,
                 halo: int, wc: int, levels: int, precision):
    """Width-blocked banded variant: one (batch, row-band, col-slab) grid
    step for frames too wide for a full-width band to fit VMEM. The
    overlapping (rows+2*halo*s) x (slab+2*halo*s) tile is assembled from
    FOUR blocked views (row blocks i, i+1  x  col slabs j, j+1)."""
    s = 2 ** levels
    hh = 2 * halo * s
    top = jnp.concatenate([xaa_ref[0], xab_ref[0, :, :hh]], axis=1)
    bot = jnp.concatenate([xba_ref[0, :hh], xbb_ref[0, :hh, :hh]], axis=1)
    z = jnp.concatenate([top, bot], axis=0)
    out = _band_body(z[None], scratch, wq_ref, wk_ref, wv_ref, relh_ref,
                     relw_ref, block=block, halo=halo, wc=wc, levels=levels,
                     precision=precision)
    out_ref[0] = out[0].astype(out_ref.dtype)


def _multiband_kernel(x_ref, wq_ref, wk_ref, wv_ref, relh_ref, relw_ref,
                      out_ref, *scratch, block: int, halo: int, wc: int,
                      nh: int, levels: int, precision):
    """Whole-image variant: one batch element per program (grid (B,)), the
    padded image resident in VMEM, with a static loop over row bands.
    ~nh x fewer program launches than the banded grid — the forward at
    small frame sizes is launch-overhead-bound, not HBM-bound."""
    s = 2 ** levels
    band_rows = (block + 2 * halo) * s
    step_rows = block * s
    for i in range(nh):
        z = x_ref[0, i * step_rows: i * step_rows + band_rows]
        out = _band_body(z[None], scratch, wq_ref, wk_ref, wv_ref, relh_ref,
                         relw_ref, block=block, halo=halo, wc=wc,
                         levels=levels, precision=precision)
        out_ref[0, i * step_rows: (i + 1) * step_rows] = out[0].astype(
            out_ref.dtype)


def _branch_scratch_shapes(wp_full, wc, cb, c, block, halo, levels, g=1):
    """Per-band-group f32 wavelet scratch buffers (shared across steps)."""
    shapes = []
    if levels:
        rows0 = (block + 2 * halo) * 2 ** levels
        for l in range(levels + 1):
            shapes.append(pltpu.VMEM(
                (g, rows0 >> l, wp_full >> l, cb * 4 ** l), jnp.float32))
        for l in range(levels):
            shapes.append(pltpu.VMEM(
                (g, block << (l + 1), wc << (l + 1), c // 4 ** (l + 1)),
                jnp.float32))
    return shapes


def _lanes(c):
    return max(c, 128)


def _whole_image_vmem_bytes(h, w, cb, c, block, halo, levels):
    """Lane-padding-aware VMEM footprint estimate for the whole-image
    kernel (one batch element): in/out images (bf16) + band scratches +
    slack for band-sized values."""
    s = 2 ** levels
    hp, wp = h + 2 * halo * s, w + 2 * halo * s
    total = 2 * hp * wp * _lanes(cb)  # input image bf16
    total += 2 * h * w * _lanes(cb)  # output image bf16
    rows0 = (block + 2 * halo) * s
    for l in range(levels + 1):
        total += 4 * (rows0 >> l) * (wp >> l) * _lanes(cb * 4 ** l)
    for l in range(levels):
        total += 4 * (block << (l + 1)) * ((w // s) << (l + 1)) * _lanes(
            c // 4 ** (l + 1))
    # band-sized live values (k/v/q bands, logits) — generous slack
    total += 4 * 4 * (block + 2 * halo) * (w // s + 2 * halo) * _lanes(c)
    return total


# Disabled by default: measured on v5e, the whole-image variant runs at the
# same speed as the banded grid (the forward is bound by the serial
# per-block matmul chains inside each band, not by program launches) while
# costing ~30x more compile time from the static band unroll. Kept as a
# tuning knob for future shapes.
_WHOLE_IMAGE_VMEM_LIMIT = 0


def _halo_attention_whole_impl(x, w_qkv, rel_h, rel_w, *, block, halo,
                               levels, interpret, precision=None):
    bsz, h, w, cb = x.shape
    s = 2 ** levels
    c = cb * (4 ** levels)
    win = block + 2 * halo
    wc = w // s
    nh = h // (block * s)
    wq, wk, wv = (w_qkv[:, :c], w_qkv[:, c:2 * c], w_qkv[:, 2 * c:])

    xp = jnp.pad(x, ((0, 0), (halo * s, halo * s), (halo * s, halo * s),
                     (0, 0)))
    hp_full, wp_full = h + 2 * halo * s, w + 2 * halo * s

    kernel = functools.partial(_multiband_kernel, block=block, halo=halo,
                               wc=wc, nh=nh, levels=levels,
                               precision=precision)
    nw = wc // block
    flops = bsz * nh * (
        2 * win * (wc + 2 * halo) * c * 2 * c
        + 2 * block * wc * c * c
        + nw * (2 * block * block * win * win * c * 2))
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hp_full, wp_full, cb), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const((c, c)),
            const((c, c)),
            const((c, c)),
            const((win, c // 2)),
            const((win, c // 2)),
        ],
        out_specs=pl.BlockSpec((1, h, w, cb), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cb), x.dtype),
        scratch_shapes=_branch_scratch_shapes(wp_full, wc, cb, c, block,
                                              halo, levels),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=int(2 * x.size * x.dtype.itemsize),
            transcendentals=int(bsz * h * w * win * win)),
        interpret=interpret,
    )(xp, wq, wk, wv, rel_h, rel_w)


def _banded_vmem_bytes(w, cb, c, block, halo, levels, g=1):
    """Lane-padding-aware per-band VMEM estimate for the banded kernel
    (input/output double-buffered blocks + the f32 wavelet scratches +
    slack for live band values), for a batch group of ``g`` images per
    program. Everything scales linearly with W (and ~linearly with g)."""
    s = 2 ** levels
    win = block + 2 * halo
    wp_full = w + 2 * halo * s
    blk_full = block * s
    rows0 = win * s
    wc = w // s
    nw = wc // block
    total = g * 2 * 2 * 2 * blk_full * wp_full * _lanes(cb)  # 2 views x 2 bufs
    total += g * 2 * 2 * blk_full * w * _lanes(cb)  # out block, 2 bufs
    for l in range(levels + 1):
        total += g * 4 * (rows0 >> l) * (wp_full >> l) * _lanes(cb * 4 ** l)
    for l in range(levels):
        total += g * 4 * (block << (l + 1)) * (wc << (l + 1)) * _lanes(
            c // 4 ** (l + 1))
    # live values: k/v/q bands (f32 accum) + per-block logits
    total += g * 4 * 4 * win * (wc + 2 * halo) * _lanes(c)
    # batched-schedule patch tensors (k/v windows, q blocks, f32) + logits
    total += g * nw * 4 * (2 * win * win + block * block) * _lanes(c)
    total += g * nw * 4 * 2 * block * block * _lanes(win * win)
    return total


# Gate calibrated against observed failures AND per-level wins: W=256/L=2
# OOM'd the 16 MB VMEM (estimate 28.2M, actual 16.22M) and W=512/L=0
# OOM'd with an ~17M estimate — the estimator's overshoot varies by
# level, so the gate is per-level. L=1 allows W=192 (est 13.3M): the
# banded kernel measured 2x faster than the XLA composition there
# (5.05 vs 10.33 ms/call; relevant for the x2 model whose body runs at
# 192^2), while L=0/W=192 and L=2/W=128 measured SLOWER than XLA and
# L=2/W=192 fails to compile. Beyond the gate, fall back to the XLA
# composition (correct, slower) — genuinely large frames should use
# spatial sharding, which splits H (NOTES_ROUND3.md item 3).
# The limits live in the device-keyed calibration table (device.py):
# uncalibrated TPU generations get shrunk budgets and degrade to XLA.


def _banded_limit(levels: int) -> int:
    from m2trans_tpu.ops.pallas.device import gate_profile

    prof = gate_profile()
    return prof["banded_limits"].get(levels, prof["banded_limit_default"])


def _halo_attention_pallas_fwd_impl(x, w_qkv, rel_h, rel_w, *, block, halo,
                                    levels, interpret, precision=None):
    bsz, h, w, cb = x.shape
    c = cb * (4 ** levels)
    if (_whole_image_vmem_bytes(h, w, cb, c, block, halo, levels)
            < _WHOLE_IMAGE_VMEM_LIMIT):
        return _halo_attention_whole_impl(
            x, w_qkv, rel_h, rel_w, block=block, halo=halo, levels=levels,
            interpret=interpret, precision=precision)
    if _banded_vmem_bytes(w, cb, c, block, halo,
                          levels) > _banded_limit(levels):
        # The r1 "tiled slower than XLA" verdict predates the batched
        # schedule + fused qkv; with them the tiled CASCADE wins 4-10x
        # at every measured wide shape, so the plain path follows the
        # same per-level calibration flag.
        from m2trans_tpu.ops.pallas.device import gate_profile

        blk_full = block * 2 ** levels
        if (levels in gate_profile().get("tiled_levels", ())
                and w > blk_full
                and _banded_vmem_bytes(blk_full, cb, c, block, halo,
                                       levels) <= _banded_limit(levels)):
            return _halo_attention_tiled_impl(
                x, w_qkv, rel_h, rel_w, block=block, halo=halo,
                levels=levels, interpret=interpret, precision=precision)
        return _xla_reference(x, w_qkv, rel_h, rel_w, block=block, halo=halo,
                              levels=levels, precision=precision)
    return _halo_attention_banded_impl(
        x, w_qkv, rel_h, rel_w, block=block, halo=halo, levels=levels,
        interpret=interpret, precision=precision)


def _halo_attention_tiled_impl(x, w_qkv, rel_h, rel_w, *, block, halo,
                               levels, interpret, precision=None):
    """Width-blocked fused path for wide frames: grid (B, nh, n_slabs)."""
    bsz, h, w, cb = x.shape
    s = 2 ** levels
    c = cb * (4 ** levels)
    win = block + 2 * halo
    blk_full = block * s
    wq, wk, wv = (w_qkv[:, :c], w_qkv[:, c:2 * c], w_qkv[:, 2 * c:])

    # largest slab (multiple of the full-res block unit) whose band fits,
    # counting all FOUR double-buffered views (see _cascade_tiled_impl)
    def tiled_est(sl):
        extra = 2 * 2 * 2 * blk_full * (sl + 2 * halo * s) * _lanes(cb)
        return _banded_vmem_bytes(sl, cb, c, block, halo, levels) + extra

    slab = (w // blk_full) * blk_full
    while slab > blk_full and tiled_est(slab) > _banded_limit(levels):
        slab -= blk_full
    nwb = -(-w // slab)
    nh = h // blk_full
    wcs = slab // s  # coarse columns per slab

    pad_bottom = (nh + 1) * blk_full - h - halo * s
    pad_right = (nwb + 1) * slab - w - halo * s
    xp = jnp.pad(x, ((0, 0), (halo * s, pad_bottom),
                     (halo * s, pad_right), (0, 0)))

    kernel = functools.partial(_tile_kernel, block=block, halo=halo, wc=wcs,
                               levels=levels, precision=precision)
    wp_band = slab + 2 * halo * s
    scratch_shapes = _branch_scratch_shapes(wp_band, wcs, cb, c, block,
                                            halo, levels)
    view = lambda oi, oj: pl.BlockSpec(  # noqa: E731
        (1, blk_full, slab, cb),
        lambda b, i, j, a=oi, d=oj: (b, i + a, j + d, 0),
        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nh, nwb),
        in_specs=[
            view(0, 0), view(0, 1), view(1, 0), view(1, 1),
            const((c, c)), const((c, c)), const((c, c)),
            const((win, c // 2)), const((win, c // 2)),
        ],
        out_specs=pl.BlockSpec((1, blk_full, slab, cb),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, nwb * slab, cb), x.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(xp, xp, xp, xp, wq, wk, wv, rel_h, rel_w)
    return out[:, :, :w, :]


# Per-level VMEM budgets for batch grouping, calibrated on v5e at the
# flagship w=96 shapes (the estimator's absolute scale is ~2x conservative
# and level-dependent): L=0 runs g=4 2.8x faster than g=1 (est 24.5 MB,
# compiles and runs; g=8 at est 48.9 MB OOMs the remote compiler); L=1
# measured no win from g=2 and L=2 g=2 (est 23.9 MB) OOMs — both stay
# g=1. Budgets live in the device-keyed table (device.py).


def _group_budget(levels: int) -> float:
    from m2trans_tpu.ops.pallas.device import gate_profile

    return gate_profile()["group_budget"].get(levels, 0.0)


def _pick_group(bsz: int, w, cb, c, block, halo, levels,
                extra_views: int = 0, bwd: bool = False) -> int:
    """Largest batch group per program that divides the batch and fits the
    per-level calibrated budget (>=1; g=1 is the round-1 per-image grid).
    ``extra_views``: additional banded input views (the cascade-add input)
    counted at the same double-buffered footprint. The backward kernel
    roughly doubles the live set (recompute + grads), so it gets half the
    budget."""
    budget = _group_budget(levels)
    if bwd:
        budget *= 0.5
    sfull = 2 ** levels
    view_bytes = 2 * 2 * block * sfull * (w + 2 * halo * sfull) * _lanes(cb)
    g = 1
    for cand in (2, 4, 8, 16):
        est = _banded_vmem_bytes(w, cb, c, block, halo, levels, cand) \
            + cand * extra_views * view_bytes
        if bsz % cand == 0 and est <= budget:
            g = cand
    return g


def _halo_attention_banded_impl(x, w_qkv, rel_h, rel_w, *, block, halo,
                                levels, interpret, precision=None):
    bsz, h, w, cb = x.shape
    s = 2 ** levels
    c = cb * (4 ** levels)
    win = block + 2 * halo
    wc = w // s
    wq, wk, wv = (w_qkv[:, :c], w_qkv[:, c:2 * c], w_qkv[:, 2 * c:])

    nh = h // (block * s)
    nw = wc // block
    gb = _pick_group(bsz, w, cb, c, block, halo, levels)
    # zero-pad at full resolution: halo*2^L on the left/right of W; the
    # same on top of H, and enough at the bottom to make padded H a whole
    # number of (nh + 1) full-res row blocks so the i+1 view is in range
    blk_full = block * s
    pad_bottom = (nh + 1) * blk_full - h - halo * s
    xp = jnp.pad(x, ((0, 0), (halo * s, pad_bottom),
                     (halo * s, halo * s), (0, 0)))
    wp_full = w + 2 * halo * s

    kernel = functools.partial(_kernel, block=block, halo=halo, wc=wc,
                               levels=levels, precision=precision)

    scratch_shapes = _branch_scratch_shapes(wp_full, wc, cb, c, block, halo,
                                            levels, gb)
    flops_per_band = (
        2 * win * (wc + 2 * halo) * c * 2 * c
        + 2 * block * wc * c * c
        + nw * (2 * block * block * win * win * c * 2))
    band_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (gb, blk_full, wp_full, cb), lambda b, i, o=off: (b, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bsz // gb, nh),
        in_specs=[
            band_spec(0),
            band_spec(1),
            pl.BlockSpec((c, c), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, c // 2), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, c // 2), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, blk_full, w, cb),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cb), x.dtype),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_band * bsz * nh),
            bytes_accessed=int(2 * x.size * x.dtype.itemsize),
            transcendentals=int(bsz * h * w * win * win)),
        interpret=interpret,
    )(xp, xp, wq, wk, wv, rel_h, rel_w)
    return out


def _cascade_banded_impl(x, x_add, s, t, w_qkv, rel_h, rel_w, *, block,
                         halo, levels, r, interpret, precision=None):
    bsz, h, w, cb = x.shape
    sfull = 2 ** levels
    c = cb * (4 ** levels)
    win = block + 2 * halo
    wc = w // sfull
    wq, wk, wv = (w_qkv[:, :c], w_qkv[:, c:2 * c], w_qkv[:, 2 * c:])
    has_add = x_add is not None

    nh = h // (block * sfull)
    blk_full = block * sfull
    gb = _pick_group(bsz, w, cb, c, block, halo, levels,
                     extra_views=2 if has_add else 0)
    pad_bottom = (nh + 1) * blk_full - h - halo * sfull
    pads = ((0, 0), (halo * sfull, pad_bottom),
            (halo * sfull, halo * sfull), (0, 0))
    xp = jnp.pad(x, pads)
    wp_full = w + 2 * halo * sfull

    kernel = functools.partial(_cascade_kernel, block=block, halo=halo,
                               wc=wc, levels=levels, precision=precision,
                               h=h, w=w, r=float(r), has_add=has_add)
    band_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (gb, blk_full, wp_full, cb), lambda b, i, o=off: (b, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: tuple(0 for _ in shp), memory_space=pltpu.VMEM)
    # full (B, cb) block — per-group row slicing happens in-kernel (a
    # (gb, cb) block would violate the (8, 128)-divisible min-tile rule)
    per_img = pl.BlockSpec((bsz, cb), lambda b, i: (0, 0),
                           memory_space=pltpu.VMEM)

    operands = [xp, xp]
    in_specs = [band_spec(0), band_spec(1)]
    if has_add:
        ap = jnp.pad(x_add, pads)
        operands += [ap, ap]
        in_specs += [band_spec(0), band_spec(1)]
    operands += [s.astype(jnp.float32), t.astype(jnp.float32),
                 wq, wk, wv, rel_h, rel_w]
    in_specs += [per_img, per_img, const((c, c)), const((c, c)),
                 const((c, c)), const((win, c // 2)), const((win, c // 2))]

    nw = wc // block
    flops_per_band = gb * (
        2 * win * (wc + 2 * halo) * c * 3 * c
        + nw * (2 * block * block * win * win * c * 2))
    return pl.pallas_call(
        kernel,
        grid=(bsz // gb, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gb, blk_full, w, cb),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cb), x.dtype),
        scratch_shapes=_branch_scratch_shapes(wp_full, wc, cb, c, block,
                                              halo, levels, gb),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_band * (bsz // gb) * nh),
            bytes_accessed=int((3 if has_add else 2) * x.size
                               * x.dtype.itemsize),
            transcendentals=int(bsz * h * w * win * win // sfull ** 2)),
        interpret=interpret,
    )(*operands)


def _cascade_tile_kernel(*refs, block: int, halo: int, wc: int,
                         levels: int, precision, h: int, w: int, slab: int,
                         r: float, has_add: bool):
    """Column-slab tiled cascade: grid (B, nh, n_slabs); per-program VMEM
    is W-independent (scales with ``slab``), so the fused cascade runs at
    widths where the full-width banded kernel exceeds VMEM (e.g. the x2
    model's L=2 branches at W=192, where XLA fallback cost ~5 ms/call).
    The overlapping tile is assembled from FOUR blocked views like
    _tile_kernel; the interior mask and residual use the slab's global
    column offset."""
    if has_add:
        (xaa, xab, xba, xbb, aaa, aab, aba, abb, s_ref, t_ref,
         wq_ref, wk_ref, wv_ref, relh_ref, relw_ref, out_ref,
         *scratch) = refs
    else:
        (xaa, xab, xba, xbb, s_ref, t_ref, wq_ref, wk_ref, wv_ref,
         relh_ref, relw_ref, out_ref, *scratch) = refs
        aaa = aab = aba = abb = None
    sf = 2 ** levels
    hh = 2 * halo * sf
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    def tile(va, vb, vc, vd):
        top = jnp.concatenate([va[0], vb[0][:, :hh]], axis=1)
        bot = jnp.concatenate([vc[0][:hh], vd[0][:hh, :hh]], axis=1)
        return jnp.concatenate([top, bot], axis=0)[None]

    x = tile(xaa, xab, xba, xbb)
    x_add = tile(aaa, aab, aba, abb) if has_add else None
    sv = s_ref[pl.ds(b, 1), :]
    tv = t_ref[pl.ds(b, 1), :]
    z = _affine_band(x, x_add, sv, tv, i=i, h=h, w=w, block=block,
                     halo=halo, levels=levels, r=r, col_off=j * slab)
    out = _band_body(z, scratch, wq_ref, wk_ref, wv_ref, relh_ref,
                     relw_ref, block=block, halo=halo, wc=wc,
                     levels=levels, precision=precision)
    blk_full = block * sf
    hs = halo * sf
    res = z[:, hs:hs + blk_full, hs:hs + slab, :]
    out_ref[:] = (out + res.astype(jnp.float32)).astype(out_ref.dtype)


def _cascade_tiled_impl(x, x_add, s, t, w_qkv, rel_h, rel_w, *, block,
                        halo, levels, r, interpret, precision=None):
    """Width-tolerant fused cascade via column slabs (see
    _cascade_tile_kernel)."""
    bsz, h, w, cb = x.shape
    sf = 2 ** levels
    c = cb * (4 ** levels)
    win = block + 2 * halo
    blk_full = block * sf
    hs = halo * sf
    has_add = x_add is not None
    wq, wk, wv = (w_qkv[:, :c], w_qkv[:, c:2 * c], w_qkv[:, 2 * c:])

    limit = _banded_limit(levels)

    def tiled_est(sl):
        # the tile is assembled from FOUR views (vs the banded kernel's
        # two), each double-buffered: count the two extra view blocks on
        # top of the banded estimate (omitting them OOM'd L=1 slab=208:
        # est 13.9M vs actual 17.02M)
        extra = 2 * 2 * 2 * blk_full * (sl + 2 * hs) * _lanes(cb)
        return _banded_vmem_bytes(sl, cb, c, block, halo, levels) + extra

    slab = (w // blk_full) * blk_full
    while slab > blk_full and tiled_est(slab) > limit:
        slab -= blk_full
    nwb = -(-w // slab)
    nh = h // blk_full
    wcs = slab // sf

    pad_bottom = (nh + 1) * blk_full - h - hs
    pad_right = (nwb + 1) * slab - w - hs
    pads = ((0, 0), (hs, pad_bottom), (hs, pad_right), (0, 0))
    xp = jnp.pad(x, pads)

    kernel = functools.partial(_cascade_tile_kernel, block=block,
                               halo=halo, wc=wcs, levels=levels,
                               precision=precision, h=h, w=w, slab=slab,
                               r=float(r), has_add=has_add)
    view = lambda oi, oj: pl.BlockSpec(  # noqa: E731
        (1, blk_full, slab, cb),
        lambda b, i, j, a=oi, d=oj: (b, i + a, j + d, 0),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i, j: tuple(0 for _ in shp),
        memory_space=pltpu.VMEM)
    per_img = pl.BlockSpec((bsz, cb), lambda b, i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    operands = [xp, xp, xp, xp]
    in_specs = [view(0, 0), view(0, 1), view(1, 0), view(1, 1)]
    if has_add:
        ap = jnp.pad(x_add, pads)
        operands += [ap, ap, ap, ap]
        in_specs += [view(0, 0), view(0, 1), view(1, 0), view(1, 1)]
    operands += [s.astype(jnp.float32), t.astype(jnp.float32),
                 wq, wk, wv, rel_h, rel_w]
    in_specs += [per_img, per_img, const((c, c)), const((c, c)),
                 const((c, c)), const((win, c // 2)), const((win, c // 2))]

    nw = wcs // block
    flops_per_tile = (
        2 * win * (wcs + 2 * halo) * c * 3 * c
        + nw * (2 * block * block * win * win * c * 2))
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nh, nwb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk_full, slab, cb),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, nwb * slab, cb), x.dtype),
        scratch_shapes=_branch_scratch_shapes(slab + 2 * hs, wcs, cb, c,
                                              block, halo, levels, 1),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_tile * bsz * nh * nwb),
            bytes_accessed=int((3 if has_add else 2) * x.size
                               * x.dtype.itemsize),
            transcendentals=int(bsz * h * w * win * win // sf ** 2)),
        interpret=interpret,
    )(*operands)
    return out[:, :, :w, :]


# ---------------------------------------------------------------------------
# Backward kernel for the fused cascade branch (VERDICT r1 item 5): the
# custom_vjp bwd runs in Pallas too, so training never re-runs the XLA
# forward composition. Per band the kernel recomputes the cheap forward
# (z, qkv, patches, attention probabilities), then walks the chain
# backward: softmax-vjp -> batched dq/dk/dv dots -> overlap-add window
# scatter (the adjoint of the aligned+overflow patch build) -> projection
# transpose dots -> IWT (the adjoint of the orthonormal DWT). Weight and
# rel-pos grads accumulate across the sequential TPU grid; dz leaves as
# overlapping extended bands that XLA folds with two shifted adds.
# ---------------------------------------------------------------------------


def _dwt_value(v, bufs):
    """DWT^L of a (G, R, W, C) value via f32 scratch refs (strided access
    is 32-bit-only in Mosaic). len(bufs) == levels + 1."""
    if len(bufs) == 1:
        return v
    bufs[0][:] = v.astype(jnp.float32)
    for l in range(len(bufs) - 1):
        src, dst = bufs[l], bufs[l + 1]
        a = src[:, 0::2, 0::2, :]
        b = src[:, 1::2, 0::2, :]
        cc = src[:, 0::2, 1::2, :]
        d = src[:, 1::2, 1::2, :]
        dst[:] = jnp.concatenate(
            [(a + b + cc + d), (-a - b + cc + d), (-a + b - cc + d),
             (a - b - cc + d)], axis=-1) * 0.5
    return bufs[-1][:]


def _iwt_value(v, bufs):
    """IWT^L of a coarse (G, r, w, 4^L*C) value via f32 scratch refs."""
    for dst in bufs:
        ll, hl, lh, hh = jnp.split(v, 4, axis=-1)
        dst[:, 0::2, 0::2, :] = (ll - hl - lh + hh) * 0.5
        dst[:, 0::2, 1::2, :] = (ll + hl - lh - hh) * 0.5
        dst[:, 1::2, 0::2, :] = (ll - hl + lh - hh) * 0.5
        dst[:, 1::2, 1::2, :] = (ll + hl + lh + hh) * 0.5
        v = dst[:]
    return v


def _unpatch(pat, *, block, halo, wp):
    """Adjoint of _window_patches: (G, nw, win, win, c) window grads ->
    (G, win, wp, c) with the 2*halo-column overlaps added."""
    g, nw, win = pat.shape[0], pat.shape[1], pat.shape[2]
    c = pat.shape[-1]
    t = pat.transpose(0, 2, 1, 3, 4)  # (G, win, nw, win, c)
    aligned = t[:, :, :, :block, :].reshape(g, win, nw * block, c)
    aligned = jnp.pad(aligned, ((0, 0), (0, 0), (0, block), (0, 0)))
    ov = t[:, :, :, block:, :]  # (G, win, nw, 2*halo, c)
    ov = jnp.pad(ov, ((0, 0), (0, 0), (0, 0), (0, block - 2 * halo),
                      (0, 0)))
    ov = ov.reshape(g, win, nw * block, c)
    ov = jnp.pad(ov, ((0, 0), (0, 0), (block, 0), (0, 0)))
    return (aligned + ov)[:, :, :wp, :]


def _attn_core_adjoint(zc, gc, wqkv, relh, relw, *, block, halo, wc,
                       precision):
    """Attention-core adjoint on COARSE values: given zc (G, win, wp, C)
    (the qkv-projection inputs) and gc (G, block, wc, C) (the cotangent
    of the attention output), recompute qkv/windows/attention and walk
    the reverse chain. Returns (dzc (G, win, wp, C) f32, dw (C, 3C),
    drel_h (win, C/2), drel_w (win, C/2)). Shared by the banded/tiled
    backward (_bwd_body) and the packed-front backward (which runs the
    full-res stages packed and this core per native-C subgroup)."""
    g = zc.shape[0]
    win = block + 2 * halo
    wp = wc + 2 * halo
    nw = wc // block
    c = zc.shape[-1]
    c2 = c // 2

    # ---- forward recompute (attention core) ----
    zf = zc.reshape(g * win * wp, c)
    qkv = jnp.dot(zf, wqkv, preferred_element_type=jnp.float32,
                  precision=precision).reshape(g, win, wp, 3 * c)
    scale = c ** -0.5
    q_full = qkv[:, halo:halo + block, halo:halo + wc, :c] * scale
    kv_full = jnp.concatenate(
        [qkv[..., c:c + c2] + relh[None, :, None, :], qkv[..., c + c2:]],
        axis=-1)
    kvb = _window_patches(kv_full, block=block, halo=halo, wc=wc)
    kb = jnp.concatenate(
        [kvb[..., :c2], kvb[..., c2:c] + relw[None, None, None]],
        axis=-1).reshape(g * nw, win * win, c)
    vb = kvb[..., c:].reshape(g * nw, win * win, c)
    qb = q_full.reshape(g, block, nw, block, c).transpose(0, 2, 1, 3, 4)
    qb = qb.reshape(g * nw, block * block, c)
    sim = jax.lax.dot_general(
        qb, kb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    e = jnp.exp(sim)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)

    # ---- backward ----
    g_b = gc.reshape(g, block, nw, block, c).transpose(0, 2, 1, 3, 4)
    g_b = g_b.reshape(g * nw, block * block, c)

    dv_b = jax.lax.dot_general(  # attn^T @ g_b
        attn, g_b, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    dattn = jax.lax.dot_general(  # g_b @ v^T
        g_b, vb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    rs = jnp.sum(dattn * attn, axis=-1, keepdims=True)
    dsim = attn * (dattn - rs)
    dq_b = jax.lax.dot_general(  # dsim @ k
        dsim, kb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    dk_b = jax.lax.dot_general(  # dsim^T @ q
        dsim, qb, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)

    # rel_w grad: added to k window-columns after patching
    dk_r = dk_b.reshape(g, nw, win, win, c)
    drw_c = jnp.sum(dk_r[..., c2:], axis=(0, 1, 2))  # (win, c2)
    dkv_r = jnp.concatenate([dk_r, dv_b.reshape(g, nw, win, win, c)],
                            axis=-1)
    dkv_full = _unpatch(dkv_r, block=block, halo=halo, wp=wp)
    drh_c = jnp.sum(dkv_full[..., :c2], axis=(0, 2))  # (win, c2)

    dq_full = dq_b.reshape(g, nw, block, block, c).transpose(0, 2, 1, 3, 4)
    dq_full = dq_full.reshape(g, block, wc, c) * scale
    dq_emb = jnp.pad(dq_full, ((0, 0), (halo, halo), (halo, halo), (0, 0)))
    dqkv = jnp.concatenate([dq_emb, dkv_full], axis=-1)  # (g, win, wp, 3c)
    dqkv_f = dqkv.reshape(g * win * wp, 3 * c)

    dw_c = jax.lax.dot_general(  # zf^T @ dqkv
        zf, dqkv_f, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    dzc = jax.lax.dot_general(  # dqkv @ w_qkv^T
        dqkv_f, wqkv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision).reshape(g, win, wp, c)
    return dzc, dw_c, drh_c, drw_c


def _bwd_body(x, x_add, g_band, sv, tv, wq_ref, wk_ref, wv_ref, relh_ref,
              relw_ref, z_bufs, g_bufs, iwt_bufs, *, block, halo, wc,
              levels, precision, h, w, r, i, col_off=0):
    """Shared cascade-branch backward math on one group of assembled
    band/tile values: forward recompute (affine, DWT) + the attention-
    core adjoint + IWT/residual adjoints. ``x``: (G, win*2^L, Wp_full,
    Cb) band values; ``g_band``: (G, blk*2^L, W_cols, Cb) output
    cotangent. Returns (dz extended band f32, dw, drel_h, drel_w)."""
    sf = 2 ** levels
    hs = halo * sf

    z = _affine_band(x, x_add, sv, tv, i=i, h=h, w=w, block=block,
                     halo=halo, levels=levels, r=r, col_off=col_off)
    zc = _dwt_value(z, z_bufs).astype(z.dtype) if levels else z
    wqkv = jnp.concatenate([wq_ref[:], wk_ref[:], wv_ref[:]], axis=1)
    relh = relh_ref[:].astype(jnp.float32)
    relw = relw_ref[:].astype(jnp.float32)

    g_band = g_band.astype(jnp.float32)  # (g, blk_full, w_cols, cb)
    gc = _dwt_value(g_band, g_bufs) if levels else g_band
    gc = gc.astype(jnp.float32)  # (g, block, wc, c)

    dzc, dw_c, drh_c, drw_c = _attn_core_adjoint(
        zc, gc, wqkv, relh, relw, block=block, halo=halo, wc=wc,
        precision=precision)
    dz = _iwt_value(dzc, iwt_bufs) if levels else dzc  # (g, ext, wpf, cb)

    # add the residual cotangent (out = attn_out + z) at interior positions
    g_pad = jnp.pad(g_band, ((0, 0), (hs, hs), (hs, hs), (0, 0)))
    dz = dz.astype(jnp.float32) + g_pad
    return dz, dw_c, drh_c, drw_c


def _accumulate_weight_grads(first, dw_ref, drh_ref, drw_ref, dw_c, drh_c,
                             drw_c):
    @pl.when(first)
    def _():
        dw_ref[:] = dw_c.astype(dw_ref.dtype)
        drh_ref[:] = drh_c.astype(drh_ref.dtype)
        drw_ref[:] = drw_c.astype(drw_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[:] = dw_ref[:] + dw_c.astype(dw_ref.dtype)
        drh_ref[:] = drh_ref[:] + drh_c.astype(drh_ref.dtype)
        drw_ref[:] = drw_ref[:] + drw_c.astype(drw_ref.dtype)


def _cascade_bwd_kernel(*refs, block: int, halo: int, wc: int, levels: int,
                        precision, h: int, w: int, r: float,
                        has_add: bool):
    if has_add:
        (xa, xb, aa, ab, ga, s_ref, t_ref, wq_ref, wk_ref, wv_ref,
         relh_ref, relw_ref, dze_ref, dw_ref, drh_ref, drw_ref,
         *scratch) = refs
    else:
        (xa, xb, ga, s_ref, t_ref, wq_ref, wk_ref, wv_ref,
         relh_ref, relw_ref, dze_ref, dw_ref, drh_ref, drw_ref,
         *scratch) = refs
        aa = ab = None
    sf = 2 ** levels
    b_id = pl.program_id(0)
    i = pl.program_id(1)
    hs = halo * sf

    n_dwt = levels + 1 if levels else 1
    z_bufs = scratch[:n_dwt] if levels else []
    g_bufs = scratch[n_dwt:2 * n_dwt] if levels else []
    iwt_bufs = scratch[2 * n_dwt:] if levels else []

    x = jnp.concatenate([xa[:], xb[:, : 2 * hs]], axis=1)
    g = x.shape[0]
    x_add = None
    if has_add:
        x_add = jnp.concatenate([aa[:], ab[:, : 2 * hs]], axis=1)
    sv = s_ref[pl.ds(b_id * g, g), :]
    tv = t_ref[pl.ds(b_id * g, g), :]
    dz, dw_c, drh_c, drw_c = _bwd_body(
        x, x_add, ga[:], sv, tv, wq_ref, wk_ref, wv_ref, relh_ref,
        relw_ref, z_bufs, g_bufs, iwt_bufs, block=block, halo=halo,
        wc=wc, levels=levels, precision=precision, h=h, w=w, r=r, i=i)

    dze_ref[:, 0] = dz.astype(dze_ref.dtype)
    _accumulate_weight_grads((b_id == 0) & (i == 0), dw_ref, drh_ref,
                             drw_ref, dw_c, drh_c, drw_c)


def _cascade_bwd_impl(x, x_add, s, t, w_qkv, rel_h, rel_w, gout, *, block,
                      halo, levels, r, interpret, precision=None):
    """Pallas backward for the fused cascade branch. Returns the grads
    (dx, [dx_add,] ds, dt, dw_qkv, drel_h, drel_w)."""
    bsz, h, w, cb = x.shape
    sf = 2 ** levels
    c = cb * (4 ** levels)
    win = block + 2 * halo
    wc = w // sf
    wp = wc + 2 * halo
    has_add = x_add is not None
    wq, wk, wv = (w_qkv[:, :c], w_qkv[:, c:2 * c], w_qkv[:, 2 * c:])

    nh = h // (block * sf)
    blk_full = block * sf
    hs = halo * sf
    gb = _pick_group(bsz, w, cb, c, block, halo, levels,
                     extra_views=3 if has_add else 2, bwd=True)
    pad_bottom = (nh + 1) * blk_full - h - hs
    pads = ((0, 0), (hs, pad_bottom), (hs, hs), (0, 0))
    xp = jnp.pad(x, pads)
    wp_full = w + 2 * hs
    ext = blk_full + 2 * hs

    kernel = functools.partial(_cascade_bwd_kernel, block=block, halo=halo,
                               wc=wc, levels=levels, precision=precision,
                               h=h, w=w, r=float(r), has_add=has_add)
    band_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (gb, blk_full, wp_full, cb), lambda b, i, o=off: (b, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: tuple(0 for _ in shp), memory_space=pltpu.VMEM)
    acc = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: tuple(0 for _ in shp), memory_space=pltpu.VMEM)
    per_img = pl.BlockSpec((bsz, cb), lambda b, i: (0, 0),
                           memory_space=pltpu.VMEM)

    operands = [xp, xp]
    in_specs = [band_spec(0), band_spec(1)]
    if has_add:
        ap = jnp.pad(x_add, pads)
        operands += [ap, ap]
        in_specs += [band_spec(0), band_spec(1)]
    operands += [gout]
    in_specs += [pl.BlockSpec((gb, blk_full, w, cb),
                              lambda b, i: (b, i, 0, 0),
                              memory_space=pltpu.VMEM)]
    operands += [s.astype(jnp.float32), t.astype(jnp.float32),
                 wq, wk, wv, rel_h, rel_w]
    in_specs += [per_img, per_img, const((c, c)), const((c, c)),
                 const((c, c)), const((win, c // 2)), const((win, c // 2))]

    scratch = []
    if levels:
        rows0 = win * sf
        for l in range(levels + 1):  # z DWT pyramid (band geometry)
            scratch.append(pltpu.VMEM(
                (gb, rows0 >> l, wp_full >> l, cb * 4 ** l), jnp.float32))
        for l in range(levels + 1):  # g DWT pyramid (block geometry)
            scratch.append(pltpu.VMEM(
                (gb, blk_full >> l, w >> l, cb * 4 ** l), jnp.float32))
        for l in range(levels):  # dz IWT pyramid (band geometry)
            scratch.append(pltpu.VMEM(
                (gb, (win * 2) << l, (wp * 2) << l, c // 4 ** (l + 1)),
                jnp.float32))

    # dz bands leave in the model dtype (bf16 halves the double-buffered
    # output blocks — the L=2 kernel otherwise misses the 16 MB scoped
    # VMEM limit by ~0.15 MB inside the full training program); the
    # overlap-add and the s/x reductions below run in f32
    out_shapes = [
        jax.ShapeDtypeStruct((bsz, nh, ext, wp_full, cb), x.dtype),
        jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
        jax.ShapeDtypeStruct((win, c // 2), jnp.float32),
        jax.ShapeDtypeStruct((win, c // 2), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((gb, 1, ext, wp_full, cb),
                     lambda b, i: (b, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        acc((c, 3 * c)), acc((win, c // 2)), acc((win, c // 2)),
    ]
    dze, dw, drh, drw = pl.pallas_call(
        kernel,
        grid=(bsz // gb, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    # fold the overlapping extended bands: row r of band i is global padded
    # row i*blk_full + r; two shifted adds cover the 2*hs overlaps
    dze = dze.astype(jnp.float32)
    main = dze[:, :, :blk_full].reshape(bsz, nh * blk_full, wp_full, cb)
    tailp = jnp.pad(dze[:, :, blk_full:],
                    ((0, 0), (0, 0), (0, blk_full - 2 * hs), (0, 0), (0, 0)))
    tailp = tailp.reshape(bsz, nh * blk_full, wp_full, cb)
    acc_rows = jnp.pad(main, ((0, 0), (0, blk_full), (0, 0), (0, 0))) \
        + jnp.pad(tailp, ((0, 0), (blk_full, 0), (0, 0), (0, 0)))
    dz = acc_rows[:, hs:hs + h, hs:hs + w, :]  # (bsz, h, w, cb) f32

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


def _cascade_bwd_tile_kernel(*refs, block: int, halo: int, wc: int,
                             levels: int, precision, h: int, w: int,
                             slab: int, r: float, has_add: bool):
    """Column-slab tiled cascade backward: grid (B, nh, n_slabs). The
    input tile is assembled from FOUR blocked views (like
    _cascade_tile_kernel); dz leaves as tiles extended by halo*2^L on all
    four sides, folded by a 2-D overlap-add in XLA. Per-program VMEM is
    W-independent, which (a) runs the Pallas backward at the x2/x3 body
    widths where the banded backward exceeds VMEM (W=192/128 at L=2) and
    (b) replaces the scoped-VMEM-marginal full-width L=2 banded backward
    (17.24M vs the 16M ceiling, program-dependent OOM) at the flagship
    shape."""
    if has_add:
        (xaa, xab, xba, xbb, aaa, aab, aba, abb, ga, s_ref, t_ref,
         wq_ref, wk_ref, wv_ref, relh_ref, relw_ref,
         dze_ref, dw_ref, drh_ref, drw_ref, *scratch) = refs
    else:
        (xaa, xab, xba, xbb, ga, s_ref, t_ref, wq_ref, wk_ref, wv_ref,
         relh_ref, relw_ref, dze_ref, dw_ref, drh_ref, drw_ref,
         *scratch) = refs
        aaa = aab = aba = abb = None
    sf = 2 ** levels
    hh = 2 * halo * sf
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    n_dwt = levels + 1 if levels else 1
    z_bufs = scratch[:n_dwt] if levels else []
    g_bufs = scratch[n_dwt:2 * n_dwt] if levels else []
    iwt_bufs = scratch[2 * n_dwt:] if levels else []

    def tile(va, vb, vc, vd):
        top = jnp.concatenate([va[0], vb[0][:, :hh]], axis=1)
        bot = jnp.concatenate([vc[0][:hh], vd[0][:hh, :hh]], axis=1)
        return jnp.concatenate([top, bot], axis=0)[None]

    x = tile(xaa, xab, xba, xbb)
    x_add = tile(aaa, aab, aba, abb) if has_add else None
    sv = s_ref[pl.ds(b, 1), :]
    tv = t_ref[pl.ds(b, 1), :]
    dz, dw_c, drh_c, drw_c = _bwd_body(
        x, x_add, ga[:], sv, tv, wq_ref, wk_ref, wv_ref, relh_ref,
        relw_ref, z_bufs, g_bufs, iwt_bufs, block=block, halo=halo,
        wc=wc, levels=levels, precision=precision, h=h, w=w, r=r, i=i,
        col_off=j * slab)

    dze_ref[:, 0, :, 0] = dz.astype(dze_ref.dtype)
    _accumulate_weight_grads((b == 0) & (i == 0) & (j == 0), dw_ref,
                             drh_ref, drw_ref, dw_c, drh_c, drw_c)


def _bwd_tiled_slab(w, cb, c, block, halo, levels):
    """Largest slab (multiple of block*2^L) whose tiled-backward tile fits
    the calibrated budget (device.py "bwd_tiled_budget"). Counts the two
    extra x views and the extended dze out block on top of the banded
    estimate — honest for this kernel: slab=96 predicts 17.49M vs 17.24M
    observed for the equivalent full-width banded backward."""
    from m2trans_tpu.ops.pallas.device import gate_profile

    sf = 2 ** levels
    blk_full = block * sf
    hs = halo * sf
    budget = gate_profile().get("bwd_tiled_budget", {}).get(levels)
    if not budget:
        return None

    def est(sl):
        extra_x = 2 * 2 * 2 * blk_full * (sl + 2 * hs) * _lanes(cb)
        out_ext = 2 * 2 * (blk_full + 2 * hs) * (sl + 2 * hs) * _lanes(cb)
        return (_banded_vmem_bytes(sl, cb, c, block, halo, levels)
                + extra_x + out_ext)

    # among fitting slabs, minimize total tile compute
    # nwb*(slab + 2*hs) — the largest slab is NOT always cheapest (at
    # W=96, slab=64 pads a half-empty second tile: 2x72=144 columns vs
    # slab=32's 3x40=120); ties prefer the larger slab (fewer programs)
    best, best_cost = None, None
    sl = blk_full
    while sl <= (w // blk_full + 1) * blk_full and sl <= w + blk_full - 1:
        if est(sl) <= budget:
            nwb = -(-w // sl)
            cost = nwb * (sl + 2 * hs)
            if best is None or cost < best_cost or (cost == best_cost
                                                    and sl > best):
                best, best_cost = sl, cost
        sl += blk_full
    return best


def _cascade_bwd_tiled_impl(x, x_add, s, t, w_qkv, rel_h, rel_w, gout, *,
                            block, halo, levels, r, interpret,
                            precision=None, slab=None):
    """Width-tolerant Pallas backward via column slabs (see
    _cascade_bwd_tile_kernel). Returns the same grads as
    _cascade_bwd_impl. ``slab`` overrides the budget-derived slab width
    (tests force multi-slab folds on small shapes)."""
    bsz, h, w, cb = x.shape
    sf = 2 ** levels
    c = cb * (4 ** levels)
    win = block + 2 * halo
    blk_full = block * sf
    hs = halo * sf
    ext = blk_full + 2 * hs
    has_add = x_add is not None

    if slab is None:
        slab = _bwd_tiled_slab(w, cb, c, block, halo, levels)
    assert slab is not None, "gate must reject shapes without a slab"
    wcs = slab // sf
    wps = slab + 2 * hs
    nwb = -(-w // slab)
    nh = h // blk_full

    pad_bottom = (nh + 1) * blk_full - h - hs
    pad_right = (nwb + 1) * slab - w - hs
    pads = ((0, 0), (hs, pad_bottom), (hs, pad_right), (0, 0))
    xp = jnp.pad(x, pads)
    gp = jnp.pad(gout, ((0, 0), (0, 0), (0, nwb * slab - w), (0, 0)))

    kernel = functools.partial(_cascade_bwd_tile_kernel, block=block,
                               halo=halo, wc=wcs, levels=levels,
                               precision=precision, h=h, w=w, slab=slab,
                               r=float(r), has_add=has_add)
    view = lambda oi, oj: pl.BlockSpec(  # noqa: E731
        (1, blk_full, slab, cb),
        lambda b, i, j, a=oi, d=oj: (b, i + a, j + d, 0),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i, j: tuple(0 for _ in shp),
        memory_space=pltpu.VMEM)
    acc = const
    per_img = pl.BlockSpec((bsz, cb), lambda b, i, j: (0, 0),
                           memory_space=pltpu.VMEM)

    operands = [xp, xp, xp, xp]
    in_specs = [view(0, 0), view(0, 1), view(1, 0), view(1, 1)]
    if has_add:
        ap = jnp.pad(x_add, pads)
        operands += [ap, ap, ap, ap]
        in_specs += [view(0, 0), view(0, 1), view(1, 0), view(1, 1)]
    operands += [gp]
    in_specs += [pl.BlockSpec((1, blk_full, slab, cb),
                              lambda b, i, j: (b, i, j, 0),
                              memory_space=pltpu.VMEM)]
    wq, wk, wv = (w_qkv[:, :c], w_qkv[:, c:2 * c], w_qkv[:, 2 * c:])
    operands += [s.astype(jnp.float32), t.astype(jnp.float32),
                 wq, wk, wv, rel_h, rel_w]
    in_specs += [per_img, per_img, const((c, c)), const((c, c)),
                 const((c, c)), const((win, c // 2)), const((win, c // 2))]

    scratch = []
    if levels:
        rows0 = win * sf
        for l in range(levels + 1):  # z DWT pyramid (tile geometry)
            scratch.append(pltpu.VMEM(
                (1, rows0 >> l, wps >> l, cb * 4 ** l), jnp.float32))
        for l in range(levels + 1):  # g DWT pyramid (block geometry)
            scratch.append(pltpu.VMEM(
                (1, blk_full >> l, slab >> l, cb * 4 ** l), jnp.float32))
        wpc = wcs + 2 * halo
        for l in range(levels):  # dz IWT pyramid (tile geometry)
            scratch.append(pltpu.VMEM(
                (1, (win * 2) << l, (wpc * 2) << l, c // 4 ** (l + 1)),
                jnp.float32))

    out_shapes = [
        jax.ShapeDtypeStruct((bsz, nh, ext, nwb, wps, cb), x.dtype),
        jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
        jax.ShapeDtypeStruct((win, c // 2), jnp.float32),
        jax.ShapeDtypeStruct((win, c // 2), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, ext, 1, wps, cb),
                     lambda b, i, j: (b, i, 0, j, 0, 0),
                     memory_space=pltpu.VMEM),
        acc((c, 3 * c)), acc((win, c // 2)), acc((win, c // 2)),
    ]
    dze, dw, drh, drw = pl.pallas_call(
        kernel,
        grid=(bsz, nh, nwb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    # 2-D overlap-add: columns first (within each extended row band),
    # then rows — each a pair of shifted adds like the banded fold
    dze = dze.astype(jnp.float32)  # (bsz, nh, ext, nwb, wps, cb)
    mainc = dze[..., :slab, :].reshape(bsz, nh, ext, nwb * slab, cb)
    tailc = jnp.pad(dze[..., slab:, :],
                    ((0, 0), (0, 0), (0, 0), (0, 0),
                     (0, slab - 2 * hs), (0, 0)))
    tailc = tailc.reshape(bsz, nh, ext, nwb * slab, cb)
    acc_c = jnp.pad(mainc, ((0, 0), (0, 0), (0, 0), (0, slab), (0, 0))) \
        + jnp.pad(tailc, ((0, 0), (0, 0), (0, 0), (slab, 0), (0, 0)))

    cw = acc_c.shape[3]
    mainr = acc_c[:, :, :blk_full].reshape(bsz, nh * blk_full, cw, cb)
    tailr = jnp.pad(acc_c[:, :, blk_full:],
                    ((0, 0), (0, 0), (0, blk_full - 2 * hs), (0, 0),
                     (0, 0)))
    tailr = tailr.reshape(bsz, nh * blk_full, cw, cb)
    acc_rows = jnp.pad(mainr, ((0, 0), (0, blk_full), (0, 0), (0, 0))) \
        + jnp.pad(tailr, ((0, 0), (blk_full, 0), (0, 0), (0, 0)))
    dz = acc_rows[:, hs:hs + h, hs:hs + w, :]  # (bsz, h, w, cb) f32

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


def _cascade_xla(x, x_add, s, t, w_qkv, rel_h, rel_w, *, block, halo,
                 levels, r, precision=None):
    """XLA equivalent of the fused cascade branch (used for the backward
    pass and as the over-VMEM fallback)."""
    z = (x.astype(jnp.float32) * s[:, None, None, :].astype(jnp.float32)
         + t[:, None, None, :].astype(jnp.float32))
    if x_add is not None:
        z = z + r * x_add.astype(jnp.float32)
    z = z.astype(x.dtype)
    return _xla_reference(z, w_qkv, rel_h, rel_w, block=block, halo=halo,
                          levels=levels, precision=precision) + z


def _make_cascade_fused(has_add: bool):
    def _dispatch(x, x_add, s, t, w_qkv, rel_h, rel_w, block, halo, levels,
                  r, interpret, precision, conservative=False):
        from m2trans_tpu.ops.pallas.halo_attn_packed import (
            packed_cascade_impl,
            packed_cascade_tiled_impl,
            packed_front_cascade_impl,
            pick_pack_g,
            pick_packed_front,
            pick_packed_tiled,
        )

        g = pick_pack_g(x.shape[0], x.shape[2], x.shape[-1], levels,
                        block, halo)
        if g > 1:
            return packed_cascade_impl(
                x, x_add, s, t, w_qkv, rel_h, rel_w, block=block,
                halo=halo, levels=levels, g=g, r=r, interpret=interpret,
                precision=precision)
        gs = pick_packed_tiled(x.shape[0], x.shape[2], x.shape[-1],
                               levels, block, halo)
        if gs is not None:
            return packed_cascade_tiled_impl(
                x, x_add, s, t, w_qkv, rel_h, rel_w, block=block,
                halo=halo, levels=levels, g=gs[0], slab=gs[1], r=r,
                interpret=interpret, precision=precision)
        # The packed-front kernel sits within ~1 MB of the 16 MB scoped-
        # VMEM ceiling and the effective limit varies with the SURROUNDING
        # program (observed: the same kernel compiles in the plain forward
        # but OOMs at 16.96M inside two different grad programs). Under AD
        # (the custom_vjp fwd rule sets conservative=True) take the banded
        # kernel instead — ~0.05 ms/call slower, irrelevant next to the
        # backward, and never marginal.
        pf = (pick_packed_front(x.shape[0], x.shape[2], x.shape[-1],
                                levels, block, halo)
              if (not conservative
                  and x.shape[1] % (block * 2 ** levels) == 0) else None)
        if pf is not None:
            return packed_front_cascade_impl(
                x, x_add, s, t, w_qkv, rel_h, rel_w, block=block,
                halo=halo, levels=levels, g=pf[0], sub=pf[1], r=r,
                interpret=interpret, precision=precision)
        from m2trans_tpu.ops.pallas.halo_attn_packed import (
            packed_front_tiled_impl,
            pick_packed_front_tiled,
        )

        pft = (pick_packed_front_tiled(x.shape[0], x.shape[2],
                                       x.shape[-1], levels, block, halo)
               if ((not conservative or not _AD_CONSERVATIVE)
                   and x.shape[1] % (block * 2 ** levels) == 0) else None)
        if pft is not None:
            return packed_front_tiled_impl(
                x, x_add, s, t, w_qkv, rel_h, rel_w, block=block,
                halo=halo, levels=levels, g=pft[0], sub=pft[1],
                slab=pft[2], r=r, interpret=interpret,
                precision=precision)
        c = x.shape[-1] * 4 ** levels
        if _banded_vmem_bytes(x.shape[2], x.shape[-1], c, block, halo,
                              levels) > _banded_limit(levels):
            from m2trans_tpu.ops.pallas.device import gate_profile

            blk_full = block * 2 ** levels
            if (levels in gate_profile().get("tiled_levels", ())
                    and x.shape[2] > blk_full
                    and _banded_vmem_bytes(blk_full, x.shape[-1], c, block,
                                           halo,
                                           levels) <= _banded_limit(levels)):
                return _cascade_tiled_impl(
                    x, x_add, s, t, w_qkv, rel_h, rel_w, block=block,
                    halo=halo, levels=levels, r=r, interpret=interpret,
                    precision=precision)
            return _cascade_xla(x, x_add, s, t, w_qkv, rel_h, rel_w,
                                block=block, halo=halo, levels=levels,
                                r=r, precision=precision)
        return _cascade_banded_impl(x, x_add, s, t, w_qkv, rel_h, rel_w,
                                    block=block, halo=halo, levels=levels,
                                    r=r, interpret=interpret,
                                    precision=precision)

    if has_add:
        def prim(x, x_add, s, t, w_qkv, rel_h, rel_w, block, halo, levels,
                 r, interpret, precision):
            return _dispatch(x, x_add, s, t, w_qkv, rel_h, rel_w, block,
                             halo, levels, r, interpret, precision)
    else:
        def prim(x, s, t, w_qkv, rel_h, rel_w, block, halo, levels,
                 r, interpret, precision):
            return _dispatch(x, None, s, t, w_qkv, rel_h, rel_w, block,
                             halo, levels, r, interpret, precision)

    # static trailing args: (block, halo, levels, r, interpret, precision)
    first_static = 7 if has_add else 6
    wrapped = jax.custom_vjp(
        prim, nondiff_argnums=tuple(range(first_static, first_static + 6)))

    def _bwd_mode(x, block, halo, levels):
        """('packed', g) | ('banded', None) | ('tiled', None) |
        ('xla', None) for the backward at this shape. Packed first (full
        lane occupancy — the banded backward pays the forward's old
        op-issue wall at 16 lanes); banded only where its fwd-estimate
        clears BOTH the fwd limit and the (tighter) calibrated backward
        limit — the L=2 flagship banded backward is scoped-VMEM-marginal
        (17.24M vs the 16M ceiling) and routes to the width-tolerant
        tiled backward, as do the x2/x3 body widths the banded gate
        rejects outright."""
        if not _PALLAS_BWD:
            return "xla", None
        cb = x.shape[-1]
        c = cb * 4 ** levels
        blk_full = block * 2 ** levels
        if x.shape[1] % blk_full:
            return "xla", None
        from m2trans_tpu.ops.pallas.device import gate_profile
        from m2trans_tpu.ops.pallas.halo_attn_packed import (
            pick_packed_bwd_g,
            pick_packed_bwd_tiled,
        )

        g = pick_packed_bwd_g(x.shape[0], x.shape[2], cb, levels, block,
                              halo)
        if g:
            return "packed", g
        gs = pick_packed_bwd_tiled(x.shape[0], x.shape[2], cb, levels,
                                   block, halo)
        if gs:
            return "packed_tiled", gs
        from m2trans_tpu.ops.pallas.halo_attn_packed import (
            pick_packed_front_bwd,
        )

        pfb = pick_packed_front_bwd(x.shape[0], x.shape[2], cb, levels,
                                    block, halo)
        if pfb:
            return "packed_front", pfb
        est = _banded_vmem_bytes(x.shape[2], cb, c, block, halo, levels)
        # only tighten past the forward limit on profiles that calibrated
        # a backward banded limit — uncalibrated devices keep the banded
        # backward wherever the forward gate admits it (numerics are
        # unchanged either way; this is a perf-only routing choice)
        bwd_limit = gate_profile().get("bwd_banded_limit_default")
        limit = _banded_limit(levels)
        if bwd_limit is not None:
            limit = min(limit, bwd_limit)
        if est <= limit:
            return "banded", None
        if _bwd_tiled_slab(x.shape[2], cb, c, block, halo,
                           levels) is not None:
            return "tiled", None
        return "xla", None

    if has_add:
        def fwd(x, x_add, s, t, w_qkv, rel_h, rel_w, block, halo, levels,
                r, interpret, precision):
            out = _dispatch(x, x_add, s, t, w_qkv, rel_h, rel_w, block,
                            halo, levels, r, interpret, precision,
                            conservative=True)
            return out, (x, x_add, s, t, w_qkv, rel_h, rel_w)

        def bwd(block, halo, levels, r, interpret, precision, res, g):
            x, x_add, s, t, w_qkv, rel_h, rel_w = res
            mode, pg = _bwd_mode(x, block, halo, levels)
            if mode == "packed":
                from m2trans_tpu.ops.pallas.halo_attn_packed import (
                    packed_cascade_bwd_impl,
                )

                return packed_cascade_bwd_impl(
                    x, x_add, s, t, w_qkv, rel_h, rel_w, g, block=block,
                    halo=halo, levels=levels, g=pg, r=r,
                    interpret=interpret, precision=precision)
            if mode == "packed_tiled":
                from m2trans_tpu.ops.pallas.halo_attn_packed import (
                    packed_cascade_bwd_tiled_impl,
                )

                return packed_cascade_bwd_tiled_impl(
                    x, x_add, s, t, w_qkv, rel_h, rel_w, g, block=block,
                    halo=halo, levels=levels, g=pg[0], slab=pg[1], r=r,
                    interpret=interpret, precision=precision)
            if mode == "packed_front":
                from m2trans_tpu.ops.pallas.halo_attn_packed import (
                    packed_front_bwd_impl,
                )

                return packed_front_bwd_impl(
                    x, x_add, s, t, w_qkv, rel_h, rel_w, g, block=block,
                    halo=halo, levels=levels, g=pg[0], sub=pg[1],
                    slab=pg[2], r=r, interpret=interpret,
                    precision=precision)
            if mode == "banded":
                return _cascade_bwd_impl(
                    x, x_add, s, t, w_qkv, rel_h, rel_w, g, block=block,
                    halo=halo, levels=levels, r=r, interpret=interpret,
                    precision=precision)
            if mode == "tiled":
                return _cascade_bwd_tiled_impl(
                    x, x_add, s, t, w_qkv, rel_h, rel_w, g, block=block,
                    halo=halo, levels=levels, r=r, interpret=interpret,
                    precision=precision)
            _, vjp = jax.vjp(
                lambda *a: _cascade_xla(*a, block=block, halo=halo,
                                        levels=levels, r=r,
                                        precision=precision),
                x, x_add, s, t, w_qkv, rel_h, rel_w)
            return vjp(g)
    else:
        def fwd(x, s, t, w_qkv, rel_h, rel_w, block, halo, levels,
                r, interpret, precision):
            out = _dispatch(x, None, s, t, w_qkv, rel_h, rel_w, block,
                            halo, levels, r, interpret, precision,
                            conservative=True)
            return out, (x, s, t, w_qkv, rel_h, rel_w)

        def bwd(block, halo, levels, r, interpret, precision, res, g):
            x, s, t, w_qkv, rel_h, rel_w = res
            mode, pg = _bwd_mode(x, block, halo, levels)
            if mode == "packed":
                from m2trans_tpu.ops.pallas.halo_attn_packed import (
                    packed_cascade_bwd_impl,
                )

                return packed_cascade_bwd_impl(
                    x, None, s, t, w_qkv, rel_h, rel_w, g, block=block,
                    halo=halo, levels=levels, g=pg, r=r,
                    interpret=interpret, precision=precision)
            if mode == "packed_tiled":
                from m2trans_tpu.ops.pallas.halo_attn_packed import (
                    packed_cascade_bwd_tiled_impl,
                )

                return packed_cascade_bwd_tiled_impl(
                    x, None, s, t, w_qkv, rel_h, rel_w, g, block=block,
                    halo=halo, levels=levels, g=pg[0], slab=pg[1], r=r,
                    interpret=interpret, precision=precision)
            if mode == "packed_front":
                from m2trans_tpu.ops.pallas.halo_attn_packed import (
                    packed_front_bwd_impl,
                )

                return packed_front_bwd_impl(
                    x, None, s, t, w_qkv, rel_h, rel_w, g, block=block,
                    halo=halo, levels=levels, g=pg[0], sub=pg[1],
                    slab=pg[2], r=r, interpret=interpret,
                    precision=precision)
            if mode == "banded":
                return _cascade_bwd_impl(
                    x, None, s, t, w_qkv, rel_h, rel_w, g, block=block,
                    halo=halo, levels=levels, r=r, interpret=interpret,
                    precision=precision)
            if mode == "tiled":
                return _cascade_bwd_tiled_impl(
                    x, None, s, t, w_qkv, rel_h, rel_w, g, block=block,
                    halo=halo, levels=levels, r=r, interpret=interpret,
                    precision=precision)
            _, vjp = jax.vjp(
                lambda xx, ss, tt, ww, rh, rw: _cascade_xla(
                    xx, None, ss, tt, ww, rh, rw, block=block, halo=halo,
                    levels=levels, r=r, precision=precision),
                x, s, t, w_qkv, rel_h, rel_w)
            return vjp(g)

    wrapped.defvjp(fwd, bwd)
    return wrapped


_cascade_fused_add = _make_cascade_fused(True)
_cascade_fused_noadd = _make_cascade_fused(False)


def cftm_branch_fused(x, w_qkv, rel_h, rel_w, s, t, *, x_add=None,
                      r: float = 0.5, block: int = 8, halo: int = 1,
                      levels: int = 0, interpret=None, precision=None):
    """Fused CFTM cascade branch: ``out = B(z) + z`` with
    ``z = (x*s + t) [+ r*x_add]`` and B = DWT^levels -> qkv -> halo
    attention -> IWT^levels — the instance-norm application, cascade
    average, zero halo padding, attention, and residual in ONE kernel
    (reference CFTM.forward :132-164 norm=True path, per branch).

    x: (B, H, W, Cb) raw channel slice; s, t: (B, Cb) f32 per-image affine
    (inv_std, -mean*inv_std, scaled by the cascade's 1/2 where x_add is
    given). Falls back to the XLA composition beyond the VMEM gate."""
    if interpret is None:
        interpret = not _is_tpu_backend()
    if x_add is not None:
        return _cascade_fused_add(x, x_add, s, t, w_qkv, rel_h, rel_w,
                                  block, halo, levels, float(r),
                                  bool(interpret), precision)
    return _cascade_fused_noadd(x, s, t, w_qkv, rel_h, rel_w,
                                block, halo, levels, float(r),
                                bool(interpret), precision)


def _xla_reference(x, w_qkv, rel_h, rel_w, *, block, halo, levels,
                   precision=None):
    """The equivalent XLA composition (used for the backward pass)."""
    for _ in range(levels):
        x = haar_dwt(x)
    qkv = jnp.einsum("bhwc,cd->bhwd", x, w_qkv,
                     preferred_element_type=jnp.float32,
                     precision=precision).astype(x.dtype)
    c = x.shape[-1]
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    out = halo_attention(q, k, v, rel_h, rel_w, block=block, halo=halo,
                         precision=precision)
    for _ in range(levels):
        out = haar_iwt(out)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _halo_attention_fused(x, w_qkv, rel_h, rel_w, block, halo, levels,
                          interpret, precision):
    return _halo_attention_pallas_fwd_impl(x, w_qkv, rel_h, rel_w,
                                           block=block, halo=halo,
                                           levels=levels,
                                           interpret=interpret,
                                           precision=precision)


def _fwd(x, w_qkv, rel_h, rel_w, block, halo, levels, interpret, precision):
    out = _halo_attention_pallas_fwd_impl(x, w_qkv, rel_h, rel_w,
                                          block=block, halo=halo,
                                          levels=levels, interpret=interpret,
                                          precision=precision)
    return out, (x, w_qkv, rel_h, rel_w)


def _bwd(block, halo, levels, interpret, precision, res, g):
    x, w_qkv, rel_h, rel_w = res
    _, vjp = jax.vjp(
        lambda xx, ww, rh, rw: _xla_reference(xx, ww, rh, rw, block=block,
                                              halo=halo, levels=levels,
                                              precision=precision),
        x, w_qkv, rel_h, rel_w)
    return vjp(g)


_halo_attention_fused.defvjp(_fwd, _bwd)


def _is_tpu_backend() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def halo_attention_qkv_fused(x, w_qkv, rel_h, rel_w, *, block: int = 8,
                             halo: int = 1, levels: int = 0, interpret=None,
                             precision=None):
    """Fused DWT^levels -> qkv projection -> halo attention -> IWT^levels.

    x: (B, H, W, Cb) full-resolution branch input with H, W divisible by
    block * 2^levels; w_qkv: (C, 3C) with C = Cb * 4^levels (the 1x1 conv
    weight reshaped, q|k|v column order); rel_h/rel_w:
    (block + 2*halo, C/2). Returns (B, H, W, Cb).
    """
    if interpret is None:
        interpret = not _is_tpu_backend()
    return _halo_attention_fused(x, w_qkv, rel_h, rel_w, block, halo,
                                 levels, bool(interpret), precision)
