"""Phase-plane upsampling tail: the whole tail computed in LR space.

Reimplements the reference tail (models/M2Trans_network.py:40-56) without
ever materializing HR-resolution intermediates:

  x4:   1x1 conv -> PixelShuffle(2) -> GELU (x2 stages) -> 3x3 conv -> RGB
  x2/3: 1x1 conv -> PixelShuffle(s) -> GELU -> 3x3 conv -> RGB

Key identity: PixelShuffle is a relabeling. Keeping the HR image as s*s
LR-grid "phase planes" (HR[s*y+i, s*x+j] = plane (i,j) at LR pixel (y,x)):

  * each 1x1-conv+GELU stage is a flat per-pixel matmul whose output
    channels are the next level's phase planes — no spatial reshuffling,
    channels stay on the TPU lane axis at full width. The second x4 stage
    applies the shared c1 weight to each of the 4 stage-1 groups via a
    block-diagonal (256, 1024) weight: 2x the intrinsic MACs but one flat
    contraction with zero 5-D layout copies (profiled: the 5-D einsum
    formulation cost ~2.3 ms/step in pure layout copies);
  * the final 3x3 HR conv becomes a 3x3 LR-grid conv over the
    (s*s*n_feats)-channel phase tensor with a block-sparse kernel: output
    phase (i,j) tap (dr,dc) reads source phase ((i+dr)%s, (j+dc)%s) at LR
    offset ((i+dr)//s, (j+dc)//s). The 3-channel RGB output that padded
    the MXU lanes 42x in HR space becomes an s*s*3-channel output (48 for
    x4) padded only ~2.7x. The kernel is assembled by one tiny einsum with
    a constant 0/1 selection tensor;
  * phases assemble to pixels ONCE at the very end via the cheap
    block-copy depth-to-space (pixel_shuffle_fast) on the 3-channel
    result.

Reflect-padding semantics match the reference exactly: the HR-space
reflect ring maps to phase-remapped edge columns/rows of the LR phase
tensor (HR[-1] = HR[1] means the pad column's phase-(s-1) channels hold
frame column 0's phase-1 channels, etc). Remaps are channel gathers on
the 1-pixel-wide edge slices only; the bulk tensor stays 4-D.

This is the bf16 fast path; f32 parity mode keeps the original
conv->shuffle composition (bit-stable against the golden files — this
formulation changes f32 summation order by ~1 ulp).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from jax import lax

from m2trans_tpu.ops.conv import gelu_exact
from m2trans_tpu.ops.pixel_shuffle import pixel_shuffle_fast, ps_weight_perm

Params = Dict[str, Any]

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _phase_layout(scale: int) -> np.ndarray:
    """L[pi, pj] -> channel-block index of HR phase (pi, pj) in the stage
    output layout.

    Single stage (x2/x3): stage output channels are ordered (i, j, c)
    (ps_weight_perm), so L[pi, pj] = pi*s + pj. Two x2 stages (x4): stage 1
    emits groups (a, b); stage 2 maps group (a, b) to phases
    (2a+c, 2b+d) with within-group order (c, d), giving layout index
    ((a*2+b)*4 + c*2+d)."""
    if scale == 4:
        L = np.empty((4, 4), np.int32)
        for pi in range(4):
            for pj in range(4):
                a, c = divmod(pi, 2)
                b, d = divmod(pj, 2)
                L[pi, pj] = (a * 2 + b) * 4 + c * 2 + d
        return L
    return np.arange(scale * scale, dtype=np.int32).reshape(scale, scale)


@functools.lru_cache(maxsize=None)
def _k_selector(scale: int) -> np.ndarray:
    """Constant 0/1 tensor M[yo+1, xo+1, src_block, dr+1, dc+1, out_phase]
    encoding the phase-space rewrite of the 3x3 HR conv; the conv kernel is
    K = einsum('abpdeq,deio->abpiqo', M, w3x3)."""
    s = scale
    L = _phase_layout(s)
    P = s * s
    M = np.zeros((3, 3, P, 3, 3, P), np.float32)
    for i in range(s):
        for j in range(s):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    pi, yo = (i + dr) % s, (i + dr) // s
                    pj, xo = (j + dc) % s, (j + dc) // s
                    M[yo + 1, xo + 1, L[pi, pj], dr + 1, dc + 1,
                      i * s + j] = 1.0
    return M


def _remap_edge(edge, src_of_dst: np.ndarray, nf: int):
    """Phase-block remap of a thin edge slice. ``edge``: (..., P*nf);
    returns same shape where block k holds block src_of_dst[k] (zeros where
    src_of_dst[k] < 0)."""
    P = src_of_dst.shape[0]
    idx = np.where(src_of_dst < 0, 0, src_of_dst)
    mask = (src_of_dst >= 0).astype(np.float32)
    v = edge.reshape(edge.shape[:-1] + (P, nf))
    out = v[..., idx, :] * jnp.asarray(mask, edge.dtype)[:, None]
    return out.reshape(edge.shape)


def tail_phase_weights(p: Params, *, scale: int, dtype=jnp.bfloat16,
                       precision=None):
    """(w0, b0, w1, b1, K) for the phase-plane pipeline: ps-permuted stage
    weights and the selector-expanded block-sparse 3x3 kernel. For
    scale != 4, w1/b1 are unused placeholders (w0/b0 repeated)."""
    nf = p["c0"]["w"].shape[-2]

    def stage_w(sp, r):
        w = sp["w"].reshape(sp["w"].shape[-2], sp["w"].shape[-1])
        perm = ps_weight_perm(w.shape[1] // (r * r), r)
        return w[:, perm].astype(dtype), sp["b"][perm].astype(dtype)

    if scale == 4:
        w0, b0 = stage_w(p["c0"], 2)
        w1, b1 = stage_w(p["c1"], 2)
        w_last = p["c2"]["w"]
    else:
        w0, b0 = stage_w(p["c0"], scale)
        w1, b1 = w0, b0
        w_last = p["c1"]["w"]
    P = scale * scale
    M = jnp.asarray(_k_selector(scale), dtype)
    K = jnp.einsum("abpdeq,deio->abpiqo", M, w_last.astype(dtype),
                   precision=precision).reshape(3, 3, P * nf, P * 3)
    return w0, b0, w1, b1, K


def _stage_pipeline(x, w0, b0, w1, b1, *, scale: int, nf: int,
                    precision=None):
    """Per-pixel phase stages on an arbitrary (thin) NHWC slice."""
    def stage(z, w, b):
        flat = z.reshape(-1, z.shape[-1])
        out = lax.dot_general(flat, w, (((1,), (0,)), ((), ())),
                              precision=precision,
                              preferred_element_type=w.dtype)
        return gelu_exact(out + b).reshape(z.shape[:-1] + (w.shape[1],))

    y = stage(x, w0, b0)
    if scale == 4:
        flat = y.reshape(-1, nf)
        out = lax.dot_general(flat, w1, (((1,), (0,)), ((), ())),
                              precision=precision,
                              preferred_element_type=w1.dtype)
        y = gelu_exact(out + b1).reshape(y.shape[:-1] + (16 * nf,))
    return y


def phase_edges(p: Params, x: jnp.ndarray, *, scale: int,
                dtype=jnp.bfloat16, precision=None, pad_rows: int = 0):
    """Precompute the HR-reflect phase-remapped pad slices on 1-px-thin
    slices of the body output ``x`` (B, H, W, nf), for the fused band
    kernel (ops/pallas/tail_band.py):

      left/right: (B, pad_rows or H+2, 1, P*nf) f32 — the remapped pad
        COLUMNS indexed by padded-phase-row (row 0/last belong to the
        remapped top/bottom rows and are provided there instead);
      top/bottom: (B, 1, W+2, P*nf) f32 — the remapped pad ROWS including
        their corner columns.
    """
    nf = x.shape[-1]
    s = scale
    w0, b0, w1, b1, _ = tail_phase_weights(p, scale=scale, dtype=dtype,
                                           precision=precision)
    L = _phase_layout(s)
    P = s * s

    def col_map(dst_pj, src_pj):
        m = -np.ones(P, np.int64)
        for pi in range(s):
            m[L[pi, dst_pj]] = L[pi, src_pj]
        return m

    def row_map(dst_pi, src_pi):
        m = -np.ones(P, np.int64)
        for pj in range(s):
            m[L[dst_pi, pj]] = L[src_pi, pj]
        return m

    stage = lambda z: _stage_pipeline(  # noqa: E731
        z.astype(dtype), w0, b0, w1, b1, scale=scale, nf=nf,
        precision=precision)

    # pad columns from the frame's first/last interior columns
    left = _remap_edge(stage(x[:, :, :1]), col_map(s - 1, 1), nf)
    right = _remap_edge(stage(x[:, :, -1:]), col_map(0, s - 2), nf)

    # pad rows: W-pad the frame's first/last interior rows first (so the
    # row remap also covers the corners), then relabel
    def padded_row(row):
        phr = stage(row)  # (B, 1, W, P*nf)
        lcr = _remap_edge(phr[:, :, :1], col_map(s - 1, 1), nf)
        rcr = _remap_edge(phr[:, :, -1:], col_map(0, s - 2), nf)
        return jnp.concatenate([lcr, phr, rcr], axis=2)

    top = _remap_edge(padded_row(x[:, :1]), row_map(s - 1, 1), nf)
    bot = _remap_edge(padded_row(x[:, -1:]), row_map(0, s - 2), nf)

    # index left/right by padded-phase-row: row 0 unused (top row supplies
    # it), rows 1..H hold the interior columns, row H+1 unused
    zrow = jnp.zeros_like(left[:, :1])
    left = jnp.concatenate([zrow, left, zrow], axis=1)
    right = jnp.concatenate([zrow, right, zrow], axis=1)
    if pad_rows and pad_rows > left.shape[1]:
        extra = pad_rows - left.shape[1]
        left = jnp.pad(left, ((0, 0), (0, extra), (0, 0), (0, 0)))
        right = jnp.pad(right, ((0, 0), (0, extra), (0, 0), (0, 0)))
    f32 = jnp.float32
    return (left.astype(f32), right.astype(f32), top.astype(f32),
            bot.astype(f32))


def tail_phase_apply(p: Params, x: jnp.ndarray, *, scale: int,
                     dtype=jnp.bfloat16, precision=None) -> jnp.ndarray:
    """(B, H, W, nf) -> (B, H*scale, W*scale, 3), unclamped (same contract
    as tail_apply's conv composition)."""
    nf = x.shape[-1]
    s = scale
    bsz, h, wd = x.shape[:3]

    def stage_w(sp, r):
        w = sp["w"].reshape(sp["w"].shape[-2], sp["w"].shape[-1])
        perm = ps_weight_perm(w.shape[1] // (r * r), r)
        return w[:, perm].astype(dtype), sp["b"][perm].astype(dtype)

    # NOTE: the per-pixel stage contractions are written as explicit
    # flatten -> dot_general -> unflatten rather than einsum: the einsum
    # lowering chose a batch-minor operand layout ({3,0,2,1}) and XLA
    # inserted ~2.6 ms/step of pure layout copies around the tail boundary
    # (profiled on v5e); the merged (B*H*W, C) dot keeps the standard NHWC
    # layout on both sides.
    def stage(z, w, b):
        flat = z.reshape(-1, z.shape[-1])
        out = lax.dot_general(flat, w, (((1,), (0,)), ((), ())),
                              precision=precision,
                              preferred_element_type=dtype)
        return gelu_exact(out + b).reshape(z.shape[:-1] + (w.shape[1],))

    if s == 4:
        w0, b0 = stage_w(p["c0"], 2)
        w1, b1 = stage_w(p["c1"], 2)
        w_last = p["c2"]["w"]
        y = stage(x.astype(dtype), w0, b0)  # (B,H,W,256)
        # shared c1 applied to each of the 4 stage-1 groups by folding the
        # group index into rows: (..., 4*nf) -> (...*4, nf) is a contiguous
        # row-major relabeling (free bitcast), so one (4BHW, nf)@(nf, 4nf)
        # dot does the intrinsic MACs — 4x fewer than the block-diagonal
        # (256,1024) contraction this replaces, and group-major output
        # channel order (g*4nf + ...) is preserved by the inverse reshape.
        flat = y.reshape(-1, nf)
        out = lax.dot_general(flat, w1, (((1,), (0,)), ((), ())),
                              precision=precision,
                              preferred_element_type=dtype)
        y = gelu_exact(out + b1).reshape(y.shape[:-1] + (16 * nf,))
    else:
        w0, b0 = stage_w(p["c0"], s)
        w_last = p["c1"]["w"]
        y = stage(x.astype(dtype), w0, b0)  # (B,H,W,s*s*nf)

    L = _phase_layout(s)
    P = s * s

    def col_map(dst_pj, src_pj):
        m = -np.ones(P, np.int64)
        for pi in range(s):
            m[L[pi, dst_pj]] = L[pi, src_pj]
        return m

    def row_map(dst_pi, src_pi):
        m = -np.ones(P, np.int64)
        for pj in range(s):
            m[L[dst_pi, pj]] = L[src_pi, pj]
        return m

    # HR reflect ring in phase space: HR col -1 = HR col 1 = phase 1 of LR
    # col 0 (read only through source phase s-1 of LR col -1); HR col s*W
    # = HR col s*W-2 = phase s-2 of LR col W-1 (read through phase 0).
    left = _remap_edge(y[:, :, :1], col_map(s - 1, 1), nf)
    right = _remap_edge(y[:, :, -1:], col_map(0, s - 2), nf)
    y = jnp.concatenate([left, y, right], axis=2)
    top = _remap_edge(y[:, :1], row_map(s - 1, 1), nf)
    bot = _remap_edge(y[:, -1:], row_map(0, s - 2), nf)
    y = jnp.concatenate([top, y, bot], axis=1)

    # Block-sparse phase-space kernel for the final 3x3 HR conv.
    M = jnp.asarray(_k_selector(s), dtype)
    K = jnp.einsum("abpdeq,deio->abpiqo", M, w_last.astype(dtype),
                   precision=precision).reshape(3, 3, P * nf, P * 3)
    out = lax.conv_general_dilated(
        y, K, window_strides=(1, 1), padding="VALID",
        dimension_numbers=_DIMSPEC, precision=precision)
    # out channel (i*s + j)*3 + rgb == pixel_shuffle_fast's expected
    # (i*r + j)*C + c order with C=3
    return pixel_shuffle_fast(out, s)
