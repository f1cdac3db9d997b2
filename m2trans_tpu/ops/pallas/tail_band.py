"""Fused phase-plane upsampling tail — Pallas TPU band kernel.

Computes the whole reference tail (models/M2Trans_network.py:40-56 —
1x1-conv/PixelShuffle/GELU stage(s) then the final 3x3 reflect conv) in
LR space, one 8-row LR band per grid step, without ever materializing the
(B, H, W, s*s*n_feats) phase tensor in HBM.

Why a kernel: the XLA phase-plane formulation (ops/tail_phase.py) streams
~600 MB/step through HBM at the flagship shape — the 151 MB bf16 phase
tensor is written once and relaid out twice more (profiled v5e: ~1.5
ms/step of pure layout copies, plus enough DMA pressure to stall the
branch kernels' input pipelines). Here each grid step reads an 8-row
(+1 halo) LR band of the 64-channel body output, runs the stage matmuls
and the 3x3 phase-space conv on the MXU entirely in VMEM, and writes only
the (8, W, s*s*3) HR phase-plane band; phases assemble to pixels once, in
XLA, via the block-copy depth-to-space.

Semantics (bit-comparable to tail_phase_apply, which is parity-tested
against the conv->shuffle composition):
  * stage contractions use the ps-permuted weights so stage outputs are
    phase-ordered; the shared x4 stage-2 weight is applied by folding the
    4 stage-1 groups into rows (contiguous reshape);
  * the final 3x3 HR reflect conv is the 3x3 LR-grid conv with the
    selector-expanded block-sparse kernel K (built in XLA, tiny einsum);
  * HR reflect edges: the phase-remapped pad columns/rows are precomputed
    in XLA on 1-pixel-thin slices (phase_edges below) and passed in; the
    kernel splices them into each band (rows only at the frame's first
    and last band, under pl.when);
  * GELU is exact-erf via the Abramowitz-Stegun 7.1.26 rational
    approximation (max abs err 1.5e-7 — far below bf16 resolution);
    Mosaic has no erf lowering.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m2trans_tpu.ops.pixel_shuffle import pixel_shuffle_fast

Params = Dict[str, Any]

_BLOCK = 8  # LR rows per band

# phase-conv formulation (all exact):
#   False  — 9 per-tap dots (N=P*3=48, padded 2.7x on the MXU);
#   True   — single tap-packed dot (N=9*P*3) + 9 shifted SLICE-adds:
#            measured a wash (ab_candidates, device-loop) — the 48-lane
#            slice offsets are lane-MISALIGNED, so every add runs
#            masked sub-register VPU copies that eat the MXU saving;
#   "roll" — single tap-packed dot + lane-ROTATE reduction: tap t's
#            48-col block is rotated to lanes 0:48 (pltpu.roll, a
#            full-width crossbar op) and accumulated at full occupancy;
#            one final :48 slice. Same MXU shape as True (~2x fewer
#            tile-units than False) without the misaligned adds.
#
# r5: default is the per-tap form — the only one hardware-validated at
# the flagship (42680dd bench 187.1 MP/s; real scoped VMEM measured
# via compiler_options trick, scripts/calibrate_vmem.py). The r4
# snapshot shipped "roll" unbenched and it OOMs scoped VMEM on v5e
# (16.45M vs the 16.00M ceiling, BENCH_r04 rc=1). Do not flip this
# without (a) updating _tail_band_fits' mode terms and (b) an on-HW
# compile + bench at the flagship shape.
_TAP_PACKED = False

# ABLATION ONLY (wrong values, dataflow preserved): names of kernel
# stages to null out, for intra-kernel cost attribution through
# scripts/ab_tail_parts.py — {"stage0", "stage1", "gelu", "phconv",
# "edges"}.
_ABLATE = frozenset()

# Phase-band staging dtype (scripts/ab_tail4.py, exact either way):
# True (default) keeps the band f32 with per-window bf16 casts; the
# one-bf16-cast-before-pad/splice variant measured +0.16 ms/step SLOWER
# in-model on the device-loop instrument — Mosaic's bf16 pad/where/
# slice sequences cost more than the nine window casts they replace
# (which overlap under the MXU dots anyway).
_BAND_F32 = True


# Odd minimax-style polynomial erf: x * P7(x^2) on |x| <= 3, clamped
# outside (erf(3) = 1 - 2.2e-5). Max abs err 9.6e-5 over all x — below
# bf16 output resolution (~4e-3 at |gelu|~1), so the bf16 goldens hold.
# Replaces Abramowitz-Stegun 7.1.26: the A-S form needs exp(-x^2) and a
# reciprocal per element (Mosaic has no erf lowering and its exp is a
# multi-op VPU sequence); this is 8 FMAs + a clamp. Fit:
# weighted LSQ on a cosine-density grid over [0, 3] (see commit).
_ERF_C = (1.127951546290967, -0.37335247219250917, 0.1077966812075792,
          -0.022705855038609238, 0.0033201251178695042,
          -0.0003143716576193937, 1.711888408836955e-05,
          -4.0375060964086e-07)


def _erf(x):
    """Polynomial erf (max abs err 9.6e-5; see _ERF_C)."""
    xc = jnp.clip(x, -3.0, 3.0)
    u = xc * xc
    p = jnp.float32(_ERF_C[-1])
    for c in _ERF_C[-2::-1]:
        p = p * u + jnp.float32(c)
    return xc * p


# A fused degree-5 gelu polynomial (x * (0.5 + t*Q(t^2))) was tried and
# measured a wash in-model (scripts/ab_tail.py, ABBA paired deltas:
# +0.08 ms vs this erf form; removing GELU entirely recovers only
# ~0.33 ms/step) — the erf form stays for its 9.6e-5 accuracy.
def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(y_a, y_b, lc_ref, rc_ref, top_ref, bot_ref, w0_ref, b0_ref,
            w1_ref, b1_ref, k_ref, out_ref, *, nf: int, scale: int,
            nh: int, w: int, rgb_range: float, precision,
            tap_packed: bool):
    i = pl.program_id(1)
    P = scale * scale
    cp = P * nf

    band = jnp.concatenate([y_a[0], y_b[0, :2]], axis=0)  # (10, W, nf)
    rows = band.shape[0]
    gelu = (lambda v: v) if "gelu" in _ABLATE else _gelu

    # stage pipeline -> (10, W, P*nf) phase band (f32 — Mosaic strided /
    # small-dim value ops are 32-bit-safe; the dots run single-pass
    # regardless under default precision)
    flat = band.reshape(rows * w, nf)
    if "stage0" in _ABLATE:  # ablation: channel-tile instead of the dot
        h = jnp.concatenate(
            [flat.astype(jnp.float32)] * (w0_ref.shape[1] // nf), axis=-1)
    else:
        h = jnp.dot(flat, w0_ref[:], preferred_element_type=jnp.float32,
                    precision=precision)
        h = gelu(h + b0_ref[:].astype(jnp.float32))
    if scale == 4:
        if "stage1" in _ABLATE:  # ablation: channel-tile
            h = jnp.concatenate([h] * 4, axis=-1)
        else:
            # shared c1 on each stage-1 group: Mosaic rejects lane-
            # splitting reshapes outright (any dtype), so apply it as
            # four group dots over static lane slices — K=64-clean,
            # intrinsic MACs only
            b1f = b1_ref[:].astype(jnp.float32)
            hb = h.astype(band.dtype)  # one cast; slices below are free
            parts = []
            for grp in range(4):
                hg = hb[:, grp * nf:(grp + 1) * nf]
                og = jnp.dot(hg, w1_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=precision)
                parts.append(gelu(og + b1f))
            h = jnp.concatenate(parts, axis=-1)
    # One f32 -> bf16 cast for the whole phase band, BEFORE pad/splice:
    # the dots consumed bf16 windows anyway, and cast commutes with
    # slice/pad/where (edges are cast identically), so values are
    # unchanged — but the nine per-window casts of the f32 band (~0.75M
    # elements each) collapse to one (device-loop tail attribution,
    # scripts/ab_tail3.py: phconv 1.26 ms/step was ~0.4 ms above its
    # N-pad MXU floor, mostly this staging). _BAND_F32 restores the f32
    # band for A/B (scripts/ab_tail4.py). In tap-roll mode the band is
    # ALWAYS bf16: its only consumer is the single tap-packed dot (which
    # casts anyway, so values are identical), and the f32 band plus the
    # (rows, W+2, 9*P*3) tap tensor exceed the 16M scoped-VMEM ceiling
    # by ~0.5M (observed 16.45M); same for the slice-add variant.
    band_f32 = _BAND_F32 and not tap_packed
    mid = (h if band_f32 else h.astype(band.dtype)).reshape(rows, w, cp)

    # splice the precomputed reflect-remapped edge columns, then the
    # top/bottom remapped rows on the frame's first/last band
    ph = jnp.pad(mid, ((0, 0), (1, 1), (0, 0)))
    if "edges" not in _ABLATE:
        lc = lc_ref[0, pl.ds(i * _BLOCK, rows), :].astype(ph.dtype)
        rc = rc_ref[0, pl.ds(i * _BLOCK, rows), :].astype(ph.dtype)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, w + 2, 1), 1)
        ph = jnp.where(col_ids == 0, lc[:, None, :], ph)
        ph = jnp.where(col_ids == w + 1, rc[:, None, :], ph)

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
        ph = jnp.where((i == 0) & (row_ids == 0),
                       top_ref[0, 0][None].astype(ph.dtype), ph)
        ph = jnp.where((i == nh - 1) & (row_ids == rows - 1),
                       bot_ref[0, 0][None].astype(ph.dtype), ph)

    if "phconv" in _ABLATE:  # ablation: cheap slice instead of the conv
        acc = ph[1:1 + _BLOCK, 1:1 + w, :P * 3].reshape(_BLOCK * w, P * 3)
    elif tap_packed == "roll":
        # single tap-packed dot (N=9*P*3), then rotate each tap's block
        # to lanes [0, P*3) and accumulate at full lane occupancy (the
        # rotation drags other taps' columns into lanes >= P*3 — summed
        # garbage there, sliced away at the end). See _TAP_PACKED.
        rows_p, wp2 = ph.shape[0], ph.shape[1]
        n9 = 9 * P * 3
        u = jnp.dot(ph.reshape(rows_p * wp2, cp).astype(band.dtype),
                    k_ref[:], preferred_element_type=jnp.float32,
                    precision=precision).reshape(rows_p, wp2, n9)
        acc3 = None
        for dr in range(3):
            for dc in range(3):
                t = dr * 3 + dc
                sl = u[dr:dr + _BLOCK, dc:dc + w]
                r = sl if t == 0 else pltpu.roll(sl, n9 - P * 3 * t, 2)
                acc3 = r if acc3 is None else acc3 + r
        acc = acc3[:, :, :P * 3].reshape(_BLOCK * w, P * 3)
    elif tap_packed:
        # 3x3 phase-space conv, VALID over the (10, W+2) band -> (8, W).
        # ONE dot with the 9 taps packed onto the N axis, then 9 shifted
        # slice-adds: the per-tap N=P*3 (48 at x4) padded 2.7x on the MXU
        # and the 9 separate dots were most of the kernel's time; the
        # tap-packed N=9*P*3 (432 -> 512 pad) runs ~1.8x fewer
        # MXU-tile-equivalents.
        rows_p, wp2 = ph.shape[0], ph.shape[1]
        u = jnp.dot(ph.reshape(rows_p * wp2, cp).astype(band.dtype),
                    k_ref[:], preferred_element_type=jnp.float32,
                    precision=precision).reshape(rows_p, wp2, 9 * P * 3)
        acc = jnp.zeros((_BLOCK, w, P * 3), jnp.float32)
        for dr in range(3):
            for dc in range(3):
                t = (dr * 3 + dc) * P * 3
                acc = acc + u[dr:dr + _BLOCK, dc:dc + w, t:t + P * 3]
        acc = acc.reshape(_BLOCK * w, P * 3)
    else:
        acc = jnp.zeros((_BLOCK * w, P * 3), jnp.float32)
        for dr in range(3):
            for dc in range(3):
                win = ph[dr:dr + _BLOCK, dc:dc + w].reshape(_BLOCK * w, cp)
                acc = acc + jnp.dot(win.astype(band.dtype), k_ref[dr, dc],
                                    preferred_element_type=jnp.float32,
                                    precision=precision)
    out = jnp.clip(acc, 0.0, rgb_range)
    out_ref[0] = out.reshape(_BLOCK, w, P * 3).astype(out_ref.dtype)


def tail_band_fused(y, w0, b0, w1, b1, k, lc, rc, top, bot, *, scale: int,
                    rgb_range: float, interpret: bool, precision=None,
                    tap_packed: bool = True):
    """(B, H, W, nf) body output -> (B, H, W, s*s*3) clamped HR phase
    planes. H, W multiples of 8 (guaranteed by the model's pad-to-32)."""
    bsz, hh, w, nf = y.shape
    nh = hh // _BLOCK
    P = scale * scale

    # edge-copy one row each side (their phase rows are what the H-remap
    # relabels), then zero-pad so the i+1 block view stays in range
    yp = jnp.pad(y, ((0, 0), (1, 0), (0, 0), (0, 0)), mode="edge")
    yp = jnp.pad(yp, ((0, 0), (0, (nh + 2) * _BLOCK - yp.shape[1]),
                      (0, 0), (0, 0)), mode="edge")

    if tap_packed:
        # tap-packed phase-conv weight: (3, 3, cp, P*3) -> (cp, 9*P*3)
        # with N index (dr*3+dc)*P*3 + c (see the kernel's slice-add)
        k = k.transpose(2, 0, 1, 3).reshape(P * nf, 9 * P * 3)

    kern = functools.partial(_kernel, nf=nf, scale=scale, nh=nh, w=w,
                             rgb_range=rgb_range, precision=precision,
                             tap_packed=tap_packed)
    band = lambda off: pl.BlockSpec(  # noqa: E731
        (1, _BLOCK, w, nf), lambda b, i, o=off: (b, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: (b,) + (0,) * (len(shp) - 1),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: tuple(0 for _ in shp), memory_space=pltpu.VMEM)

    cp = P * nf
    return pl.pallas_call(
        kern,
        grid=(bsz, nh),
        in_specs=[
            band(0), band(1),
            # edge columns carried as (B, rows, cp) 3-D — a trailing
            # (1, cp) block would sublane-pad 8x in VMEM, making the edge
            # operands scale as 8*H*cp*4 bytes on tall frames (ADVICE r2)
            full((1, (nh + 1) * _BLOCK, cp)),      # left col (yph rows)
            full((1, (nh + 1) * _BLOCK, cp)),      # right col
            full((1, 1, w + 2, cp)),               # top remapped row
            full((1, 1, w + 2, cp)),               # bottom remapped row
            const(w0.shape), const(b0.shape),
            const(w1.shape), const(b1.shape),
            const(k.shape),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK, w, P * 3),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hh, w, P * 3), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(bsz * hh * w * (nf * cp * (2 if scale == 4 else 1)
                                      + 9 * cp * P * 3) * 2),
            bytes_accessed=int(2 * (y.size + bsz * hh * w * P * 3)),
            transcendentals=int(bsz * hh * w * cp)),
        interpret=interpret,
    )(yp, yp, lc, rc, top, bot, w0, b0, w1, b1, k)


def _is_tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _tail_band_impl(p: Params, x: jnp.ndarray, scale: int,
                    rgb_range: float, dtype, precision,
                    interpret) -> jnp.ndarray:
    from m2trans_tpu.ops.tail_phase import phase_edges, tail_phase_weights

    w0, b0, w1, b1, k = tail_phase_weights(p, scale=scale, dtype=dtype,
                                           precision=precision)
    x = x.astype(dtype)
    lc, rc, top, bot = phase_edges(p, x, scale=scale, dtype=dtype,
                                   precision=precision,
                                   pad_rows=(x.shape[1] // _BLOCK + 1)
                                   * _BLOCK)
    lc, rc = lc[:, :, 0, :], rc[:, :, 0, :]  # (B, rows, cp)
    out = tail_band_fused(x, w0, b0, w1, b1, k, lc, rc, top, bot,
                          scale=scale, rgb_range=rgb_range,
                          interpret=interpret, precision=precision,
                          tap_packed=_TAP_PACKED)
    return pixel_shuffle_fast(out, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _tail_band(p, x, scale, rgb_range, dtype, precision, interpret):
    return _tail_band_impl(p, x, scale, rgb_range, dtype, precision,
                           interpret)


def _tail_band_fwd(p, x, scale, rgb_range, dtype, precision, interpret):
    out = _tail_band_impl(p, x, scale, rgb_range, dtype, precision,
                          interpret)
    return out, (p, x)


def _tail_band_bwd(scale, rgb_range, dtype, precision, interpret, res, g):
    p, x = res
    if _tail_bwd_fits(x.shape[1], x.shape[2], scale, x.shape[-1]):
        return _tail_band_bwd_pallas(scale, rgb_range, dtype, precision,
                                     interpret, p, x, g)
    # fallback: backward through the mathematically identical XLA
    # composition (the clamp belongs to the function here, matching the
    # model's semantics; the outer clamp in m2trans_apply is an
    # idempotent no-op on values already inside the range and passes
    # unit gradient there)
    from m2trans_tpu.ops.tail_phase import tail_phase_apply

    def f(pp, xx):
        y = tail_phase_apply(pp, xx, scale=scale, dtype=dtype,
                             precision=precision)
        return jnp.clip(y, 0.0, rgb_range)

    _, vjp = jax.vjp(f, p, x)
    return vjp(g)


def _tail_band_bwd_pallas(scale, rgb_range, dtype, precision, interpret,
                          p, x, g):
    """Band-kernel backward: in-VMEM recompute + adjoint (see module
    header). Weight grads leave in the permuted/selector-expanded layout
    and transpose back through jax.vjp of tail_phase_weights; edge grads
    through jax.vjp of phase_edges; dy through the row overlap-add plus
    the edge-pad adjoints."""
    from m2trans_tpu.ops.tail_phase import phase_edges, tail_phase_weights

    nh = x.shape[1] // _BLOCK
    pad_rows = (nh + 1) * _BLOCK
    xd = x.astype(dtype)

    (w0, b0, w1, b1, k), wvjp = jax.vjp(
        lambda pp: tail_phase_weights(pp, scale=scale, dtype=dtype,
                                      precision=precision), p)
    (lc4, rc4, top, bot), evjp = jax.vjp(
        lambda pp, xx: phase_edges(pp, xx, scale=scale, dtype=dtype,
                                   precision=precision,
                                   pad_rows=pad_rows), p, xd)
    lc, rc = lc4[:, :, 0, :], rc4[:, :, 0, :]

    g_ps = _ps_adjoint(g, scale)
    (dy, dw0, db0, dw1, db1, dk, dlc, drc, dtop,
     dbot) = tail_band_bwd_fused(
        xd, g_ps, w0, b0, w1, b1, k, lc, rc, top, bot, scale=scale,
        rgb_range=rgb_range, interpret=interpret, precision=precision)

    (dp_w,) = wvjp((dw0.astype(w0.dtype), db0.astype(b0.dtype),
                    dw1.astype(w1.dtype), db1.astype(b1.dtype),
                    dk.astype(k.dtype)))
    dp_e, dx_e = evjp((dlc[:, :, None, :].astype(lc4.dtype),
                       drc[:, :, None, :].astype(rc4.dtype),
                       dtop.astype(top.dtype), dbot.astype(bot.dtype)))
    dp = jax.tree_util.tree_map(lambda a, b: a + b, dp_w, dp_e)
    dx = dy.astype(x.dtype) + dx_e.astype(x.dtype)
    return dp, dx


_tail_band.defvjp(_tail_band_fwd, _tail_band_bwd)


def tail_band_apply(p: Params, x: jnp.ndarray, *, scale: int,
                    rgb_range: float, dtype=jnp.bfloat16, precision=None,
                    interpret=None) -> jnp.ndarray:
    """Full fused-tail path: XLA thin-edge precompute + band kernel + one
    depth-to-space. Output is already clamped to [0, rgb_range].
    Differentiable: the VJP runs through the XLA phase composition."""
    if interpret is None:
        interpret = not _is_tpu_backend()
    return _tail_band(p, x, scale, rgb_range, dtype, precision,
                      bool(interpret))


# ---------------------------------------------------------------------------
# Pallas BACKWARD for the fused tail (late round 3): the XLA vjp through
# tail_phase_apply costs ~8-9 ms/step at the flagship shape — it streams
# the (B, H, W, P*nf) phase tensor through HBM twice (forward recompute +
# adjoint). This band kernel recomputes the stage pipeline and the
# pre-clip conv output in VMEM per 8-row band, then walks the adjoint:
# clip mask -> 9-tap conv transpose (dK accumulation + shifted dph adds)
# -> edge-splice adjoints (dlc/drc/dtop/dbot collected, folded outside)
# -> stage GELU'/dot transposes -> dy extended bands (row overlap-add in
# XLA). Weight grads leave in the PERMUTED/selector-expanded layout and
# transpose back through jax.vjp(tail_phase_weights); edge grads route
# through jax.vjp(phase_edges).
# ---------------------------------------------------------------------------


def _gelu_grad(pre):
    """d gelu(x) / dx at x = pre (exact-erf form, polynomial erf)."""
    inv_sqrt2 = 0.7071067811865476
    c = 0.3989422804014327  # 1/sqrt(2*pi)
    return (0.5 * (1.0 + _erf(pre * inv_sqrt2))
            + pre * c * jnp.exp(-0.5 * pre * pre))


def _bwd_recompute_kernel(y_a, y_b, g_ref, lc_ref, rc_ref, top_ref,
                          bot_ref, w0_ref, b0_ref, w1_ref, b1_ref, k_ref,
                          ph_ref, gm_ref, *, nf: int, scale: int,
                          nh: int, w: int, rgb_range: float, precision):
    """Tail backward 1/4: recompute the spliced phase band and the
    clip-masked cotangent; both leave as bf16 HBM tiles (~19 MB/step at
    the flagship shape — the scoped-VMEM relief of splitting the adjoint
    into four slim kernels is worth the ~0.1 ms of extra DMA: the
    monolithic kernel measured 18.5-23M scoped vs the 16M ceiling).

    Note (ADVICE r4): this recompute always uses the nine per-tap N=P*3
    dots, matching the default _TAP_PACKED=False forward exactly. If a
    tap-packed forward (True/"roll", one N=9*P*3 dot) is ever made the
    default, its different f32 accumulation order could flip the clip
    mask on exact-boundary elements (measure-zero for continuous inputs)
    — make this recompute use the same tap-packed dot in that change."""
    i = pl.program_id(1)
    P = scale * scale
    cp = P * nf

    band = jnp.concatenate([y_a[0], y_b[0, :2]], axis=0)  # (10, W, nf)
    rows = band.shape[0]

    # forward recompute to the spliced phase band (bf16 end to end — the
    # forward kernel casts at dot time, so values are bit-identical)
    flat = band.reshape(rows * w, nf)
    h0 = jnp.dot(flat, w0_ref[:], preferred_element_type=jnp.float32,
                 precision=precision) + b0_ref[:].astype(jnp.float32)
    h1 = _gelu(h0).astype(band.dtype)
    if scale == 4:
        b1f = b1_ref[:].astype(jnp.float32)
        parts = []
        for grp in range(4):
            hg = h1[:, grp * nf:(grp + 1) * nf]
            og = jnp.dot(hg, w1_ref[:], preferred_element_type=jnp.float32,
                         precision=precision) + b1f
            parts.append(_gelu(og).astype(band.dtype))
        hs2 = jnp.concatenate(parts, axis=-1)
    else:
        hs2 = h1
    mid = hs2.reshape(rows, w, cp)

    ph = jnp.pad(mid, ((0, 0), (1, 1), (0, 0)))
    # unit-dim inserts happen in f32 and cast AFTER: Mosaic rejects the
    # bf16 (rows, cp) -> (rows, 1, cp) shape cast at small lane counts
    lc = lc_ref[0, pl.ds(i * _BLOCK, rows), :][:, None, :] \
        .astype(band.dtype)
    rc = rc_ref[0, pl.ds(i * _BLOCK, rows), :][:, None, :] \
        .astype(band.dtype)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, w + 2, 1), 1)
    ph = jnp.where(col_ids == 0, lc, ph)
    ph = jnp.where(col_ids == w + 1, rc, ph)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    ph = jnp.where((i == 0) & (row_ids == 0),
                   top_ref[0, 0][None].astype(band.dtype), ph)
    ph = jnp.where((i == nh - 1) & (row_ids == rows - 1),
                   bot_ref[0, 0][None].astype(band.dtype), ph)
    ph_ref[0, 0] = ph

    acc = jnp.zeros((_BLOCK * w, P * 3), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            win = ph[dr:dr + _BLOCK, dc:dc + w].reshape(_BLOCK * w, cp)
            acc = acc + jnp.dot(win, k_ref[dr, dc],
                                preferred_element_type=jnp.float32,
                                precision=precision)

    # clip adjoint (jnp.clip vjp semantics: pass on min <= x <= max)
    g_band = g_ref[0].reshape(_BLOCK * w, P * 3).astype(jnp.float32)
    mask = ((acc >= 0.0) & (acc <= rgb_range)).astype(jnp.float32)
    gm_ref[0] = (g_band * mask).astype(gm_ref.dtype).reshape(
        _BLOCK, w, P * 3)


def _bwd_dk_kernel(ph_ref, gm_ref, dk_ref, *, nf: int, scale: int,
                   w: int, precision):
    """Tail backward 2/4: dK[tap] += win^T @ gm over the band grid."""
    P = scale * scale
    cp = P * nf
    b = pl.program_id(0)
    i = pl.program_id(1)
    ph = ph_ref[0, 0]
    gm = gm_ref[0].reshape(_BLOCK * w, P * 3)
    first = (b == 0) & (i == 0)
    for dr in range(3):
        for dc in range(3):
            win = ph[dr:dr + _BLOCK, dc:dc + w].reshape(_BLOCK * w, cp)
            dk_c = jax.lax.dot_general(
                win, gm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

            @pl.when(first)
            def _(dr=dr, dc=dc, dk_c=dk_c):
                dk_ref[dr, dc] = dk_c.astype(dk_ref.dtype)

            @pl.when(jnp.logical_not(first))
            def _(dr=dr, dc=dc, dk_c=dk_c):
                dk_ref[dr, dc] = dk_ref[dr, dc] + dk_c.astype(dk_ref.dtype)


def _bwd_dph_kernel(gm_ref, k_ref, dph_ref, *, nf: int, scale: int,
                    w: int, precision):
    """Tail backward 3/4: dph[R, C] = sum_taps gm[R-dr, C-dc] @
    K[dr,dc]^T — nine small-lane dots accumulated in 8/2-row chunks
    (sublane-tile-aligned stores)."""
    P = scale * scale
    cp = P * nf
    rows = _BLOCK + 2
    gm3 = gm_ref[0].astype(jnp.float32)
    g_pad = jnp.pad(gm3, ((2, 2), (2, 2), (0, 0)))
    for r0, rn in ((0, _BLOCK), (_BLOCK, rows - _BLOCK)):
        part = jnp.zeros((rn * (w + 2), cp), jnp.float32)
        for dr in range(3):
            for dc in range(3):
                gs = g_pad[2 - dr + r0:2 - dr + r0 + rn,
                           2 - dc:2 - dc + w + 2]
                gs = gs.reshape(rn * (w + 2), P * 3).astype(jnp.bfloat16)
                part = part + jax.lax.dot_general(
                    gs, k_ref[dr, dc], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
        dph_ref[0, 0, r0:r0 + rn] = part.reshape(
            rn, w + 2, cp).astype(dph_ref.dtype)


def _bwd_stage_kernel(y_a, y_b, dmid_ref, w0_ref, b0_ref, w1_ref, b1_ref,
                      dy_ref, dw0_ref, db0_ref, dw1_ref, db1_ref, *,
                      nf: int, scale: int, nh: int, w: int, precision):
    """Stage 2 of the tail backward: stage-pipeline adjoints from the
    masked interior dmid band to dy and the stage weight grads."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    P = scale * scale
    cp = P * nf

    band = jnp.concatenate([y_a[0], y_b[0, :2]], axis=0)
    rows = band.shape[0]
    flat = band.reshape(rows * w, nf)
    h0 = jnp.dot(flat, w0_ref[:], preferred_element_type=jnp.float32,
                 precision=precision) + b0_ref[:].astype(jnp.float32)
    h1 = _gelu(h0).astype(band.dtype)

    dh2 = dmid_ref[0, 0].reshape(rows * w, cp).astype(jnp.float32)
    first = (b == 0) & (i == 0)
    if scale == 4:
        dh1_parts = []
        for grp in range(4):
            hg = h1[:, grp * nf:(grp + 1) * nf]
            og = jnp.dot(hg, w1_ref[:], preferred_element_type=jnp.float32,
                         precision=precision) \
                + b1_ref[:].astype(jnp.float32)
            dog = (dh2[:, grp * cp // 4:(grp + 1) * cp // 4]
                   * _gelu_grad(og)).astype(band.dtype)
            dh1_parts.append(jax.lax.dot_general(
                dog, w1_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision))
            dw1_c = jax.lax.dot_general(
                hg, dog, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            db1_c = jnp.sum(dog.astype(jnp.float32), axis=0)[None]

            if grp == 0:
                @pl.when(first)
                def _(dw1_c=dw1_c, db1_c=db1_c):
                    dw1_ref[:] = dw1_c.astype(dw1_ref.dtype)
                    db1_ref[:] = db1_c.astype(db1_ref.dtype)

                @pl.when(jnp.logical_not(first))
                def _(dw1_c=dw1_c, db1_c=db1_c):
                    dw1_ref[:] = dw1_ref[:] + dw1_c.astype(dw1_ref.dtype)
                    db1_ref[:] = db1_ref[:] + db1_c.astype(db1_ref.dtype)
            else:
                dw1_ref[:] = dw1_ref[:] + dw1_c.astype(dw1_ref.dtype)
                db1_ref[:] = db1_ref[:] + db1_c.astype(db1_ref.dtype)
        dh1 = jnp.concatenate(dh1_parts, axis=-1)
    else:
        dh1 = dh2

        @pl.when(first)
        def _():
            dw1_ref[:] = jnp.zeros_like(dw1_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)

    dh0 = (dh1 * _gelu_grad(h0)).astype(band.dtype)
    dflat = jax.lax.dot_general(
        dh0, w0_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    dw0_c = jax.lax.dot_general(
        flat, dh0, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    db0_c = jnp.sum(dh0.astype(jnp.float32), axis=0)[None]

    @pl.when(first)
    def _():
        dw0_ref[:] = dw0_c.astype(dw0_ref.dtype)
        db0_ref[:] = db0_c.astype(db0_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _():
        dw0_ref[:] = dw0_ref[:] + dw0_c.astype(dw0_ref.dtype)
        db0_ref[:] = db0_ref[:] + db0_c.astype(db0_ref.dtype)

    dy_ref[0, 0] = dflat.reshape(rows, w, nf).astype(dy_ref.dtype)


def tail_band_bwd_fused(y, g_ps, w0, b0, w1, b1, k, lc, rc, top, bot, *,
                        scale: int, rgb_range: float, interpret: bool,
                        precision=None):
    """Runs the two-stage tail backward (conv adjoint -> HBM dph tiles ->
    stage adjoint; see _bwd_conv_kernel/_bwd_stage_kernel). Returns (dy,
    dw0, db0, dw1, db1, dK, dlc, drc, dtop, dbot) with dy folded to
    (B, H, W, nf) and dlc/drc folded to the (B, (nh+1)*8, cp)
    edge-buffer layout."""
    bsz, hh, w, nf = y.shape
    nh = hh // _BLOCK
    P = scale * scale
    cp = P * nf
    rows = _BLOCK + 2

    yp = jnp.pad(y, ((0, 0), (1, 0), (0, 0), (0, 0)), mode="edge")
    yp = jnp.pad(yp, ((0, 0), (0, (nh + 2) * _BLOCK - yp.shape[1]),
                      (0, 0), (0, 0)), mode="edge")

    band = lambda off: pl.BlockSpec(  # noqa: E731
        (1, _BLOCK, w, nf), lambda b, i, o=off: (b, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    full = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: (b,) + (0,) * (len(shp) - 1),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: tuple(0 for _ in shp), memory_space=pltpu.VMEM)

    # ---- 1/4: recompute (ph tiles + clip-masked cotangent) ----
    kern1 = functools.partial(_bwd_recompute_kernel, nf=nf, scale=scale,
                              nh=nh, w=w, rgb_range=rgb_range,
                              precision=precision)
    ph_t, gm_t = pl.pallas_call(
        kern1,
        grid=(bsz, nh),
        in_specs=[
            band(0), band(1),
            pl.BlockSpec((1, _BLOCK, w, P * 3), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((1, (nh + 1) * _BLOCK, cp)),
            full((1, (nh + 1) * _BLOCK, cp)),
            full((1, 1, w + 2, cp)), full((1, 1, w + 2, cp)),
            const(w0.shape), const(b0.shape),
            const(w1.shape), const(b1.shape), const(k.shape),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rows, w + 2, cp),
                         lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK, w, P * 3),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nh, rows, w + 2, cp), y.dtype),
            jax.ShapeDtypeStruct((bsz, hh, w, P * 3), y.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * bsz * hh * w
                      * (nf * cp * (2 if scale == 4 else 1)
                         + 9 * cp * P * 3)),
            bytes_accessed=int(2 * y.size
                               + 2 * bsz * nh * rows * (w + 2) * cp),
            transcendentals=int(bsz * hh * w * cp)),
        interpret=interpret,
    )(yp, yp, g_ps, lc, rc, top, bot, w0, b0, w1, b1, k)

    # ---- 2/4: dK accumulation ----
    kern2 = functools.partial(_bwd_dk_kernel, nf=nf, scale=scale, w=w,
                              precision=precision)
    dk = pl.pallas_call(
        kern2,
        grid=(bsz, nh),
        in_specs=[
            pl.BlockSpec((1, 1, rows, w + 2, cp),
                         lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK, w, P * 3),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=const(k.shape),
        out_shape=jax.ShapeDtypeStruct(k.shape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * bsz * hh * w * 9 * cp * P * 3),
            bytes_accessed=int(2 * bsz * nh * rows * (w + 2) * cp),
            transcendentals=0),
        interpret=interpret,
    )(ph_t, gm_t)

    # ---- 3/4: dph tiles ----
    kern3 = functools.partial(_bwd_dph_kernel, nf=nf, scale=scale, w=w,
                              precision=precision)
    dph_ext = pl.pallas_call(
        kern3,
        grid=(bsz, nh),
        in_specs=[
            pl.BlockSpec((1, _BLOCK, w, P * 3),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(k.shape),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, w + 2, cp),
                               lambda b, i: (b, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nh, rows, w + 2, cp),
                                       y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * bsz * nh * rows * (w + 2) * 9 * cp * P * 3),
            bytes_accessed=int(4 * bsz * nh * rows * (w + 2) * cp),
            transcendentals=0),
        interpret=interpret,
    )(gm_t, k)

    # ---- XLA glue: edge grads + interior mask ----
    row_ids = jnp.arange(rows)
    i_ids = jnp.arange(nh)
    top_row = (i_ids[:, None] == 0) & (row_ids[None, :] == 0)
    bot_row = ((i_ids[:, None] == nh - 1)
               & (row_ids[None, :] == rows - 1))
    edge_row = (top_row | bot_row)[None, :, :, None]

    dph_ext = dph_ext.astype(jnp.float32)
    dtop = dph_ext[:, 0, 0][:, None]                 # (B, 1, w+2, cp)
    dbot = dph_ext[:, nh - 1, rows - 1][:, None]
    keep = (~edge_row).astype(dph_ext.dtype)
    dlc_ext = dph_ext[:, :, :, 0] * keep             # (B, nh, rows, cp)
    drc_ext = dph_ext[:, :, :, w + 1] * keep
    dmid = dph_ext[:, :, :, 1:w + 1] * keep[..., None]

    # ---- stage 2: stage-pipeline adjoint ----
    kern2 = functools.partial(_bwd_stage_kernel, nf=nf, scale=scale,
                              nh=nh, w=w, precision=precision)
    outs2 = pl.pallas_call(
        kern2,
        grid=(bsz, nh),
        in_specs=[
            band(0), band(1),
            pl.BlockSpec((1, 1, rows, w, cp),
                         lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const(w0.shape), const(b0.shape),
            const(w1.shape), const(b1.shape),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rows, w, nf),
                         lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const(w0.shape), const((1, b0.shape[-1])),
            const(w1.shape), const((1, b1.shape[-1])),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nh, rows, w, nf), jnp.float32),
            jax.ShapeDtypeStruct(w0.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, b0.shape[-1]), jnp.float32),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, b1.shape[-1]), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * bsz * hh * w * nf * cp
                      * (2 if scale == 4 else 1)),
            bytes_accessed=int(2 * y.size
                               + 2 * bsz * nh * rows * w * cp),
            transcendentals=int(bsz * hh * w * cp)),
        interpret=interpret,
    )(yp, yp, dmid.astype(y.dtype), w0, b0, w1, b1)
    dy_ext, dw0, db0, dw1, db1 = outs2

    def fold(ext):
        # ext (B, nh, rows, ...) covering padded rows i*8..i*8+9
        main = ext[:, :, :_BLOCK].reshape((bsz, nh * _BLOCK)
                                          + ext.shape[3:])
        tail = jnp.pad(ext[:, :, _BLOCK:],
                       ((0, 0), (0, 0), (0, _BLOCK - 2)) +
                       ((0, 0),) * (ext.ndim - 3))
        tail = tail.reshape((bsz, nh * _BLOCK) + ext.shape[3:])
        pad_main = ((0, 0), (0, _BLOCK)) + ((0, 0),) * (ext.ndim - 3)
        pad_tail = ((0, 0), (_BLOCK, 0)) + ((0, 0),) * (ext.ndim - 3)
        return jnp.pad(main, pad_main) + jnp.pad(tail, pad_tail)

    acc_yp = fold(dy_ext)                      # (B, (nh+1)*8, w, nf)
    dy = acc_yp[:, 1:hh + 1]
    dy = dy.at[:, 0].add(acc_yp[:, 0])         # top edge-pad adjoint
    dy = dy.at[:, hh - 1].add(acc_yp[:, hh + 1])  # bottom edge copies

    dlc = fold(dlc_ext)                        # (B, (nh+1)*8, cp)
    drc = fold(drc_ext)
    return (dy, dw0, db0[0], dw1, db1[0], dk, dlc, drc, dtop, dbot)


def _ps_adjoint(y, r):
    """Adjoint (= inverse) of pixel_shuffle_fast: (B, H*r, W*r, c) ->
    (B, H, W, r*r*c) in (r_i, r_j, c) channel order."""
    bsz, hr, wr, c = y.shape
    h, w = hr // r, wr // r
    y = y.reshape(bsz, h, r, w, r * c)
    y = y.transpose(0, 1, 3, 2, 4)
    return y.reshape(bsz, h, w, r * r * c)


def tail_bwd_vmem_bytes(w: int, nf: int, scale: int) -> float:
    """Peak per-kernel VMEM of the four-kernel tail backward — the max of
    the recompute kernel (stage pipeline + spliced band + double-buffered
    bf16 ph out) and the dph kernel (8-row f32 chunk accumulator + dot
    result + double-buffered bf16 out)."""
    P = scale * scale
    cp = P * nf
    rows = _BLOCK + 2
    band_px = rows * (w + 2)
    c1 = 4 * nf if scale == 4 else cp
    recompute = (4 * rows * w * c1        # h0 f32
                 + 2 * rows * w * c1      # h1 bf16
                 + 2 * 2 * rows * w * cp  # mid + ph bf16
                 + 2 * _BLOCK * w * cp    # window view bf16
                 + 2 * 2 * band_px * cp)  # ph out, double-buffered
    chunk_px = _BLOCK * (w + 2)
    dph = (2 * 4 * chunk_px * cp          # chunk accumulator + result
           + 2 * 2 * band_px * cp         # dph out, double-buffered
           + 4 * 9 * cp * P * 3)          # K const (f32-ish bound)
    return max(recompute, dph)


def _tail_bwd_fits(h: int, w: int, scale: int, nf: int) -> bool:
    from m2trans_tpu.ops.pallas.device import gate_profile

    limit = gate_profile().get("tail_bwd_limit", 0.0)
    return (h % _BLOCK == 0 and w % _BLOCK == 0
            and tail_bwd_vmem_bytes(w, nf, scale) <= limit)
