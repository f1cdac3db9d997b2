"""Fused halo window attention — Pallas TPU kernel.

Computes, in one kernel, what the reference TBlock does with five
materialized HBM round-trips (qkv conv -> F.unfold k -> F.unfold v ->
rel-pos add -> einsum/softmax/einsum, reference models/M2Trans_network.py:
290-340) and what our XLA path does with patch-extraction convs
(m2trans_tpu/ops/halo_attention.py):

    out = softmax( (x W_q) (x W_k + rel)^T / sqrt(C) ) (x W_v)

per non-overlapping 8x8 query block against its zero-padded 10x10
neighborhood, single head.

Why a kernel: the XLA path is HBM-bound — unfold duplicates k/v by
win^2/block^2 = 1.56x each, the f32 attention logits (64x100 per block) and
the qkv tensor (3C) all round-trip through HBM. Here each grid step DMAs
one (block + 2*halo)-row band of the (pre-zero-padded) input into VMEM,
computes the qkv projection (MXU), per-block attention (MXU + VPU softmax),
and writes only the 8-row output band: HBM traffic = read x once + write
out once.

Grid: (B, H/block). Bands overlap by 2*halo rows, which a single blocked
BlockSpec cannot express; instead the (zero-padded, H extended to a multiple
of block) input is passed through TWO blocked views — band i = all of row
block i plus the first 2*halo rows of row block i+1 — which the Pallas
pipeline prefetches like any other blocked input (no manual DMA, and Mosaic
keeps the lane-padded C<128 layouts legal).

Backward: jax.custom_vjp whose bwd re-runs the XLA composition (correct;
training time is conv-dominated anyway). Numerical parity with the XLA path
is tested in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m2trans_tpu.ops.halo_attention import halo_attention


def _kernel(xa_ref, xb_ref, wq_ref, wk_ref, wv_ref, relh_ref, relw_ref,
            out_ref, *, block: int, halo: int, w_img: int, precision):
    """One (batch, row-band) grid step.

    xa_ref:   (1, block, Wp, C) padded-input row block i in VMEM
    xb_ref:   (1, block, Wp, C) padded-input row block i+1 in VMEM
    w*_ref:   (C, C) projection weights in VMEM
    rel*_ref: (win, C/2) positional embeddings in VMEM
    out_ref:  (1, block, W, C) output band in VMEM
    """
    win = block + 2 * halo
    wp = w_img + 2 * halo
    c = xa_ref.shape[-1]
    nw = w_img // block
    c2 = c // 2

    # assemble the overlapping (win, Wp, C) band from the two blocked views
    x = jnp.concatenate([xa_ref[0], xb_ref[0, : 2 * halo]], axis=0)
    xf = x.reshape(win * wp, c)

    # qkv projections on the MXU, f32 accumulation
    k_full = jnp.dot(xf, wk_ref[:], preferred_element_type=jnp.float32,
                     precision=precision)
    v_full = jnp.dot(xf, wv_ref[:], preferred_element_type=jnp.float32,
                     precision=precision)
    k_full = k_full.reshape(win, wp, c)
    v_full = v_full.reshape(win, wp, c)

    xq = x[halo:halo + block, halo:halo + w_img, :].reshape(
        block * w_img, c)
    q_full = jnp.dot(xq, wq_ref[:], preferred_element_type=jnp.float32,
                     precision=precision)
    q_full = q_full.reshape(block, w_img, c) * (c ** -0.5)

    # rel_h varies over the band's rows -> add once band-wide (first C/2
    # channels); rel_w varies per within-window column -> added per block.
    relh = relh_ref[:].astype(jnp.float32)
    relw = relw_ref[:].astype(jnp.float32)
    k_full = jnp.concatenate(
        [k_full[:, :, :c2] + relh[:, None, :], k_full[:, :, c2:]], axis=-1)

    for j in range(nw):  # static unroll over width blocks
        q = q_full[:, j * block:(j + 1) * block, :].reshape(
            block * block, c)
        k = k_full[:, j * block:j * block + win, :]  # (win, win, C)
        k = jnp.concatenate(
            [k[:, :, :c2], k[:, :, c2:] + relw[None, :, :]], axis=-1)
        k = k.reshape(win * win, c)
        v = v_full[:, j * block:j * block + win, :].reshape(win * win, c)

        sim = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)  # (block^2, win^2)
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(attn, v, preferred_element_type=jnp.float32,
                    precision=precision)
        out_ref[0, :, j * block:(j + 1) * block, :] = o.reshape(
            block, block, c).astype(out_ref.dtype)


def _halo_attention_pallas_fwd_impl(x, w_qkv, rel_h, rel_w, *, block, halo,
                                    interpret, precision=None):
    bsz, h, w, c = x.shape
    win = block + 2 * halo
    wp = w + 2 * halo
    wq, wk, wv = (w_qkv[:, :c], w_qkv[:, c:2 * c], w_qkv[:, 2 * c:])

    nh = h // block
    nw = w // block
    # zero-pad: halo on the left/right of W; halo on top of H, and enough at
    # the bottom to make padded H a whole number of (nh + 1) row blocks so
    # the i+1 view is always in range
    pad_bottom = (nh + 1) * block - h - halo
    xp = jnp.pad(x, ((0, 0), (halo, pad_bottom), (halo, halo), (0, 0)))

    kernel = functools.partial(_kernel, block=block, halo=halo, w_img=w,
                               precision=precision)
    flops_per_band = (
        2 * win * wp * c * 2 * c  # k, v projections
        + 2 * block * w * c * c  # q projection
        + nw * (2 * block * block * win * win * c * 2))
    band_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, block, wp, c), lambda b, i, o=off: (b, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nh),
        in_specs=[
            band_spec(0),  # row block i
            band_spec(1),  # row block i+1 (first 2*halo rows used)
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
        out_specs=pl.BlockSpec((1, block, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_band * bsz * nh),
            bytes_accessed=int(2 * x.size * x.dtype.itemsize),
            transcendentals=int(bsz * h * w * win * win)),
        interpret=interpret,
    )(xp, xp, wq, wk, wv, rel_h, rel_w)
    return out


def _xla_reference(x, w_qkv, rel_h, rel_w, *, block, halo, precision=None):
    """The equivalent XLA composition (used for the backward pass)."""
    qkv = jnp.einsum("bhwc,cd->bhwd", x, w_qkv,
                     preferred_element_type=jnp.float32,
                     precision=precision).astype(x.dtype)
    c = x.shape[-1]
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    return halo_attention(q, k, v, rel_h, rel_w, block=block, halo=halo,
                          precision=precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _halo_attention_fused(x, w_qkv, rel_h, rel_w, block, halo, interpret,
                          precision):
    return _halo_attention_pallas_fwd_impl(x, w_qkv, rel_h, rel_w,
                                           block=block, halo=halo,
                                           interpret=interpret,
                                           precision=precision)


def _fwd(x, w_qkv, rel_h, rel_w, block, halo, interpret, precision):
    out = _halo_attention_pallas_fwd_impl(x, w_qkv, rel_h, rel_w,
                                          block=block, halo=halo,
                                          interpret=interpret,
                                          precision=precision)
    return out, (x, w_qkv, rel_h, rel_w)


def _bwd(block, halo, interpret, precision, res, g):
    x, w_qkv, rel_h, rel_w = res
    _, vjp = jax.vjp(
        lambda xx, ww, rh, rw: _xla_reference(xx, ww, rh, rw, block=block,
                                              halo=halo,
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
                             halo: int = 1, interpret=None, precision=None):
    """Fused qkv-projection + halo attention.

    x: (B, H, W, C) with H, W divisible by block; w_qkv: (C, 3C) (the 1x1
    conv weight reshaped, q|k|v column order); rel_h/rel_w:
    (block + 2*halo, C/2).
    """
    if interpret is None:
        interpret = not _is_tpu_backend()
    return _halo_attention_fused(x, w_qkv, rel_h, rel_w, block, halo,
                                 bool(interpret), precision)
