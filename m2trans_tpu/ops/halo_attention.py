"""Blocked local ("halo") window attention — the model's inner hot op.

Semantics (reference models/M2Trans_network.py:290-340, TBlock.forward):
  * queries: disjoint ``block x block`` (8x8) windows, flattened row-major;
  * keys/values: the ``(block+2*halo)^2`` (10x10) neighborhood around each
    query block, gathered with **zero padding** at the image border
    (``F.unfold(..., padding=halo)``);
  * a decomposed relative positional embedding is added to the keys: the
    channel dim is split in half, ``rel_h`` (one row per key-row) is added to
    the first half, ``rel_w`` (one per key-col) to the second half (:322-325);
  * scaled dot-product attention per block: q pre-scaled by head_ch^-0.5,
    softmax over the neighborhood, single head (num_heads=1 everywhere,
    reference :119-122).

This module is the XLA implementation: the halo gather lowers to
``lax.conv_general_dilated_patches`` (a grouped conv the MXU executes
directly, with c-major patch ordering identical to torch unfold) and the
attention itself to batched matmuls. The fused Pallas kernel
(m2trans_tpu/ops/pallas/halo_attn.py) computes the same function without
materializing the 100/64x duplicated k/v patches in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def extract_halo_windows(x: jnp.ndarray, block: int, halo: int,
                         precision=None) -> jnp.ndarray:
    """Zero-padded overlapping window gather.

    (B, H, W, C) -> (B, nh, nw, win*win, C) where win = block + 2*halo and
    window (i, j) covers rows [i*block - halo, i*block + block + halo) of the
    unpadded input (out-of-range taps are zero). Flattening is row-major over
    (win_row, win_col), matching torch ``F.unfold`` + the reference's einops
    rearrangement (reference models/M2Trans_network.py:313-317,322-325).
    """
    bsz, h, w, c = x.shape
    win = block + 2 * halo
    p = lax.conv_general_dilated_patches(
        x,
        filter_shape=(win, win),
        window_strides=(block, block),
        padding=[(halo, halo), (halo, halo)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )  # (B, nh, nw, C*win*win), channel-major patch order
    nh, nw = p.shape[1], p.shape[2]
    p = p.reshape(bsz, nh, nw, c, win * win)
    return p.transpose(0, 1, 2, 4, 3)  # (B, nh, nw, win*win, C)


def blockify(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nh, nw, block*block, C), row-major within block."""
    bsz, h, w, c = x.shape
    nh, nw = h // block, w // block
    x = x.reshape(bsz, nh, block, nw, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(bsz, nh, nw, block * block, c)


def unblockify(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of :func:`blockify`: (B, nh, nw, block*block, C) -> (B, H, W, C)."""
    bsz, nh, nw, bb, c = x.shape
    block = h // nh
    x = x.reshape(bsz, nh, nw, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(bsz, h, w, c)


def add_rel_pos_to_k(k_win: jnp.ndarray, rel_h: jnp.ndarray, rel_w: jnp.ndarray,
                     win: int) -> jnp.ndarray:
    """Add the decomposed relative positional embedding to gathered keys.

    k_win: (..., win*win, C); rel_h, rel_w: (win, C//2). The first C/2
    channels get rel_h broadcast over key columns, the last C/2 get rel_w
    broadcast over key rows (reference models/M2Trans_network.py:322-325).
    """
    c = k_win.shape[-1]
    lead = k_win.shape[:-2]
    k = k_win.reshape(*lead, win, win, c)
    kh = k[..., : c // 2] + rel_h[:, None, :]
    kw = k[..., c // 2:] + rel_w[None, :, :]
    k = jnp.concatenate([kh, kw], axis=-1)
    return k.reshape(*lead, win * win, c)


def halo_attention(
    x_q: jnp.ndarray,
    x_k: jnp.ndarray,
    x_v: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray,
    *,
    block: int = 8,
    halo: int = 1,
    precision=None,
) -> jnp.ndarray:
    """Single-head halo window attention over NHWC feature maps.

    All of x_q/x_k/x_v are (B, H, W, C) with H, W divisible by ``block``
    (the model guarantees this: inputs are padded to a multiple of 32 and
    every pyramid level keeps divisibility by 8). Returns (B, H, W, C).
    """
    bsz, h, w, c = x_q.shape
    win = block + 2 * halo

    dt = x_q.dtype
    q = blockify(x_q, block) * jnp.asarray(c ** -0.5, dt)
    k = extract_halo_windows(x_k, block, halo, precision=precision)
    v = extract_halo_windows(x_v, block, halo, precision=precision)
    k = add_rel_pos_to_k(k, rel_h.astype(dt), rel_w.astype(dt), win)

    # matmuls in the compute dtype with f32 accumulation; softmax in f32
    sim = jnp.einsum("bnmqc,bnmkc->bnmqk", q, k,
                     preferred_element_type=jnp.float32, precision=precision)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bnmqk,bnmkc->bnmqc", attn.astype(dt), v,
                     preferred_element_type=jnp.float32, precision=precision)
    return unblockify(out.astype(dt), h, w)
