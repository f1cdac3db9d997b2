"""Sub-pixel (depth-to-space) upsampling, NHWC, PyTorch channel order.

``torch.nn.PixelShuffle(r)`` maps in[b, c*r^2 + i*r + j, h, w] ->
out[b, c, h*r + i, w*r + j] (used by the reference upsampling tail,
models/M2Trans_network.py:40-56). The checkpoint converter relies on this
exact channel ordering.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C), torch PixelShuffle ordering."""
    bsz, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(bsz, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r_i, W, r_j, C
    return x.reshape(bsz, h * r, w * r, c)


def pixel_shuffle_fast(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Depth-to-space for channels pre-ordered as (r_i, r_j, c) — i.e. the
    channel index is (i*r + j)*C + c.

    Equivalent to torch PixelShuffle composed with the channel permutation
    :func:`ps_weight_perm`; the transpose keeps the (r_j, C) minor dims
    contiguous, which on TPU is a cheap block copy instead of the
    lane-scrambling 6-D transpose torch ordering forces (~7x less HBM time
    in the x4 tail)."""
    bsz, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(bsz, h, w, r, r * c)
    x = x.transpose(0, 1, 3, 2, 4)  # B, H, r_i, W, (r_j C)
    return x.reshape(bsz, h * r, w * r, c)


def ps_weight_perm(c_out: int, r: int):
    """Output-channel permutation mapping torch PixelShuffle channel order
    (c*r*r + i*r + j) to the (i*r + j)*C + c order pixel_shuffle_fast wants.
    Apply to the producing conv's HWIO weight: ``w[..., perm]`` (values are
    bit-identical; only the summation order of nothing changes)."""
    import numpy as np

    perm = [c * r * r + i * r + j
            for i in range(r) for j in range(r) for c in range(c_out)]
    return np.asarray(perm, np.int32)
