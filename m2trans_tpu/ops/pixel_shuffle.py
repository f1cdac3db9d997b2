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
