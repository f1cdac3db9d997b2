"""Padding utilities (NHWC).

The reference pads inputs on the bottom/right with reflect padding to a
multiple of LCM(window_sizes)=32 before the transformer body and crops the
output back (reference models/M2Trans_network.py:78-86, :76). PyTorch's
``F.pad(mode='reflect')`` excludes the edge pixel, which matches
``jnp.pad(mode='reflect')``.
"""

from __future__ import annotations

import jax.numpy as jnp


def reflect_pad_hw(x: jnp.ndarray, pad_h: tuple, pad_w: tuple) -> jnp.ndarray:
    """Reflect-pad the H and W axes of an NHWC tensor."""
    if pad_h == (0, 0) and pad_w == (0, 0):
        return x
    return jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)), mode="reflect")


def pad_to_multiple(x: jnp.ndarray, multiple: int, mode: str = "reflect") -> jnp.ndarray:
    """Pad H, W (bottom/right only) of NHWC ``x`` up to a multiple."""
    h, w = x.shape[1], x.shape[2]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)
