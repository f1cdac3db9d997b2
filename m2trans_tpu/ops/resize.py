"""Bicubic resize as separable matrix multiplication (TPU-friendly).

The reference resizes SR/HR patches to 224x224 with
``F.interpolate(mode='bicubic', align_corners=True)`` before MedCLIP
encoding (losses.py:53-54). On TPU, a dense resize = two small matmuls
(out = W_h @ x @ W_w^T) that ride the MXU and fuse into the surrounding
graph — no gathers. Matches torch's bicubic kernel (Keys, A=-0.75) with
align_corners=True mapping src = i * (in-1) / (out-1).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    return np.where(
        at <= 1.0,
        (a + 2.0) * at ** 3 - (a + 3.0) * at ** 2 + 1.0,
        np.where(at < 2.0,
                 a * at ** 3 - 5.0 * a * at ** 2 + 8.0 * a * at - 4.0 * a,
                 0.0),
    )


@lru_cache(maxsize=64)
def _resize_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) interpolation weights, edge-clamped taps."""
    if n_out == 1:
        src = np.zeros((1,))
    elif align_corners:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        scale = n_in / n_out
        src = (np.arange(n_out) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    mat = np.zeros((n_out, n_in), np.float64)
    for tap in range(-1, 3):
        w = _cubic_kernel(tap - frac)
        idx = np.clip(i0 + tap, 0, n_in - 1)
        np.add.at(mat, (np.arange(n_out), idx), w)
    return mat.astype(np.float32)


def bicubic_resize(x: jnp.ndarray, out_hw, align_corners: bool = True,
                   precision=None) -> jnp.ndarray:
    """NHWC bicubic resize to (out_h, out_w)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    wh = jnp.asarray(_resize_matrix(h, oh, align_corners))
    ww = jnp.asarray(_resize_matrix(w, ow, align_corners))
    dt = x.dtype
    y = jnp.einsum("oh,bhwc->bowc", wh, x.astype(jnp.float32),
                   precision=precision)
    y = jnp.einsum("pw,bhwc->bhpc", ww, y, precision=precision)
    # einsum above maps w->p on axis 2; reorder naming for clarity
    return y.astype(dt)


def bilinear_resize(x: jnp.ndarray, out_hw, align_corners: bool = False,
                    precision=None) -> jnp.ndarray:
    """NHWC bilinear resize (used for TB comparison panels)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw

    @lru_cache(maxsize=64)
    def lin_matrix(n_in, n_out, ac):
        if n_out == 1:
            src = np.zeros((1,))
        elif ac:
            src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        else:
            src = np.clip((np.arange(n_out) + 0.5) * n_in / n_out - 0.5,
                          0, n_in - 1)
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        mat = np.zeros((n_out, n_in), np.float64)
        np.add.at(mat, (np.arange(n_out), np.clip(i0, 0, n_in - 1)), 1 - frac)
        np.add.at(mat, (np.arange(n_out), np.clip(i0 + 1, 0, n_in - 1)), frac)
        return mat.astype(np.float32)

    wh = jnp.asarray(lin_matrix(h, oh, align_corners))
    ww = jnp.asarray(lin_matrix(w, ow, align_corners))
    y = jnp.einsum("oh,bhwc->bowc", wh, x.astype(jnp.float32),
                   precision=precision)
    y = jnp.einsum("pw,bhwc->bhpc", ww, y, precision=precision)
    return y.astype(x.dtype)
