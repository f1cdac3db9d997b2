"""Gradient Magnitude Similarity Deviation (Xue et al. 2013), matching the
piq.gmsd pipeline used by the reference's test harness (test.py:98-99):

  1. scale input by data_range to [0,1];
  2. RGB -> YIQ luminance;
  3. 2x2 average-pool downsample (piq quirk: if either H or W is odd, BOTH
     bottom and right are zero-padded by one);
  4. Prewitt gradients (/3), gradient magnitude;
  5. GMS map = (2 gx gy + c) / (gx^2 + gy^2 + c), c = 170/255^2;
  6. GMSD = population std of the map.

piq itself is not installed in this image, so exact-parity golden values are
pending; the implementation follows the published algorithm with piq's
constants, and tests cover identity, sensitivity, and range invariants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

# ITU YIQ luminance row (piq uses the YIQ transform for color reduction)
_YIQ_LUMA = np.array([0.299, 0.587, 0.114], np.float32)

_PREWITT_X = np.array(
    [[1.0, 0.0, -1.0], [1.0, 0.0, -1.0], [1.0, 0.0, -1.0]], np.float32) / 3.0


def _conv_valid_same(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Depthwise SAME conv of NHWC x (C=1) with a 2-D kernel."""
    kk = jnp.asarray(k).reshape(k.shape[0], k.shape[1], 1, 1)
    return lax.conv_general_dilated(
        x, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)


def gmsd(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """GMSD per image over an NHWC batch; returns (B,) scores (piq
    reduction='none' semantics). Lower is better."""
    x = x.astype(jnp.float32) / data_range
    y = y.astype(jnp.float32) / data_range
    if x.shape[-1] == 3:
        luma = jnp.asarray(_YIQ_LUMA)
        x = jnp.einsum("bhwc,c->bhw", x, luma)[..., None]
        y = jnp.einsum("bhwc,c->bhw", y, luma)[..., None]

    # 2x2 mean pool; piq pads BOTH bottom and right by one zero row/col if
    # either dimension is odd (F.pad with a shared down_pad), then
    # avg_pool2d drops any trailing odd row/col
    pad = max(x.shape[1] % 2, x.shape[2] % 2)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad), (0, pad), (0, 0)))
    b, h, w, _ = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2]
    y = y[:, : h // 2 * 2, : w // 2 * 2]
    x = x.reshape(b, h // 2, 2, w // 2, 2, 1).mean(axis=(2, 4))
    y = y.reshape(b, h // 2, 2, w // 2, 2, 1).mean(axis=(2, 4))

    gx_x = _conv_valid_same(x, _PREWITT_X)
    gy_x = _conv_valid_same(x, _PREWITT_X.T)
    gx_y = _conv_valid_same(y, _PREWITT_X)
    gy_y = _conv_valid_same(y, _PREWITT_X.T)
    gm_x = jnp.sqrt(gx_x ** 2 + gy_x ** 2 + 1e-12)
    gm_y = jnp.sqrt(gx_y ** 2 + gy_y ** 2 + 1e-12)

    c = 170.0 / (255.0 ** 2)
    gms = (2.0 * gm_x * gm_y + c) / (gm_x ** 2 + gm_y ** 2 + c)
    mean = jnp.mean(gms, axis=(1, 2, 3), keepdims=True)
    return jnp.sqrt(jnp.mean((gms - mean) ** 2, axis=(1, 2, 3)))
