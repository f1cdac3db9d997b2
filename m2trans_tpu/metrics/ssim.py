"""SSIM matching ``pytorch_msssim.ssim`` defaults (the reference's SSIM:
utils.py:11,232-234): 11x11 gaussian window sigma=1.5, K=(0.01, 0.03),
data_range=255, VALID (un-padded) filtering, mean over batch/channels/space.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


def _gaussian_kernel(win_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(win_size, dtype=np.float64) - (win_size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_separable(x: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable VALID filtering of NHWC x with a 1-D kernel."""
    c = x.shape[-1]
    kh = jnp.tile(k1d.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k1d.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                 feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    return lax.conv_general_dilated(y, kw, (1, 1), "VALID",
                                    dimension_numbers=dn,
                                    feature_group_count=c,
                                    precision=lax.Precision.HIGHEST)


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 255.0,
    win_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over an NHWC batch (size_average=True semantics)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    win = jnp.asarray(_gaussian_kernel(win_size, sigma))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _filter2d_separable(x, win)
    mu_y = _filter2d_separable(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d_separable(x * x, win) - mu_xx
    sigma_yy = _filter2d_separable(y * y, win) - mu_yy
    sigma_xy = _filter2d_separable(x * y, win) - mu_xy

    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    lum = (2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)
    return jnp.mean(lum * cs)


def calc_ssim(sr: jnp.ndarray, hr: jnp.ndarray) -> jnp.ndarray:
    """Reference utils.calc_ssim: pytorch_msssim defaults on 0-255 inputs."""
    return ssim(sr, hr, data_range=255.0)
