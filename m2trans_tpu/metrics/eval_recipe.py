"""The reference's exact evaluation recipe, as one jittable function.

Reference recipe (train.py:298-312, test.py:101-116):
  colors==3 -> RGB->YCbCr, keep Y only; shave a `scale`-px border;
  x255 when rgb_range==1; then PSNR + SSIM. (FSIM/GMSD are computed on the
  full RGB frame *before* Y-conversion/shave, test.py:93-99.)
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from m2trans_tpu.metrics.color import rgb_to_ycbcr
from m2trans_tpu.metrics.psnr import calc_psnr
from m2trans_tpu.metrics.ssim import calc_ssim


def sr_eval_metrics(
    sr: jnp.ndarray,
    hr: jnp.ndarray,
    *,
    scale: int,
    colors: int = 3,
    rgb_range: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """PSNR/SSIM of an SR/HR pair (NHWC, [0, rgb_range])."""
    # metrics ALWAYS run in f32: a bf16 SR tensor fed through the
    # ycbcr/x255 chain loses ~17 dB PSNR to quantization of the
    # intermediate values (observed 38.7 -> 21.6 on a smooth pair), and
    # SSIM's windowed variances go unstable — the speed mode's outputs
    # must be promoted before any metric arithmetic
    sr = sr.astype(jnp.float32)
    hr = hr.astype(jnp.float32)
    if colors == 3:
        sr_y = rgb_to_ycbcr(sr)[..., 0:1]
        hr_y = rgb_to_ycbcr(hr)[..., 0:1]
    else:
        sr_y, hr_y = sr, hr
    sr_y = sr_y[:, scale:-scale, scale:-scale, :]
    hr_y = hr_y[:, scale:-scale, scale:-scale, :]
    if rgb_range == 1:
        sr_y = sr_y * 255.0
        hr_y = hr_y * 255.0
    return {"psnr": calc_psnr(sr_y, hr_y), "ssim": calc_ssim(sr_y, hr_y)}
