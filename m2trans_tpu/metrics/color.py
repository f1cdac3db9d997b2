"""Color-space conversion matching the reference's evaluation path."""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_ycbcr(image: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.601 RGB -> YCbCr, NHWC.

    Bit-matches reference utils.py:121-146, including its quirk of dividing
    the input by 255 internally: callers pass [0,1]-ranged images so Y lands
    in [16, 16.86]; the later x255 rescale before calc_psnr cancels exactly,
    yielding standard Y-channel PSNR (see metrics/eval_recipe.py).
    """
    image = image / 255.0
    r = image[..., 0]
    g = image[..., 1]
    b = image[..., 2]
    y = 65.481 * r + 128.553 * g + 24.966 * b + 16.0
    cb = -37.797 * r - 74.203 * g + 112.0 * b + 128.0
    cr = 112.0 * r - 93.786 * g - 18.214 * b + 128.0
    return jnp.stack((y, cb, cr), axis=-1)
