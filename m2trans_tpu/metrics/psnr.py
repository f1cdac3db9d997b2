"""PSNR matching reference utils.py:179-184."""

from __future__ import annotations

import jax.numpy as jnp


def calc_psnr(sr: jnp.ndarray, hr: jnp.ndarray) -> jnp.ndarray:
    """-10*log10(mean(((sr-hr)/255)^2)). Expects 0-255-range inputs (callers
    rescale x255 when rgb_range==1, reference train.py:308-309). Computed in
    float64-equivalent f32 accumulation; reference casts to double — on TPU we
    accumulate the mean in f32 which is sufficient for 2-dp parity."""
    diff = (sr.astype(jnp.float32) - hr.astype(jnp.float32)) / 255.0
    mse = jnp.mean(diff * diff)
    return -10.0 * jnp.log10(mse)
