"""Normalization ops (NHWC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Instance normalization over spatial dims, no affine params.

    Matches ``torch.nn.InstanceNorm2d(nf)`` defaults (affine=False,
    track_running_stats=False, eps=1e-5, biased variance) used by CFTM
    (reference models/M2Trans_network.py:127,135). Statistics are computed in
    float32 regardless of compute dtype for numerical stability.
    """
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(dt)
