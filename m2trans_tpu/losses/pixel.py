"""Pixel-space reconstruction losses."""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(sr: jnp.ndarray, hr: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (reference train.py:76,198-199)."""
    return jnp.mean(jnp.abs(sr.astype(jnp.float32) - hr.astype(jnp.float32)))


def charbonnier_loss(sr: jnp.ndarray, hr: jnp.ndarray,
                     eps2: float = 1e-6) -> jnp.ndarray:
    """L1-Charbonnier (reference losses.py:287-297 — kept for surface
    completeness; unused by the default training recipe)."""
    diff = sr.astype(jnp.float32) - hr.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(diff * diff + eps2))
