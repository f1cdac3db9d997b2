"""2-D convolutions in NHWC / HWIO layout.

TPU-first: NHWC keeps channels on the 128-lane axis so XLA tiles convs onto
the MXU directly. Weight layout is HWIO; the checkpoint converter transposes
PyTorch OIHW weights (see m2trans_tpu/train/convert.py).

Padding semantics match the reference exactly:
  * ``padding_mode='reflect'`` convs (head / tail 3x3,
    reference models/M2Trans_network.py:34,48,55) -> explicit reflect pad
    then VALID conv.
  * default zero padding (CFTM feed_forward 3x3, reference :124-126) ->
    SAME-style explicit zero pad then VALID conv.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    padding: str = "zeros",
    dtype=None,
    precision=None,
) -> jnp.ndarray:
    """NHWC conv. ``padding``: 'zeros' | 'reflect' | 'valid' (pad = (k-1)//2).

    ``precision``: lax.Precision for the contraction. JAX's default runs
    f32 contractions in reduced (bf16-pass) precision; parity mode passes
    HIGHEST (see m2trans_tpu.models.m2trans.compute_policy).
    """
    kh, kw = w.shape[0], w.shape[1]
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    if padding == "reflect" and (ph or pw):
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
        pad = "VALID"
    elif padding == "zeros" and (ph or pw):
        pad = [(ph, ph), (pw, pw)]
    else:
        pad = "VALID"
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=pad, dimension_numbers=_DIMSPEC,
        precision=precision,
    )
    if b is not None:
        y = y + (b.astype(y.dtype) if dtype is not None else b)
    return y


conv1x1 = partial(conv2d, padding="valid")
conv3x3 = conv2d


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — PyTorch ``nn.GELU()`` default; JAX defaults to the
    tanh approximation, so parity requires approximate=False."""
    return jax.nn.gelu(x, approximate=False)
