"""Orthonormal 2x2 Haar analysis/synthesis (NHWC), device-neutral.

The reference's "frequency transform" is this Haar DWT/IWT pair
(reference models/M2Trans_network.py:198-237; the torch.fft import at :8 is
unused). Channel order of the stacked subbands is [LL, HL, LH, HH] — each a
full C-channel group — matching the reference's channel-dim concatenation so
the downstream qkv convolutions see identical channel indexing.

The reference IWT hard-codes ``.cuda()`` when allocating its output (:223),
crashing on CPU; this implementation is a pure function of its input and runs
on any backend. Both transforms are exact inverses of each other and XLA
fuses the strided slicing + adds into the surrounding ops — no Pallas needed
for this op alone (it is fused into the attention pipeline separately).

Subband math for pixel quad a=x[2i,2j], b=x[2i+1,2j], c=x[2i,2j+1],
d=x[2i+1,2j+1] (reference :204-207):
    LL = (a+b+c+d)/2   HL = (-a-b+c+d)/2
    LH = (-a+b-c+d)/2  HH = (a-b-c+d)/2
"""

from __future__ import annotations

import jax.numpy as jnp


def haar_dwt(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C) with subband order [LL, HL, LH, HH]."""
    a = x[:, 0::2, 0::2, :]
    b = x[:, 1::2, 0::2, :]
    c = x[:, 0::2, 1::2, :]
    d = x[:, 1::2, 1::2, :]
    ll = (a + b + c + d) * 0.5
    hl = (-a - b + c + d) * 0.5
    lh = (-a + b - c + d) * 0.5
    hh = (a - b - c + d) * 0.5
    return jnp.concatenate([ll, hl, lh, hh], axis=-1)


def haar_iwt(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) -> (B, 2H, 2W, C). Exact inverse of :func:`haar_dwt`
    (reference models/M2Trans_network.py:219-234, made device-neutral)."""
    bsz, h, w, c4 = x.shape
    c = c4 // 4
    ll, hl, lh, hh = jnp.split(x, 4, axis=-1)
    a = (ll - hl - lh + hh) * 0.5  # even row, even col
    b = (ll - hl + lh - hh) * 0.5  # odd row,  even col
    cc = (ll + hl - lh - hh) * 0.5  # even row, odd col
    d = (ll + hl + lh + hh) * 0.5  # odd row,  odd col
    even_rows = jnp.stack([a, cc], axis=3).reshape(bsz, h, 2 * w, c)
    odd_rows = jnp.stack([b, d], axis=3).reshape(bsz, h, 2 * w, c)
    return jnp.stack([even_rows, odd_rows], axis=2).reshape(bsz, 2 * h, 2 * w, c)
