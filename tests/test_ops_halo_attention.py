"""Halo window attention: first-principles numpy oracle + torch-unfold layout
cross-check (parity oracle strategy per SURVEY.md §4)."""

import jax.numpy as jnp
from jax import lax
import numpy as np
import torch
import torch.nn.functional as tF

from m2trans_tpu.ops.halo_attention import (
    blockify,
    extract_halo_windows,
    halo_attention,
    unblockify,
)


def np_halo_attention(x_q, x_k, x_v, rel_h, rel_w, block, halo):
    """Loop-based oracle of the reference TBlock attention semantics
    (reference models/M2Trans_network.py:290-340): per 8x8 query block,
    keys/values from the zero-padded (block+2halo)^2 neighborhood, rel-pos
    added to key channel halves, softmax(q k^T / sqrt(C)) v."""
    bsz, h, w, c = x_q.shape
    win = block + 2 * halo
    out = np.zeros_like(x_q)
    kp = np.pad(x_k, ((0, 0), (halo, halo), (halo, halo), (0, 0)))
    vp = np.pad(x_v, ((0, 0), (halo, halo), (halo, halo), (0, 0)))
    for b in range(bsz):
        for bi in range(h // block):
            for bj in range(w // block):
                q = x_q[b, bi * block:(bi + 1) * block,
                        bj * block:(bj + 1) * block].reshape(-1, c)
                q = q * (c ** -0.5)
                k = kp[b, bi * block:bi * block + win,
                       bj * block:bj * block + win].copy()
                k[..., : c // 2] += rel_h[:, None, :]
                k[..., c // 2:] += rel_w[None, :, :]
                k = k.reshape(-1, c)
                v = vp[b, bi * block:bi * block + win,
                       bj * block:bj * block + win].reshape(-1, c)
                sim = q @ k.T
                sim -= sim.max(-1, keepdims=True)
                attn = np.exp(sim)
                attn /= attn.sum(-1, keepdims=True)
                o = attn @ v
                out[b, bi * block:(bi + 1) * block,
                    bj * block:(bj + 1) * block] = o.reshape(block, block, c)
    return out


def test_extract_halo_windows_matches_torch_unfold(rng):
    """The window gather must reproduce torch F.unfold's zero-padded,
    c-major patch layout (the layout the reference's rearrange assumes)."""
    block, halo = 4, 1
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    got = np.asarray(extract_halo_windows(jnp.asarray(x), block, halo, precision=lax.Precision.HIGHEST))
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    u = tF.unfold(tx, kernel_size=block + 2 * halo, stride=block, padding=halo)
    # u: (B, C*win*win, L) with channel-major taps, L row-major over blocks
    bsz, c = 2, 3
    win2 = (block + 2 * halo) ** 2
    nh, nw = 8 // block, 12 // block
    want = (
        u.numpy()
        .reshape(bsz, c, win2, nh, nw)
        .transpose(0, 3, 4, 2, 1)  # (B, nh, nw, win*win, C)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_blockify_roundtrip(rng):
    x = rng.standard_normal((2, 16, 24, 5)).astype(np.float32)
    b = blockify(jnp.asarray(x), 8)
    assert b.shape == (2, 2, 3, 64, 5)
    np.testing.assert_allclose(np.asarray(unblockify(b, 16, 24)), x, atol=0)


def test_blockify_row_major(rng):
    # pixel (r, c) of block (0,0) must land at flat index r*block + c
    x = np.arange(64, dtype=np.float32).reshape(1, 8, 8, 1)
    b = np.asarray(blockify(jnp.asarray(x), 8))
    np.testing.assert_allclose(b[0, 0, 0, :, 0], np.arange(64))


def test_halo_attention_matches_oracle(rng):
    block, halo = 8, 1
    for c, h, w in [(4, 8, 8), (8, 16, 24), (16, 8, 16)]:
        xq = rng.standard_normal((2, h, w, c)).astype(np.float32)
        xk = rng.standard_normal((2, h, w, c)).astype(np.float32)
        xv = rng.standard_normal((2, h, w, c)).astype(np.float32)
        rel_h = rng.standard_normal((block + 2 * halo, c // 2)).astype(np.float32)
        rel_w = rng.standard_normal((block + 2 * halo, c // 2)).astype(np.float32)
        got = np.asarray(
            halo_attention(
                jnp.asarray(xq), jnp.asarray(xk), jnp.asarray(xv),
                jnp.asarray(rel_h), jnp.asarray(rel_w), block=block, halo=halo, precision=lax.Precision.HIGHEST,
            )
        )
        want = np_halo_attention(xq, xk, xv, rel_h, rel_w, block, halo)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_halo_attention_uniform_attention_averages_values():
    # with zero q, attention is uniform over the neighborhood -> output is the
    # neighborhood mean of v (zero-padded borders included)
    block, halo, c = 8, 1, 4
    xq = jnp.zeros((1, 8, 8, c))
    xk = jnp.zeros((1, 8, 8, c))
    xv = jnp.ones((1, 8, 8, c))
    rel_h = jnp.zeros((10, c // 2))
    rel_w = jnp.zeros((10, c // 2))
    out = np.asarray(halo_attention(xq, xk, xv, rel_h, rel_w, block=block,
                                    halo=halo, precision=lax.Precision.HIGHEST))
    # 10x10 window over an 8x8 ones image zero-padded by 1: 64 ones / 100 taps
    np.testing.assert_allclose(out, 64.0 / 100.0, atol=1e-6)
