"""Haar DWT/IWT: golden numerics, orthonormality, exact inverse."""

import jax.numpy as jnp
import numpy as np

from m2trans_tpu.ops import haar_dwt, haar_iwt


def np_haar_dwt(x):
    """Independent numpy oracle for the 2x2 orthonormal Haar analysis
    (subband math per reference models/M2Trans_network.py:204-207)."""
    a = x[:, 0::2, 0::2, :]
    b = x[:, 1::2, 0::2, :]
    c = x[:, 0::2, 1::2, :]
    d = x[:, 1::2, 1::2, :]
    ll = (a + b + c + d) / 2
    hl = (-a - b + c + d) / 2
    lh = (-a + b - c + d) / 2
    hh = (a - b - c + d) / 2
    return np.concatenate([ll, hl, lh, hh], axis=-1)


def test_dwt_matches_numpy_oracle(rng):
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    got = np.asarray(haar_dwt(jnp.asarray(x)))
    want = np_haar_dwt(x)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dwt_shapes(rng):
    x = jnp.zeros((1, 16, 32, 5))
    y = haar_dwt(x)
    assert y.shape == (1, 8, 16, 20)
    assert haar_iwt(y).shape == x.shape


def test_iwt_is_exact_inverse(rng):
    x = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    rec = np.asarray(haar_iwt(haar_dwt(jnp.asarray(x))))
    np.testing.assert_allclose(rec, x, atol=1e-6)


def test_dwt_is_orthonormal(rng):
    # energy preservation: ||DWT(x)||_2 == ||x||_2 for the /2-normalized quad
    x = rng.standard_normal((1, 32, 32, 2)).astype(np.float32)
    y = np.asarray(haar_dwt(jnp.asarray(x)))
    np.testing.assert_allclose(np.sum(y ** 2), np.sum(x ** 2), rtol=1e-5)


def test_dwt_constant_image_only_ll():
    x = jnp.ones((1, 4, 4, 1))
    y = np.asarray(haar_dwt(x))
    ll, rest = y[..., :1], y[..., 1:]
    np.testing.assert_allclose(ll, 2.0 * np.ones_like(ll), atol=1e-6)
    np.testing.assert_allclose(rest, 0.0, atol=1e-6)


def test_subband_channel_order_is_ll_hl_lh_hh():
    # a column step (varies along W) must land in HL; a row step in LH
    x = np.zeros((1, 2, 2, 1), np.float32)
    x[0, :, 1, 0] = 2.0  # columns differ -> HL = (-a-b+c+d)/2 = 2; LL = 2
    y = np.asarray(haar_dwt(jnp.asarray(x)))[0, 0, 0]
    np.testing.assert_allclose(y, [2.0, 2.0, 0.0, 0.0], atol=1e-6)

    x = np.zeros((1, 2, 2, 1), np.float32)
    x[0, 1, :, 0] = 2.0  # rows differ -> LH
    y = np.asarray(haar_dwt(jnp.asarray(x)))[0, 0, 0]
    np.testing.assert_allclose(y, [2.0, 0.0, 2.0, 0.0], atol=1e-6)
