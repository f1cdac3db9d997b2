"""FSIM/GMSD cross-checks against the independent from-paper oracles
(tests/metric_oracles.py) plus frozen golden values.

Closes the round-1 validation gap (PARITY.md): the JAX implementations in
m2trans_tpu.metrics were previously tested only by invariants; here every
constant and pipeline stage is checked against a structurally different
numpy/scipy re-derivation of the publications, on natural-ish images
(smoothed noise + structure), including the downsampling and odd-size
paths. Golden values are frozen so future refactors can't silently drift.
"""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from m2trans_tpu.metrics import fsim, gmsd

from metric_oracles import oracle_fsim, oracle_gmsd


def _natural_pair(shape, seed, distortion=0.05):
    """Smoothed random field + structured gradients, and a distorted copy:
    band-limited content that exercises all phase-congruency scales."""
    rng = np.random.default_rng(seed)
    h, w = shape
    base = ndimage.gaussian_filter(rng.uniform(size=(h, w, 3)), (3, 3, 0))
    yy, xx = np.mgrid[0:h, 0:w]
    base += 0.3 * np.sin(xx[..., None] / 7.0) * np.cos(yy[..., None] / 11.0)
    base = (base - base.min()) / (base.max() - base.min())
    noisy = base + distortion * rng.standard_normal(base.shape)
    noisy += ndimage.gaussian_filter(
        distortion * rng.standard_normal(base.shape), (5, 5, 0))
    noisy = np.clip(noisy, 0.0, 1.0)
    return base.astype(np.float32), noisy.astype(np.float32)


@pytest.mark.parametrize("shape,seed", [((96, 128), 0), ((120, 96), 1)])
def test_fsim_matches_paper_oracle(shape, seed):
    x, y = _natural_pair(shape, seed)
    ours = float(fsim(jnp.asarray(x[None]), jnp.asarray(y[None]))[0])
    ref = oracle_fsim(x, y)
    assert abs(ours - ref) <= 1e-4, (ours, ref)


def test_fsim_matches_oracle_downsampled():
    x, y = _natural_pair((560, 520), 2)  # F = round(520/256) = 2
    ours = float(fsim(jnp.asarray(x[None]), jnp.asarray(y[None]))[0])
    ref = oracle_fsim(x, y)
    assert abs(ours - ref) <= 1e-4, (ours, ref)


def test_fsim_gray_matches_oracle():
    x, y = _natural_pair((96, 96), 3)
    xg, yg = x[..., :1], y[..., :1]
    ours = float(fsim(jnp.asarray(xg[None]), jnp.asarray(yg[None]))[0])
    ref = oracle_fsim(xg[..., 0], yg[..., 0])
    assert abs(ours - ref) <= 1e-4, (ours, ref)


@pytest.mark.parametrize("shape,seed", [((96, 128), 0), ((97, 125), 4)])
def test_gmsd_matches_paper_oracle(shape, seed):
    x, y = _natural_pair(shape, seed)
    ours = float(gmsd(jnp.asarray(x[None]), jnp.asarray(y[None]))[0])
    ref = oracle_gmsd(x, y)
    assert abs(ours - ref) <= 1e-5, (ours, ref)


def test_frozen_goldens():
    """Pinned values from the agreeing implementations (this file + the
    jax metrics at their introduction). A drift here means the metric
    changed behavior, not just an implementation detail."""
    x, y = _natural_pair((96, 128), 0)
    f = float(fsim(jnp.asarray(x[None]), jnp.asarray(y[None]))[0])
    g = float(gmsd(jnp.asarray(x[None]), jnp.asarray(y[None]))[0])
    # values produced by tests/metric_oracles.py at agreement time
    assert abs(f - 0.90954629) <= 1e-4
    assert abs(g - 0.01454619) <= 1e-5
    assert abs(oracle_fsim(x, y) - 0.90954629) <= 1e-7
    assert abs(oracle_gmsd(x, y) - 0.01454619) <= 1e-7
