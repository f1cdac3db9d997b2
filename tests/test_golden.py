"""Golden-value regression: the forward must stay numerically stable across
refactors (kernel rewrites, layout changes, 'bit-identical' optimizations).
Regenerate tests/golden/*.npy ONLY for an intentional, understood numeric
change — and say so in the commit message.

Coverage (VERDICT r1 item 9): every scale the CLIs expose in f32 parity
mode (bit-stable, atol 1e-6) plus the bf16+Pallas fast path the bench
actually measures (tolerance-pinned: schedule/grouping reorders move bf16
sums by ~1e-3; real defects — wrong rel-pos, halo off-by-one, band-order
bugs — move outputs by >1e-1)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2trans_tpu.config import Config
from m2trans_tpu.models import init_m2trans, m2trans_apply
from m2trans_tpu.models.m2trans import ComputePolicy

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_forward_matches_golden_f32(scale):
    cfg = Config(scale=scale, n_feats=8, n_blocks=2)
    params = init_m2trans(jax.random.PRNGKey(1234), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5678), (1, 24, 24, 3))
    y = np.asarray(m2trans_apply(params, jnp.asarray(x), cfg))
    want = np.load(os.path.join(GOLDEN, f"m2trans_x{scale}_f32.npy"))
    np.testing.assert_allclose(y, want, atol=1e-6)


def test_forward_matches_golden_bf16_pallas():
    """The bench-path numerics net: bf16 + fused Pallas kernels at the
    flagship channel widths (n_feats=64 exercises all four branch
    levels), interpret mode on CPU."""
    cfg = Config(scale=4, n_feats=64, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(42), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(43), (2, 32, 32, 3))
    pol = ComputePolicy(dtype=jnp.bfloat16, precision=None, use_pallas=True)
    y = np.asarray(m2trans_apply(params, jnp.asarray(x), cfg,
                                 policy=pol)).astype(np.float32)
    want = np.load(os.path.join(GOLDEN, "m2trans_x4_bf16_pallas.npy"))
    np.testing.assert_allclose(y, want, atol=2e-2)
    assert float(np.abs(y - want).mean()) < 2e-3
