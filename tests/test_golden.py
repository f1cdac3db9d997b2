"""Golden-value regression: the f32 forward must stay bit-stable across
refactors (kernel rewrites, layout changes, 'bit-identical' optimizations).
Regenerate tests/golden/*.npy ONLY for an intentional, understood numeric
change — and say so in the commit message."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from m2trans_tpu.config import Config
from m2trans_tpu.models import init_m2trans, m2trans_apply

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_forward_matches_golden():
    cfg = Config(scale=2, n_feats=8, n_blocks=2)
    params = init_m2trans(jax.random.PRNGKey(1234), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5678), (1, 24, 24, 3))
    y = np.asarray(m2trans_apply(params, jnp.asarray(x), cfg))
    want = np.load(os.path.join(GOLDEN, "m2trans_x2_f32.npy"))
    np.testing.assert_allclose(y, want, atol=1e-6)
