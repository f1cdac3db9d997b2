"""Paired A/B of the phase-conv formulation (_TAP_PACKED): 9 per-tap
dots vs tap-packed + slice-adds vs tap-packed + lane-rotate reduction.
Device-loop instrument; all exact.

Usage: python scripts/ab_tail5.py [HW]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import m2trans_tpu.ops.pallas.tail_band as tb  # noqa: E402
from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
from scripts.ab import compare_fori  # noqa: E402


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (8, hw, hw, 3))

    def make_body(mode, eps):
        def body(xx):
            old = tb._TAP_PACKED
            tb._TAP_PACKED = mode
            try:
                y = m2trans_apply(params, xx, cfg, policy=policy)
                return xx * 0.999 + y.astype(jnp.float32).mean() * eps
            finally:
                tb._TAP_PACKED = old
        return body

    bodies = {
        "per_tap": make_body(False, 1e-3),
        "tap_roll": make_body("roll", 1.01e-3),
        "tap_sliceadd": make_body(True, 1.02e-3),
    }
    compare_fori(bodies, x0, n1=4, n2=32, trials=8)


if __name__ == "__main__":
    main()
