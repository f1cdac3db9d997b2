"""Intra-tail cost attribution on the device-loop instrument.

Re-does ab_tail_parts (VOIDED by the trace-cache bug — it reported "all
~0") with compare_fori: each variant nulls one tail_band kernel stage
via tail_band._ABLATE (wrong values, dataflow preserved) and the paired
slope delta is that stage's exposed device cost inside the full model.

Usage: python scripts/ab_tail3.py [HW]
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

    def make_body(ablate, eps):
        def body(xx):
            old = tb._ABLATE
            tb._ABLATE = frozenset(ablate)
            try:
                y = m2trans_apply(params, xx, cfg, policy=policy)
                return xx * 0.999 + y.astype(jnp.float32).mean() * eps
            finally:
                tb._ABLATE = old
        return body

    bodies = {
        "full": make_body((), 1e-3),
        "no_phconv": make_body(("phconv",), 1.01e-3),
        "no_stage01": make_body(("stage0", "stage1"), 1.02e-3),
        "no_gelu": make_body(("gelu",), 1.03e-3),
        "no_edges": make_body(("edges",), 1.04e-3),
    }
    compare_fori(bodies, x0, n1=4, n2=32, trials=6)


if __name__ == "__main__":
    main()
