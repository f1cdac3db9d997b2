"""Intra-kernel cost attribution for the fused tail band kernel: null
out ONE stage at a time (tail_band._ABLATE, wrong values / dataflow
preserved) and measure the in-model paired delta.

Context (NOTES_ROUND5): the tail exposes ~1.5 ms of the 6.6 ms x4
forward; its dense phase-conv formulation does 16x redundant MACs
(the (3,3,cp,P*3) phase kernel is 1/16 dense) yet the measured time is
~3x the CURRENT formulation's MXU floor — so where does it go?

Usage: python scripts/ab_tail_parts.py [HW]
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
from scripts.ab import fresh, compare  # noqa: E402


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, hw, hw, 3))

    def fwd(xx):
        y = m2trans_apply(params, xx, cfg, policy=policy)
        return xx * 0.999 + y.astype(jnp.float32).mean() * 1e-3

    variants = {}
    for name, abl in (
            ("full", frozenset()),
            ("no_stage0", frozenset({"stage0"})),
            ("no_stage1", frozenset({"stage1"})),
            ("no_gelu", frozenset({"gelu"})),
            ("no_phconv", frozenset({"phconv"})),
            ("no_edges", frozenset({"edges"})),
            ("shell", frozenset({"stage0", "stage1", "gelu", "phconv",
                                 "edges"}))):
        tb._ABLATE = abl
        try:
            variants[name] = jax.jit(fresh(fwd)).lower(x).compile()
            print(f"  {name}: compiled", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED ({str(e)[:120]})", flush=True)
    tb._ABLATE = frozenset()

    compare(variants, (x,), n1=8, n2=40, trials=6)


if __name__ == "__main__":
    main()
