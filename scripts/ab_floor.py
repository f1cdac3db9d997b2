"""Calibrate the per-call measurement floor of the ab.py chain recipe
and verify ab_budget2's ablation patches actually engage.

Motivation: ab_budget2.py measured its FLOOR variant (body+tail+packing
all ablated) at the same ~6.5 ms slope as the full model — either the
flagship forward is per-call-overhead-bound through the axon tunnel, or
the monkeypatches silently missed the hot path. This script decides:

  1. patch check (no chip time): lower each ab_budget2 variant and count
     Mosaic custom-calls in the StableHLO;
  2. floor check: chain-slope of a trivial same-shape program vs the
     full model in one process.

Usage: python scripts/ab_floor.py [HW]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import m2trans_tpu.models.m2trans as mm  # noqa: E402
import m2trans_tpu.ops.pallas.halo_attn_packed as pk  # noqa: E402
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

    def trivial(xx):
        return xx * 0.999 + xx.mean() * 1e-3

    # --- 1. patch-engagement check (lowering only) -----------------------
    def count_custom_calls(f):
        # fresh(): jax's trace cache keys on the function object — reusing
        # f across patch states would serve the first trace
        txt = jax.jit(fresh(f)).lower(x).as_text()
        return txt.count("tpu_custom_call"), len(txt)

    n_full, s_full = count_custom_calls(fwd)

    def passthrough_cftm(p, xp, inv_p, t_p, *, policy, block, halo):
        return xp * (1.0 + inv_p.mean() * 1e-9).astype(xp.dtype)

    orig = mm._cftm_apply_packed_core
    mm._cftm_apply_packed_core = passthrough_cftm
    try:
        n_nobody, s_nobody = count_custom_calls(fwd)
    finally:
        mm._cftm_apply_packed_core = orig

    print(f"custom-calls full={n_full} (hlo {s_full} B)  "
          f"no_body={n_nobody} (hlo {s_nobody} B)", flush=True)
    if n_nobody >= n_full:
        print("!! no_body patch did NOT engage — ab_budget2 results void",
              flush=True)

    # --- 2. dispatch-floor calibration ------------------------------------
    compare({"full": jax.jit(fresh(fwd)), "trivial": jax.jit(trivial)},
            (x,), n1=8, n2=40, trials=6)


if __name__ == "__main__":
    main()
