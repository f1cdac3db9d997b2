"""Batch-64 serving formulation A/B on the device-loop instrument.

BATCH64_r05 measured lax.map/micro-8 at 55.7 ms/batch = 6.96 ms per
micro-batch vs 6.14 ms for the standalone batch-8 program — ~12% lost
to map glue (chunk slice-in + stacked DUS-out per iteration). Variants:

- map8    — current production path (m2trans_apply_microbatched).
- direct  — one m2trans_apply dispatch at batch 64 (the packed kernels
            walk image groups generically, so nb=8 groups should
            compile; the question is VMEM and scheduling).
- map16   — micro_batch 16 (halves the number of chunk boundaries).

MEASURED (r5, real v5e, trials=5, paired deltas): map8 53.3 ms/batch |
map16 +6.27 | direct +6.05. The production lax.map/micro-8 path wins;
the ~12% per-micro-batch overhead vs the standalone batch-8 program is
map glue that neither fewer chunk boundaries nor a single batch-64
dispatch recovers (direct batch-64 compiles fine — 8 packed image
groups — but schedules worse). BATCH64_r05.json stands.

Usage: python scripts/ab_batch64.py [batch]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import init_m2trans, policy_from_config  # noqa: E402
from m2trans_tpu.models.m2trans import (  # noqa: E402
    m2trans_apply,
    m2trans_apply_microbatched,
)
from scripts.ab import compare_fori  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    s, h = 4, 96
    cfg = Config(scale=s, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)

    def make_body(apply_fn):
        def body(xx):
            sc = xx.reshape(-1)[0].astype(jnp.float32) * 1e-30
            p = jax.tree_util.tree_map(
                lambda v: v + sc.astype(v.dtype), params)
            y = apply_fn(p, xx)
            m = y.astype(jnp.float32).mean()
            return xx * 0.999 + m * 1e-3
        return body

    bodies = {
        "map8": make_body(lambda p, xx: m2trans_apply_microbatched(
            p, xx, cfg, policy=policy, micro_batch=8)),
        "map16": make_body(lambda p, xx: m2trans_apply_microbatched(
            p, xx, cfg, policy=policy, micro_batch=16)),
        "direct": make_body(lambda p, xx: m2trans_apply(
            p, xx, cfg, policy=policy)),
    }
    # compile variants individually so one failure doesn't kill the A/B
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (batch, h, h, 3))
    ok = {}
    for name, body in bodies.items():
        try:
            np.asarray(jax.jit(body)(x0))[0, 0, 0]
            ok[name] = body
            print(f"compile {name}: ok", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"compile {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    slopes = compare_fori(ok, x0, n1=2, n2=8, trials=5)
    mpix = batch * (h * s) ** 2 / 1e6
    for name, sl in slopes.items():
        print(f"{name:<8} {mpix / sl:7.1f} MP/s", flush=True)


if __name__ == "__main__":
    main()
