"""Large-batch serving throughput at the flagship recipe: batch 64 via
m2trans_apply_microbatched (lax.map over batch-8 chunks), device-loop
slope method (see scripts/bench_scales.py — the python-loop wall drifts
with tunnel conditions; the in-jit fori chain slope is pure device time).

Usage: python scripts/bench_batch64.py [--out BATCH64_rNN.json] [batch]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    policy_from_config,
)
from m2trans_tpu.models.m2trans import (  # noqa: E402
    m2trans_apply_microbatched,
)


def main():
    out_path = None
    batch = 64
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--out":
            out_path = args.pop(0)
        else:
            batch = int(a)
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # warm the tunnel

    s, h = 4, 96
    cfg = Config(scale=s, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)

    def body(xx):
        sc = xx.reshape(-1)[0].astype(jnp.float32) * 1e-30
        p = jax.tree_util.tree_map(
            lambda v: v + sc.astype(v.dtype), params)
        y = m2trans_apply_microbatched(p, xx, cfg, policy=policy)
        m = y.astype(jnp.float32).mean()
        return xx * 0.999 + m * 1e-3

    x0 = jax.random.uniform(jax.random.PRNGKey(1), (batch, h, h, 3))
    n1, n2 = 2, 10
    chains = {n: jax.jit(lambda x, n=n: lax.fori_loop(
        0, n, lambda i, xx: body(xx), x)) for n in (n1, n2)}
    for n in (n1, n2):
        np.asarray(chains[n](x0))

    def run(n):
        t0 = time.perf_counter()
        np.asarray(chains[n](x0))
        return time.perf_counter() - t0

    slopes = []
    for _ in range(5):
        t1, t2 = run(n1), run(n2)
        sl = (t2 - t1) / (n2 - n1)
        if sl > 0:
            slopes.append(sl)
    slopes.sort()
    best = slopes[len(slopes) // 2] if slopes else float("nan")
    mps = batch * (h * s) ** 2 / 1e6 / best
    print(f"batch {batch}: {mps:.1f} MP/s "
          f"({best * 1e3:.1f} ms/batch device)", flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump({"metric": "large_batch_serving_mps_device_slope",
                       "recipe": f"batch {batch} via lax.map micro-batch "
                                 "8, x4 96->384, bf16+Pallas",
                       "mps": round(mps, 1),
                       "ms_per_batch_device": round(best * 1e3, 2)},
                      f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
