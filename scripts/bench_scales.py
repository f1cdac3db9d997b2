"""Per-scale throughput with the canonical bench recipe: batch 8, 384^2
SR output at every scale (so the transformer body runs at 384/s squared),
bf16+Pallas, serialized-chain slope method.

Usage: python scripts/bench_scales.py [scales ...]   (default 4 3 2)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)


def chain(step, params, x0, n):
    x = x0
    t0 = time.perf_counter()
    for _ in range(n):
        x = step(params, x)
    np.asarray(x)
    return time.perf_counter() - t0


def main():
    scales = [int(a) for a in sys.argv[1:]] or [4, 3, 2]
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    batch, out = 8, 384

    for s in scales:
        h = w = out // s
        cfg = Config(scale=s, n_feats=64, n_blocks=8, colors=3,
                     dtype="bfloat16", use_pallas=True)
        policy = policy_from_config(cfg)
        params = init_m2trans(jax.random.PRNGKey(0), cfg)

        @jax.jit
        def step(p, x, cfg=cfg, policy=policy):
            y = m2trans_apply(p, x, cfg, policy=policy)
            m = y.astype(jnp.float32).mean()
            return x * 0.999 + m * 1e-3

        x0 = jax.random.uniform(jax.random.PRNGKey(1), (batch, h, w, 3))
        chain(step, params, x0, 1)  # compile
        n1, n2 = 2, 14
        slopes = []
        for _ in range(5):
            t1 = chain(step, params, x0, n1)
            t2 = chain(step, params, x0, n2)
            sl = (t2 - t1) / (n2 - n1)
            if sl > 0:
                slopes.append(sl)
        slopes.sort()
        best = slopes[len(slopes) // 2] if slopes else float("nan")
        mps = batch * (h * s) * (w * s) / 1e6 / best
        print(f"x{s}: {mps:.1f} MP/s ({best * 1e3:.1f} ms/batch, "
              f"LR {h}x{w})")


if __name__ == "__main__":
    main()
