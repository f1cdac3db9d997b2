"""Batch-scaling A/B: microbatched forward variants at large batches.

Variants: concat (current unroll), dus (preallocated dynamic-update-slice
writes), map (lax.map stacked). Usage:
  python scripts/bench_batch.py [batches ...]   (default 8 32 64)
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
from m2trans_tpu.models.m2trans import MICRO_BATCH  # noqa: E402


def chain(step, params, x0, n):
    x = x0
    t0 = time.perf_counter()
    for _ in range(n):
        x = step(params, x)
    np.asarray(x)
    return time.perf_counter() - t0


def variant(name, cfg, policy):
    mb = MICRO_BATCH

    def fwd(params, x):
        b = x.shape[0]
        if b <= mb:
            return m2trans_apply(params, x, cfg, policy=policy)
        n = b // mb
        chunks = [m2trans_apply(params, x[i * mb:(i + 1) * mb], cfg,
                                policy=policy) for i in range(n)]
        if name == "concat":
            return jnp.concatenate(chunks, axis=0)
        if name == "dus":
            out = jnp.zeros((b,) + chunks[0].shape[1:], chunks[0].dtype)
            for i, ch in enumerate(chunks):
                out = jax.lax.dynamic_update_slice(
                    out, ch, (i * mb, 0, 0, 0))
            return out
        raise ValueError(name)

    def fwd_map(params, x):
        b = x.shape[0]
        xs = x.reshape((b // mb, mb) + x.shape[1:])
        ys = jax.lax.map(
            lambda xc: m2trans_apply(params, xc, cfg, policy=policy), xs)
        return ys.reshape((b,) + ys.shape[2:])

    return fwd_map if name == "map" else fwd


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8, 32, 64]
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    h = w = 96

    for b in batches:
        x0 = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3))
        names = ["concat", "dus", "map"] if b > MICRO_BATCH else ["concat"]
        for name in names:
            fwd = variant(name, cfg, policy)

            @jax.jit
            def step(p, x, fwd=fwd):
                y = fwd(p, x)
                m = y.astype(jnp.float32).mean()
                return x * 0.999 + m * 1e-3

            chain(step, params, x0, 1)
            n1, n2 = 2, max(3, 120 // b)
            slopes = []
            for _ in range(4):
                t1 = chain(step, params, x0, n1)
                t2 = chain(step, params, x0, n2)
                sl = (t2 - t1) / (n2 - n1)
                if sl > 0:
                    slopes.append(sl)
            slopes.sort()
            best = slopes[len(slopes) // 2] if slopes else float("nan")
            mps = b * (h * 4) * (w * 4) / 1e6 / best
            print(f"batch {b} [{name}]: {mps:.1f} MP/s "
                  f"({best * 1e3:.1f} ms/batch)")


if __name__ == "__main__":
    main()
