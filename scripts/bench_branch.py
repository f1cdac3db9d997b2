"""A/B the fused branch kernel's per-band schedule (serial vs batched) on
the real TPU, per wavelet level, at flagship shapes.

Usage: python scripts/bench_branch.py [batch]
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

import m2trans_tpu.ops.pallas.halo_attn as ha  # noqa: E402


def chain(fn, x0, n):
    x = x0
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    np.asarray(x)
    return time.perf_counter() - t0


def slope(fn, x0, n1=3, n2=19, trials=5):
    chain(fn, x0, 1)  # compile
    best = []
    for _ in range(trials):
        t1 = chain(fn, x0, n1)
        t2 = chain(fn, x0, n2)
        s = (t2 - t1) / (n2 - n1)
        if s > 0:
            best.append(s)
    best.sort()
    return best[len(best) // 2] if best else float("nan")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # tunnel warmup

    key = jax.random.PRNGKey(0)
    for levels, cb in ((0, 16), (1, 16), (2, 16)):
        c = cb * 4 ** levels
        w_qkv = (jax.random.normal(key, (c, 3 * c), jnp.bfloat16)
                 * (c ** -0.5))
        rel = jax.random.normal(key, (10, c // 2), jnp.float32)
        x0 = jax.random.normal(key, (batch, 96, 96, cb), jnp.bfloat16)

        for sched in ("serial", "batched"):
            ha._FORCE_SCHEDULE = sched

            @jax.jit
            def step(x):
                y = ha.halo_attention_qkv_fused(x, w_qkv, rel, rel,
                                                block=8, halo=1,
                                                levels=levels)
                return x * 0.999 + y * 1e-3

            t = slope(step, x0)
            print(f"L={levels} cb={cb} {sched:8s}: {t * 1e3:7.3f} ms/call",
                  flush=True)
        ha._FORCE_SCHEDULE = None


if __name__ == "__main__":
    main()
