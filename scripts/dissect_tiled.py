"""DEPRECATED INSTRUMENT (r5): per-op device self-times double-count
overlapped work and python-loop chains clip at the ~4.4 ms dispatch
floor (NOTES_ROUND5 measurement-layer rebuild). Kept for the kernel
isolation harness only - do NOT quote its numbers for dispatch or
default decisions; use scripts/ab.py compare_fori ablations instead.

Device self-time: current cascade dispatch vs the column-slab tiled
cascade, per level, at wide widths (x2/x3 bodies, large frames).

Usage: python scripts/dissect_tiled.py [levels] [W] [batch]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from m2trans_tpu.ops.pallas import halo_attn as ha  # noqa: E402
from scripts.tpu_profile import trace_and_report  # noqa: E402


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cb = 16
    c = cb * 4 ** levels
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))

    key = jax.random.PRNGKey(0)
    w_qkv = jax.random.normal(key, (c, 3 * c), jnp.bfloat16) * (c ** -0.5)
    rel = jax.random.normal(key, (10, c // 2), jnp.float32)
    s = jnp.ones((batch, cb), jnp.float32)
    t = jnp.zeros((batch, cb), jnp.float32)

    @jax.jit
    def step(x):
        cur = ha.cftm_branch_fused(x, w_qkv, rel, rel, s, t,
                                   levels=levels, interpret=False)
        til = ha._cascade_tiled_impl(x, None, s, t, w_qkv, rel, rel,
                                     block=8, halo=1, levels=levels,
                                     r=0.0, interpret=False)
        return ((cur + til) * 0.5).astype(x.dtype)

    x0 = jax.random.normal(key, (batch, w, w, cb), jnp.bfloat16)
    trace_and_report(step, x0, steps=6)


if __name__ == "__main__":
    main()
