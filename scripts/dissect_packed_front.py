"""DEPRECATED INSTRUMENT (r5): per-op device self-times double-count
overlapped work and python-loop chains clip at the ~4.4 ms dispatch
floor (NOTES_ROUND5 measurement-layer rebuild). Kept for the kernel
isolation harness only - do NOT quote its numbers for dispatch or
default decisions; use scripts/ab.py compare_fori ablations instead.

Device self-time comparison: current cascade dispatch vs the
packed-FRONT variant (packed affine/DWT/IWT, per-subgroup native-C
attention), all in ONE compiled program (robust to tunnel jitter).

Usage: python scripts/dissect_packed_front.py [levels] [W] [sub ...]
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
from m2trans_tpu.ops.pallas import halo_attn_packed as pk  # noqa: E402
from scripts.tpu_profile import trace_and_report  # noqa: E402

B = 8


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    subs = [int(a) for a in sys.argv[3:]] or [2]
    cb = 16
    c = cb * 4 ** levels
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))

    key = jax.random.PRNGKey(0)
    w_qkv = jax.random.normal(key, (c, 3 * c), jnp.bfloat16) * (c ** -0.5)
    rel = jax.random.normal(key, (10, c // 2), jnp.float32)
    s = jnp.ones((B, cb), jnp.float32)
    t = jnp.zeros((B, cb), jnp.float32)

    @jax.jit
    def step(x):
        acc = ha.cftm_branch_fused(x, w_qkv, rel, rel, s, t,
                                   levels=levels, interpret=False)
        for sub in subs:
            acc = acc + pk.packed_front_cascade_impl(
                x, None, s, t, w_qkv, rel, rel, block=8, halo=1,
                levels=levels, g=8, r=0.0, sub=sub, interpret=False)
        return (acc / (len(subs) + 1)).astype(x.dtype)

    x0 = jax.random.normal(key, (B, w, w, cb), jnp.bfloat16)
    trace_and_report(step, x0, steps=6)


if __name__ == "__main__":
    main()
