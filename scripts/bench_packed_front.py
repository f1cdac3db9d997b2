"""A/B the packed-FRONT cascade variant (packed affine/DWT/IWT,
per-subgroup native-C attention) against the current dispatch per level
and width, on the real TPU.

Usage: python scripts/bench_packed_front.py [W ...]   (default 96 128 192)
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
from scripts.tpu_timeit import timeit  # noqa: E402

B = 8


def main():
    widths = [int(a) for a in sys.argv[1:]] or [96, 128, 192]
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # tunnel warmup
    key = jax.random.PRNGKey(0)

    for w in widths:
        for levels, cb in ((1, 16), (2, 16)):
            c = cb * 4 ** levels
            w_qkv = (jax.random.normal(key, (c, 3 * c), jnp.bfloat16)
                     * (c ** -0.5))
            rel = jax.random.normal(key, (10, c // 2), jnp.float32)
            s = jnp.ones((B, cb), jnp.float32)
            t = jnp.zeros((B, cb), jnp.float32)
            x0 = jax.random.normal(key, (B, w, w, cb), jnp.bfloat16)

            @jax.jit
            def cur(x):
                return ha.cftm_branch_fused(
                    x, w_qkv, rel, rel, s, t, levels=levels,
                    interpret=False).astype(x.dtype)

            try:
                tc = timeit(cur, x0, n=30, trials=4)
                print(f"W={w} L={levels} current-dispatch: "
                      f"{tc * 1e3:.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"W={w} L={levels} current-dispatch: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

            for g, sub in ((8, 2), (8, 4), (4, 2)):
                if B % g:
                    continue
                estp = pk.packed_front_vmem_bytes(w, cb, g, 8, 1, levels)

                @jax.jit
                def pac(x, g=g, sub=sub):
                    return pk.packed_front_cascade_impl(
                        x, None, s, t, w_qkv, rel, rel, block=8, halo=1,
                        levels=levels, g=g, r=0.0, sub=sub,
                        interpret=False).astype(x.dtype)

                try:
                    tp = timeit(pac, x0, n=30, trials=4)
                    print(f"W={w} L={levels} packed-front g={g} sub={sub} "
                          f"(est {estp / 1e6:.1f}M): {tp * 1e3:.3f} ms",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"W={w} L={levels} packed-front g={g} sub={sub} "
                          f"(est {estp / 1e6:.1f}M): FAIL "
                          f"{type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
