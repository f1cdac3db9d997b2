"""A/B the packed backward kernel against the banded/tiled backward per
level and width on the real TPU.

Usage: python scripts/bench_packed_bwd.py [W ...]   (default 96 192)
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
    widths = [int(a) for a in sys.argv[1:]] or [96, 192]
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # tunnel warmup
    key = jax.random.PRNGKey(0)

    for w in widths:
        for levels, cb in ((0, 16), (1, 16), (2, 16)):
            c = cb * 4 ** levels
            w_qkv = (jax.random.normal(key, (c, 3 * c), jnp.bfloat16)
                     * (c ** -0.5))
            rel = jax.random.normal(key, (10, c // 2), jnp.float32)
            s = jnp.ones((B, cb), jnp.float32)
            t = jnp.zeros((B, cb), jnp.float32)
            x0 = jax.random.normal(key, (B, w, w, cb), jnp.bfloat16)
            gout = jax.random.normal(key, (B, w, w, cb), jnp.bfloat16)

            def lk(impl, **kw):
                fn = jax.jit(lambda xx: impl(
                    xx, None, s, t, w_qkv, rel, rel, gout, block=8,
                    halo=1, levels=levels, r=0.0, interpret=False,
                    **kw)[0])

                def link(xx):
                    return (xx + fn(xx) * 1e-6).astype(xx.dtype)
                return link

            # current dispatch path (banded or tiled)
            est_b = ha._banded_vmem_bytes(w, cb, c, 8, 1, levels)
            cur = "banded" if est_b <= ha._banded_limit(levels) else "tiled"
            impl = (ha._cascade_bwd_impl if cur == "banded"
                    else ha._cascade_bwd_tiled_impl)
            try:
                tc = timeit(lk(impl), x0, n=20, trials=4)
                print(f"W={w} L={levels} {cur}-bwd: {tc * 1e3:.3f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"W={w} L={levels} {cur}-bwd: FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)

            for g in (8, 4, 2):
                gc = g * c
                if B % g or gc < 128 or gc > 256:
                    continue
                est = pk.packed_bwd_vmem_bytes(w, cb, g, 8, 1, levels)
                try:
                    tp = timeit(lk(pk.packed_cascade_bwd_impl, g=g),
                                x0, n=20, trials=4)
                    print(f"W={w} L={levels} packed-bwd g={g} "
                          f"(est {est / 1e6:.1f}M): {tp * 1e3:.3f} ms",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"W={w} L={levels} packed-bwd g={g} "
                          f"(est {est / 1e6:.1f}M): FAIL "
                          f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
