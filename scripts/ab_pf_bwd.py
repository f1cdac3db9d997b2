"""Calibrate the packed-front L=2 BACKWARD on hardware: which (sub, slab)
compiles (scoped-VMEM), and how each compares to the column-slab tiled
backward on the x4 flagship branch shape.

Found r4: the r3-end snapshot's packed-front backward (sub=4, slab=32)
allocates 22.13M scoped VMEM vs the 16M ceiling — it NEVER compiled in a
real grad program; its estimator omitted the attention-adjoint live set
entirely. This script drives the branch-level grad through each forced
(sub, slab) and the tiled fallback, reporting compile ok/OOM and ABBA
paired slopes for the survivors.

Usage: python scripts/ab_pf_bwd.py [W] [LEVELS]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import m2trans_tpu.ops.pallas.halo_attn as ha  # noqa: E402
import m2trans_tpu.ops.pallas.halo_attn_packed as pk  # noqa: E402
from scripts.ab import compare  # noqa: E402


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    bsz, cb = 8, 16
    c = cb * 4 ** levels
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bsz, w, w, cb), jnp.bfloat16)
    wq = jax.random.normal(key, (c, 3 * c), jnp.bfloat16) * 0.05
    rh = jax.random.normal(key, (10, c // 2), jnp.float32)
    rw = jax.random.normal(key, (10, c // 2), jnp.float32)
    s = jnp.ones((bsz, cb), jnp.float32)
    t = jnp.zeros((bsz, cb), jnp.float32)

    def loss(xx, ww, rhh, rww):
        out = ha.cftm_branch_fused(xx, ww, rhh, rww, s, t, r=0.0,
                                   levels=levels)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2, 3))

    orig_pick = pk.pick_packed_front_bwd
    variants = {}

    def build(name, pick):
        pk.pick_packed_front_bwd = pick
        try:
            fn = jax.jit(lambda xx: grad(xx, wq, rh, rw)[0]).lower(x) \
                .compile()
            variants[name] = fn
            print(f"  {name}: compiled OK", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            key_ = ("Scoped allocation" if "Scoped allocation" in msg
                    else msg[:120])
            print(f"  {name}: FAILED ({key_})", flush=True)
        finally:
            pk.pick_packed_front_bwd = orig_pick

    build("tiled_r3", lambda *a, **k: None)
    for sub in (4, 2, 1):
        for slab in (32,):
            build(f"pf_sub{sub}_slab{slab}",
                  lambda *a, sub=sub, slab=slab, **k: (8, sub, slab))

    if len(variants) > 1:
        compare(variants, (x,), n1=4, n2=16, trials=5)


if __name__ == "__main__":
    main()
