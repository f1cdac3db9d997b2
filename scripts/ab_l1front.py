"""A/B: branch-2 restacked g=4 pack vs the L=1 packed-attention front.

Variant A (r3): XLA lane-half restack -> packed_cascade_core g=4 -> XLA
restack back. Variant B (r4): packed_front_core levels=1 g=8 sub=4 on
the 128-lane block directly. Plus the whole-model forward (dispatch now
picks B inside _cftm_apply_fused_packed).

Usage: python scripts/ab_l1front.py [W]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from m2trans_tpu.ops.pallas import halo_attn_packed as pk  # noqa: E402
from scripts.ab import compare  # noqa: E402


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    b, h, cb = 8, 96, 16
    c = cb * 4
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((1, h, w, 128)), jnp.bfloat16)
    sp = jnp.asarray(rng.uniform(0.5, 1.5, (1, 128)), jnp.float32)
    tp = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 128)), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((c, 3 * c)) * c ** -0.5,
                     jnp.bfloat16)
    rh = jnp.asarray(rng.standard_normal((10, c // 2)) * 0.3, jnp.float32)
    rw = jnp.asarray(rng.standard_normal((10, c // 2)) * 0.3, jnp.float32)
    kw = dict(cb=cb, block=8, halo=1, r=0.0, interpret=False,
              precision=None)

    def restacked(xq):
        x2h = jnp.concatenate([xq[..., :64], xq[..., 64:]], axis=0)
        s2h = jnp.concatenate([sp[:, :64], sp[:, 64:]], axis=0)
        t2h = jnp.concatenate([tp[:, :64], tp[:, 64:]], axis=0)
        gs = pk.pick_packed_tiled(b, w, cb, 1)
        if pk.pick_pack_g(b, w, cb, 1) == 4:
            oh = pk.packed_cascade_core(x2h, None, s2h, t2h, wq, rh, rw,
                                        levels=1, g=4, **kw)
        else:
            oh = pk.packed_cascade_tiled(x2h, None, s2h, t2h, wq, rh, rw,
                                         levels=1, g=gs[0], slab=gs[1],
                                         **kw)
        return jnp.concatenate([oh[:1], oh[1:]], axis=-1)

    def front(xq):
        pf = pk.pick_packed_front(b, w, cb, 1)
        if pf is not None:
            return pk.packed_front_core(xq, None, sp, tp, wq, rh, rw,
                                        levels=1, g=8, sub=pf[1], **kw)
        g_, sub_, slab_ = pk.pick_packed_front_tiled(b, w, cb, 1)
        return pk.packed_front_tiled(xq, None, sp, tp, wq, rh, rw,
                                     levels=1, g=g_, sub=sub_, slab=slab_,
                                     **kw)

    print(f"W={w} front={pk.pick_packed_front(b, w, cb, 1)} "
          f"tiled={pk.pick_packed_front_tiled(b, w, cb, 1)}")
    compare({"restacked": jax.jit(restacked), "front": jax.jit(front)},
            (xp,), n1=8, n2=64, trials=5)


if __name__ == "__main__":
    main()
