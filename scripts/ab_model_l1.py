"""Within-process model A/B: branch-2 restack path vs L=1 front kernel.

Builds the flagship forward twice — once with pick_packed_front gated
off for levels=1 (the r3 restack path) and once with it on — in the
SAME process, interleaved chains (scripts/ab.py).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
from m2trans_tpu.ops.pallas import halo_attn_packed as pk  # noqa: E402
from scripts.ab import fresh, compare  # noqa: E402


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, hw, hw, 3))

    orig_pf = pk.pick_packed_front
    orig_pft = pk.pick_packed_front_tiled

    def gated_pf(bsz, w, cb, levels, block=8, halo=1):
        if levels == 1:
            return None
        return orig_pf(bsz, w, cb, levels, block, halo)

    def gated_pft(bsz, w, cb, levels, block=8, halo=1):
        if levels == 1:
            return None
        return orig_pft(bsz, w, cb, levels, block, halo)

    def fwd(xx):
        y = m2trans_apply(params, xx, cfg, policy=policy)
        return xx * 0.999 + y.astype(jnp.float32).mean() * 1e-3

    # trace variant A with the gate patched OUT (restack), B with it on
    import m2trans_tpu.models.m2trans as mm

    del mm
    pk.pick_packed_front = gated_pf
    pk.pick_packed_front_tiled = gated_pft
    a = jax.jit(fresh(fwd)).lower(x).compile()
    pk.pick_packed_front = orig_pf
    pk.pick_packed_front_tiled = orig_pft
    b = jax.jit(lambda xx: fwd(xx) + 0.0).lower(x).compile()

    compare({"restack_r3": a, "front_r4": b}, (x,), n1=8, n2=40,
            trials=6)


if __name__ == "__main__":
    main()
