"""A/B the AD-context forward dispatch: conservative (banded) vs
column-slab packed-front kernels inside the grad program (the x2
fwd-in-grad gap, NOTES_ROUND4 'Remaining backward levers' #2).

The custom_vjp fwd rule normally refuses every packed-front kernel
(full-width variants were scoped-VMEM-marginal in grad programs, r3);
the column-slab variants are budgeted robust, so this measures whether
letting the AD forward use them closes the gap — and whether the grad
program still compiles with them inside.

Usage: python scripts/ab_ad_fwd.py [SCALE]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import m2trans_tpu.ops.pallas.halo_attn as ha  # noqa: E402
from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.losses.pixel import l1_loss  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
from scripts.ab import compare  # noqa: E402

B, OUT = 8, 384


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    h = OUT // scale
    cfg = Config(scale=scale, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg, for_training=True)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, h, h, 3))
    y = jax.random.uniform(jax.random.PRNGKey(2), (B, OUT, OUT, 3))

    def loss_fn(p, xx, yy):
        return l1_loss(m2trans_apply(p, xx, cfg, policy=policy), yy)

    grad = jax.grad(loss_fn)

    variants = {}
    for name, flag in (("conservative", True), ("pft_in_ad", False)):
        ha._AD_CONSERVATIVE = flag
        try:
            fn = jax.jit(lambda xx: grad(params, xx, y)["head"]["b"]) \
                .lower(x).compile()
            variants[name] = fn
            print(f"  {name}: compiled OK", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            key_ = ("Scoped allocation" if "Scoped allocation" in msg
                    else msg[:120])
            print(f"  {name}: FAILED ({key_})", flush=True)
    ha._AD_CONSERVATIVE = True

    if len(variants) > 1:
        def feed(prev, args):
            if prev is None:
                return args
            return (args[0] + prev[0] * 1e-9,)

        compare(variants, (x,), feed=feed, n1=4, n2=16, trials=5)


if __name__ == "__main__":
    main()
