"""In-model A/B: _FF_MODE 'unpack' (r3) vs 'fused' (packed ff conv
kernel) in the whole-body packed forward at the canonical bench recipe.

Usage: python scripts/ab_ff_fused.py [SCALE] [HW]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import m2trans_tpu.models.m2trans as mm  # noqa: E402
from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
from scripts.ab import fresh, compare  # noqa: E402


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 384 // scale
    cfg = Config(scale=scale, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, hw, hw, 3))

    def fwd(xx):
        y = m2trans_apply(params, xx, cfg, policy=policy)
        return xx * 0.999 + y.astype(jnp.float32).mean() * 1e-3

    variants = {}
    for mode in ("unpack", "fused", "skip"):
        mm._FF_MODE = mode
        try:
            variants[f"ff_{mode}"] = jax.jit(fresh(fwd)).lower(x).compile()
            print(f"  ff_{mode}: compiled OK", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            key_ = ("Scoped allocation" if "Scoped allocation" in msg
                    else msg[:120])
            print(f"  ff_{mode}: FAILED ({key_})", flush=True)
    mm._FF_MODE = "unpack"

    if len(variants) > 1:
        compare(variants, (x,), n1=8, n2=40, trials=6)


if __name__ == "__main__":
    main()
