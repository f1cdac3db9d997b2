"""In-MODEL grad A/B: packed-front L=2 backward vs the tiled backward,
measured on the full train-policy grad program (the branch-isolated A/B
in ab_pf_bwd.py had +-100 ms trial noise; the L=2 branches cost 17.1 ms
of the 38.9 ms x4 grad per ab_budget_grad.py, so this deserves the
noise-robust instrument).

Usage: python scripts/ab_pf_model.py [SCALE] [SUB]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import m2trans_tpu.ops.pallas.halo_attn_packed as pk  # noqa: E402
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
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sub = int(sys.argv[2]) if len(sys.argv) > 2 else 2
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
    orig = pk.pick_packed_front_bwd

    variants = {}
    for name, pick in (
            ("bwd_tiled", lambda *a, **k: None),
            (f"bwd_pf_sub{sub}",
             lambda bsz, w, cb, levels, *a, s=sub, **k:
             (8, s, 32) if levels == 2 else None)):
        pk.pick_packed_front_bwd = pick
        try:
            variants[name] = jax.jit(
                lambda xx: grad(params, xx, y)["head"]["b"]) \
                .lower(x).compile()
            print(f"  {name}: compiled", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            print(f"  {name}: FAILED ({msg[:120]})", flush=True)
        finally:
            pk.pick_packed_front_bwd = orig

    def feed(prev, args):
        if prev is None:
            return args
        return (args[0] + prev[0] * 1e-9,)

    if len(variants) > 1:
        compare(variants, (x,), feed=feed, n1=4, n2=16, trials=5)


if __name__ == "__main__":
    main()
