"""Within-process GRAD-step baseline at every scale (canonical recipe:
batch 8, 384^2 SR output, bf16+Pallas training policy, L1 loss).

All scales compile first, then interleave through scripts.ab.compare
(ABBA, median of paired per-trial slopes) — the only statistic that
survives the axon tunnel's drift. jax.grad is the steadier proxy for the
train step (grad + optax update adds ~1-2 ms; NOTES_ROUND4.md). This is
the round-4 instrument for the backward work (VERDICT r3 item 2 targets:
x4 <= ~20, x3 <= ~60, x2 <= ~100 ms/step).

Usage: python scripts/ab_train_scales.py [scales ...]  (default 4 3 2)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

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
    scales = [int(a) for a in sys.argv[1:]] or [4, 3, 2]
    variants = {}

    for s in scales:
        h = OUT // s
        cfg = Config(scale=s, n_feats=64, n_blocks=8, colors=3,
                     dtype="bfloat16", use_pallas=True)
        policy = policy_from_config(cfg, for_training=True)
        params = init_m2trans(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (B, h, h, 3))
        y = jax.random.uniform(jax.random.PRNGKey(2), (B, OUT, OUT, 3))

        def loss_fn(p, xx, yy, cfg=cfg, policy=policy):
            sr = m2trans_apply(p, xx, cfg, policy=policy)
            return l1_loss(sr, yy)

        grad = jax.jit(jax.grad(loss_fn))

        def mk(grad=grad, params=params, x=x, y=y):
            state = {"x": x}

            def run(tick):
                g = grad(params, state["x"] + tick * 0.0, y)
                state["x"] = x + g["head"]["b"][0] * 1e-9
                return g["head"]["b"]
            return run

        variants[f"x{s}_grad"] = mk()

    compare(variants, (jnp.zeros(()),), feed=lambda prev, args: args,
            n1=4, n2=16, trials=5)


if __name__ == "__main__":
    main()
