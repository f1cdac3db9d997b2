"""In-context step budget: ablate one component at a time in the REAL
flagship forward and interleave all variants in one process (ab.py).

Each variant monkeypatches ONE component to a passthrough before
tracing; outputs become wrong, dataflow/layouts stay. The full-vs-
ablated slope difference is that component's EXPOSED cost (self time
minus whatever the device was hiding under it) — the honest number for
deciding what to optimize next.

Usage: python scripts/ab_budget.py [HW]
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
import m2trans_tpu.models.m2trans as mm  # noqa: E402
import m2trans_tpu.ops.pallas.halo_attn_packed as pk  # noqa: E402
from scripts.ab import compare  # noqa: E402


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, hw, hw, 3))

    def fwd(xx, eps):
        y = m2trans_apply(params, xx, cfg, policy=policy)
        return xx * 0.999 + y.astype(jnp.float32).mean() * eps

    orig = {
        "core": pk.packed_cascade_core,       # L=0 branch
        "front": pk.packed_front_core,        # L=1/L=2 branches
        "front_tiled": pk.packed_front_tiled,
        "tail": mm.tail_apply,
        "stats": mm._packed_in_stats,
        "conv2d": mm.conv2d,
    }

    def passthrough_core(xp, ap, sp, tp, *a, **k):
        return xp

    def passthrough_front(xp, ap, sp, tp, *a, **k):
        return xp

    def cheap_tail(p, y, *, scale, policy, rgb_range=1.0):
        # keep shapes: broadcast a 1x upsample (wrong values, right dims)
        b, h, w, _ = y.shape
        return jnp.broadcast_to(
            y.astype(jnp.float32).mean(axis=-1, keepdims=True),
            (b, h, w, 1)).repeat(scale, 1).repeat(scale, 2) \
            .reshape(b, h * scale, w * scale, 1).repeat(3, -1) \
            .astype(y.dtype)

    def cheap_stats(xp):
        bp, _, _, gc = xp.shape
        return (jnp.ones((bp, gc), jnp.float32),
                jnp.zeros((bp, gc), jnp.float32))

    variants = {}

    def build(name, patches, eps):
        for k_, v in patches.items():
            setattr(pk if k_ in ("core", "front", "front_tiled") else mm,
                    {"core": "packed_cascade_core",
                     "front": "packed_front_core",
                     "front_tiled": "packed_front_tiled",
                     "tail": "tail_apply",
                     "stats": "_packed_in_stats",
                     "conv2d": "conv2d"}[k_], v)
        try:
            variants[name] = jax.jit(
                lambda xx, e=eps: fwd(xx, e)).lower(x).compile()
        finally:
            for k_ in patches:
                setattr(pk if k_ in ("core", "front", "front_tiled")
                        else mm,
                        {"core": "packed_cascade_core",
                         "front": "packed_front_core",
                         "front_tiled": "packed_front_tiled",
                         "tail": "tail_apply",
                         "stats": "_packed_in_stats",
                         "conv2d": "conv2d"}[k_], orig[k_])

    build("full", {}, 1e-3)
    build("no_l0", {"core": passthrough_core}, 1.01e-3)
    build("no_l1l2", {"front": passthrough_front,
                      "front_tiled": passthrough_front}, 1.02e-3)
    build("no_tail", {"tail": cheap_tail}, 1.03e-3)
    build("no_stats", {"stats": cheap_stats}, 1.04e-3)

    compare(variants, (x,), n1=8, n2=40, trials=6)


if __name__ == "__main__":
    main()
