"""TRUE device-time component budget for the flagship forward.

Like ab_budget.py (ablate one component, measure paired slope deltas),
but the chain runs INSIDE one jit via lax.fori_loop (scripts.ab
.compare_fori), so per-iteration slopes are pure device time — the
python-loop version sits on a ~4.4 ms/call tunnel dispatch floor
(scripts/ab_floor.py) that hides everything below it.

Patches are applied inside each body function (executed at trace time),
so each variant genuinely re-traces with its ablation active.

Usage: python scripts/ab_budget3.py [HW]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import m2trans_tpu.models.m2trans as mm  # noqa: E402
import m2trans_tpu.ops.pallas.halo_attn_packed as pk  # noqa: E402
from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
from scripts.ab import compare_fori  # noqa: E402

_ATTRS = {
    "core": (pk, "packed_cascade_core"),     # L=0 branch kernel
    "front": (pk, "packed_front_core"),      # L=1/L=2 branch kernels
    "front_tiled": (pk, "packed_front_tiled"),
    "tail": (mm, "tail_apply"),
    "stats": (mm, "_packed_in_stats"),
    "pack": (pk, "pack_body"),
    "unpack": (pk, "unpack_body"),
    "ff_mode": (mm, "_FF_MODE"),
}


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (8, hw, hw, 3))

    def passthrough_attn(xp, ap, sp, tp, *a, **k):
        return xp

    def cheap_tail(p, y, *, scale, policy, rgb_range=1.0):
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

    def cheap_pack(xx, g):
        b, h, w, c = xx.shape
        return jnp.broadcast_to(xx[: b // g, :, :, None, :],
                                (b // g, h, w, g, c)) \
            .reshape(b // g, h, w, g * c)

    def cheap_unpack(xp, g):
        bp, h, w, gc = xp.shape
        return jnp.broadcast_to(xp[:, :, :, None, : gc // g],
                                (bp, h, w, g, gc // g)) \
            .reshape(bp * g, h, w, gc // g)

    def make_body(patches, eps):
        def body(xx):
            saved = {}
            for k_, v in patches.items():
                mod, attr = _ATTRS[k_]
                saved[k_] = getattr(mod, attr)
                setattr(mod, attr, v)
            try:
                y = m2trans_apply(params, xx, cfg, policy=policy)
                return xx * 0.999 + y.astype(jnp.float32).mean() * eps
            finally:
                for k_, old in saved.items():
                    mod, attr = _ATTRS[k_]
                    setattr(mod, attr, old)
        return body

    bodies = {
        "full": make_body({}, 1e-3),
        "trivial": lambda xx: xx * 0.999 + xx.mean() * 1e-3,
        "no_l0": make_body({"core": passthrough_attn}, 1.01e-3),
        "no_l1l2": make_body({"front": passthrough_attn,
                              "front_tiled": passthrough_attn}, 1.02e-3),
        "no_tail": make_body({"tail": cheap_tail}, 1.03e-3),
        "no_stats": make_body({"stats": cheap_stats}, 1.04e-3),
        "no_ff": make_body({"ff_mode": "skip"}, 1.05e-3),
        "no_packing": make_body({"pack": cheap_pack,
                                 "unpack": cheap_unpack}, 1.06e-3),
    }

    compare_fori(bodies, x0, n1=4, n2=32, trials=6)


if __name__ == "__main__":
    main()
