"""HBM traffic attribution for the flagship forward (compile-only).

Companion to scripts/roofline.py (which placed the step at 55.7% of the
HBM roofline, 2.94 GB/step): ablates one component at a time (the
ab_budget3 patch set) and reads XLA's post-fusion "bytes accessed" for
each compiled program. byte-DELTAS vs the full program attribute the
traffic; unlike time deltas these do not overlap, so they add up (plus
the ablation stand-ins' own small traffic).

Usage: python scripts/traffic_map.py [HW]
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
from scripts.ab_budget3 import _ATTRS  # noqa: E402  (same patch table)


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x0 = jnp.zeros((8, hw, hw, 3), jnp.float32)

    # the ablation stand-ins are closures inside ab_budget3.main, so the
    # tiny ones are re-declared here

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

    variants = {
        "full": {},
        "no_l0": {"core": passthrough_attn},
        "no_l1l2": {"front": passthrough_attn,
                    "front_tiled": passthrough_attn},
        "no_tail": {"tail": cheap_tail},
        "no_stats": {"stats": cheap_stats},
        "no_ff": {"ff_mode": "skip"},
        "no_packing": {"pack": cheap_pack, "unpack": cheap_unpack},
    }

    def bytes_of(patches):
        saved = {}
        for k_, v in patches.items():
            mod, attr = _ATTRS[k_]
            saved[k_] = getattr(mod, attr)
            setattr(mod, attr, v)
        try:
            def fwd(p, xx):
                return m2trans_apply(p, xx, cfg, policy=policy)
            compiled = jax.jit(fwd).lower(params, x0).compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            return (float(cost.get("bytes accessed", 0.0)),
                    float(cost.get("flops", 0.0)))
        finally:
            for k_, old in saved.items():
                mod, attr = _ATTRS[k_]
                setattr(mod, attr, old)

    base_b = base_f = None
    for name, patches in variants.items():
        b, f = bytes_of(patches)
        if name == "full":
            base_b, base_f = b, f
            print(f"{name:<12} {b / 1e6:8.1f} MB  {f / 1e9:7.1f} GF",
                  flush=True)
        else:
            print(f"{name:<12} {b / 1e6:8.1f} MB  {f / 1e9:7.1f} GF   "
                  f"component: {(base_b - b) / 1e6:+8.1f} MB "
                  f"{(base_f - f) / 1e9:+7.1f} GF", flush=True)


if __name__ == "__main__":
    main()
