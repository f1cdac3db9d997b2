"""Whole-model cost accounting, coarse: the component ablations
(ab_budget.py) attribute only ~3.7 ms of the ~6.6 ms flagship forward
and the tail internals all measure ~0 (ab_tail_parts*.py). Find the
rest: body total | attention kernels total | pack/unpack | floor.

All variants wrong-valued, dataflow/shapes preserved (ab.py paired
deltas are the statistic).

Usage: python scripts/ab_budget2.py [HW]
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
from scripts.ab import fresh, compare  # noqa: E402


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, hw, hw, 3))

    def fwd(xx):
        y = m2trans_apply(params, xx, cfg, policy=policy)
        return xx * 0.999 + y.astype(jnp.float32).mean() * 1e-3

    orig = {
        "core": pk.packed_cascade_core,
        "front": pk.packed_front_core,
        "front_tiled": pk.packed_front_tiled,
        "cftm": mm._cftm_apply_packed_core,
        "pack": pk.pack_body,
        "unpack": pk.unpack_body,
        "tail": mm.tail_apply,
    }

    def passthrough_attn(xp, ap, sp, tp, *a, **k):
        return xp

    def passthrough_cftm(p, xp, inv_p, t_p, *, policy, block, halo):
        return xp * (1.0 + inv_p.mean() * 1e-9).astype(xp.dtype)

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

    def cheap_tail(p, y, *, scale, policy, rgb_range=1.0):
        b, h, w, _ = y.shape
        return jnp.broadcast_to(
            y.astype(jnp.float32).mean(axis=-1, keepdims=True),
            (b, h, w, 1)).repeat(scale, 1).repeat(scale, 2) \
            .reshape(b, h * scale, w * scale, 1).repeat(3, -1) \
            .astype(y.dtype)

    variants = {}

    def build(name, patches):
        mods = {"core": pk, "front": pk, "front_tiled": pk, "pack": pk,
                "unpack": pk, "cftm": mm, "tail": mm}
        attrs = {"core": "packed_cascade_core",
                 "front": "packed_front_core",
                 "front_tiled": "packed_front_tiled",
                 "pack": "pack_body", "unpack": "unpack_body",
                 "cftm": "_cftm_apply_packed_core",
                 "tail": "tail_apply"}
        for k_, v in patches.items():
            setattr(mods[k_], attrs[k_], v)
        try:
            variants[name] = jax.jit(fresh(fwd)).lower(x).compile()
            print(f"  {name}: compiled", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED ({str(e)[:120]})", flush=True)
        finally:
            for k_ in patches:
                setattr(mods[k_], attrs[k_], orig[k_])

    build("full", {})
    build("no_attn", {"core": passthrough_attn,
                      "front": passthrough_attn,
                      "front_tiled": passthrough_attn})
    build("no_body", {"cftm": passthrough_cftm})
    build("no_packing", {"pack": cheap_pack, "unpack": cheap_unpack})
    build("floor", {"cftm": passthrough_cftm, "tail": cheap_tail,
                    "pack": cheap_pack, "unpack": cheap_unpack})

    compare(variants, (x,), n1=8, n2=40, trials=6)


if __name__ == "__main__":
    main()
