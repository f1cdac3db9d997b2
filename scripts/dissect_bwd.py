"""DEPRECATED INSTRUMENT (r5): per-op device self-times double-count
overlapped work and python-loop chains clip at the ~4.4 ms dispatch
floor (NOTES_ROUND5 measurement-layer rebuild). Kept for the kernel
isolation harness only - do NOT quote its numbers for dispatch or
default decisions; use scripts/ab.py compare_fori ablations instead.

Per-component BACKWARD attribution at the flagship train shape.

Times jax.grad of each piece in isolation (serialized data-dependent
chains, min-of-trials — see tpu_timeit): the fused cascade branch per
DWT level, one whole CFTM, the upsampling tail, and the full model.
Expected per-step composition: 8 CFTMs x (L0 + L1 + 2xL2 branches + ff)
+ head + tail.

Usage: python scripts/dissect_bwd.py [component ...]
  components: branch0 branch1 branch2 cftm tail model (default: all)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
from m2trans_tpu.models.m2trans import cftm_apply  # noqa: E402
from m2trans_tpu.ops.pallas.halo_attn import cftm_branch_fused  # noqa: E402
from scripts.tpu_timeit import timeit  # noqa: E402

B, H, W, CB = 8, 96, 96, 16


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # tunnel warmup
    want = set(sys.argv[1:]) or {"branch0", "branch1", "branch2", "cftm",
                                 "tail", "model"}
    key = jax.random.PRNGKey(0)
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg, for_training=True)
    params = init_m2trans(key, cfg)

    # --- fused cascade branch per level ---
    for levels in (0, 1, 2):
        name = f"branch{levels}"
        if name not in want:
            continue
        c = CB * 4 ** levels
        w_qkv = (jax.random.normal(key, (c, 3 * c), jnp.bfloat16)
                 * (c ** -0.5))
        rel = jax.random.normal(key, (10, c // 2), jnp.float32)
        s = jnp.ones((B, CB), jnp.float32)
        t = jnp.zeros((B, CB), jnp.float32)

        def loss(x, w):
            out = cftm_branch_fused(x, w, rel, rel, s, t, levels=levels,
                                    interpret=False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gfn = jax.jit(jax.grad(loss, argnums=(0, 1)))

        def link(x, w):
            gx, gw = gfn(x, w)
            return (x + gx * 1e-6).astype(x.dtype)

        x0 = jax.random.normal(key, (B, H, W, CB), jnp.bfloat16)
        tb = timeit(link, x0, w_qkv, n=30, trials=4)
        print(f"branch L={levels} grad: {tb * 1e3:7.3f} ms/call "
              f"(x{8 if levels < 2 else 16}/step)", flush=True)

    # --- one whole CFTM ---
    if "cftm" in want:
        blk = params["body"][0]

        def loss_cftm(x, p):
            out = cftm_apply(p, x, policy=policy)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gfn = jax.jit(jax.grad(loss_cftm, argnums=(0, 1)))

        def link(x, p):
            gx, _ = gfn(x, p)
            return (x + gx * 1e-6).astype(x.dtype)

        x0 = jax.random.normal(key, (B, H, W, 4 * CB), jnp.bfloat16)
        tc = timeit(link, x0, blk, n=20, trials=4)
        print(f"one CFTM grad:      {tc * 1e3:7.3f} ms/call (x8/step)",
              flush=True)

    # --- tail (body output -> SR image) ---
    if "tail" in want:
        from m2trans_tpu.models.m2trans import tail_apply

        def loss_tail(x, p):
            out = tail_apply(p["tail"], x, scale=cfg.scale, policy=policy)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        have = True
        try:
            gfn = jax.jit(jax.grad(loss_tail, argnums=(0,)))
        except Exception as e:  # noqa: BLE001
            print(f"tail grad: skipped ({type(e).__name__}: {str(e)[:80]})")
            have = False
        if have:
            def link(x, p):
                (gx,) = gfn(x, p)
                return (x + gx * 1e-6).astype(x.dtype)

            x0 = jax.random.normal(key, (B, H, W, 4 * CB), jnp.bfloat16)
            try:
                tt = timeit(link, x0, params, n=20, trials=4)
                print(f"tail grad:          {tt * 1e3:7.3f} ms/call "
                      f"(x1/step)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"tail grad: FAIL {type(e).__name__}: {str(e)[:120]}")

    # --- full model ---
    if "model" in want:
        def loss_model(x, p):
            sr = m2trans_apply(p, x, cfg, policy=policy)
            return jnp.sum(sr.astype(jnp.float32) ** 2)

        gfn = jax.jit(jax.grad(loss_model, argnums=(0,)))

        def link(x, p):
            (gx,) = gfn(x, p)
            return (x + gx * 1e-6).astype(x.dtype)

        x0 = jax.random.uniform(key, (B, H, W, 3))
        tm = timeit(link, x0, params, n=10, trials=4)
        print(f"full model grad:    {tm * 1e3:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
