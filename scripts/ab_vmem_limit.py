"""A/B: does RAISING the scoped-VMEM compiler limit help the flagship?

The 16 MiB "scoped VMEM ceiling" every kernel gate in this repo is
calibrated against is the XLA flag default
(``xla_tpu_scoped_vmem_limit_kib=16384``), not the physical VMEM
(v5e has far more). Raising it gives the XLA *fusion* passes bigger
scratch buffers — in a bandwidth-bound program (ROOFLINE_r05: 56% of
HBM peak, intensity below the ridge) bigger fusions can mean fewer HBM
round trips, with zero code changes. Raising it only ADDS headroom for
the Pallas kernels (they budget 14e6 against the default ceiling).

Stage 1 (compile-only, exact): bytes-accessed at limits 16/32/64 MiB.
Stage 2 (only if bytes drop or to confirm a wash): device fori slope
per limit — separate jit instances with distinct compiler_options, so
no trace-cache hazard; same program otherwise.

Usage: python scripts/ab_vmem_limit.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import init_m2trans, policy_from_config  # noqa: E402
from m2trans_tpu.models.m2trans import m2trans_apply  # noqa: E402

BATCH, H, SCALE = 8, 96, 4
LIMITS_KIB = [16 * 1024, 32 * 1024, 64 * 1024]


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # warm the tunnel

    cfg = Config(scale=SCALE, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, H, H, 3))

    def fwd(p, xx):
        return m2trans_apply(p, xx, cfg, policy=policy)

    def body(xx):
        sc = xx.reshape(-1)[0].astype(jnp.float32) * 1e-30
        p = jax.tree_util.tree_map(
            lambda v: v + sc.astype(v.dtype), params)
        y = fwd(p, xx)
        return xx * 0.999 + y.astype(jnp.float32).mean() * 1e-3

    compiled = {}
    for kib in LIMITS_KIB:
        opts = {"xla_tpu_scoped_vmem_limit_kib": kib}
        try:
            cs = {}
            for n in (4, 32):
                cs[n] = jax.jit(
                    lambda xx, n=n: lax.fori_loop(
                        0, n, lambda i, z: body(z), xx),
                    compiler_options=opts).lower(x).compile()
            cost = cs[32].cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            print(f"limit {kib//1024:3d} MiB: compiled; chain-32 bytes "
                  f"{float(cost.get('bytes accessed', 0))/1e6:.0f} MB, "
                  f"flops {float(cost.get('flops', 0))/1e9:.0f} G",
                  flush=True)
            compiled[kib] = cs
        except Exception as e:  # noqa: BLE001
            print(f"limit {kib//1024:3d} MiB: COMPILE FAILED: "
                  f"{str(e)[:200]}", flush=True)

    # device slopes, interleaved ABBA-style across limits
    for kib, cs in compiled.items():
        for n in (4, 32):
            np.asarray(cs[n](x))  # warm
    slopes = {kib: [] for kib in compiled}
    for _ in range(6):
        for kib, cs in compiled.items():
            ts = {}
            for n in (4, 32):
                t0 = time.perf_counter()
                np.asarray(cs[n](x))
                ts[n] = time.perf_counter() - t0
            sl = (ts[32] - ts[4]) / 28
            if sl > 0:
                slopes[kib].append(sl * 1e3)
    for kib, ss in slopes.items():
        ss.sort()
        med = ss[len(ss) // 2] if ss else float("nan")
        print(f"limit {kib//1024:3d} MiB: median device slope "
              f"{med:.3f} ms/step ({[f'{s:.3f}' for s in ss]})",
              flush=True)


if __name__ == "__main__":
    main()
