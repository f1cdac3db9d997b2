"""HBM roofline placement of the flagship step: is 4% MFU actually slow?

The true device-time component map (NOTES_ROUND5) shows the step is
relayout/attention glue, not matmul — i.e. likely memory-bound, where
the speed-of-light metric is HBM bytes/s, not FLOP/s. This instrument
reads XLA's post-fusion cost analysis (`compiled.cost_analysis()`:
"flops" + "bytes accessed" — each fusion's HBM operand/result traffic;
Pallas custom calls report operand+result bytes, i.e. exactly their HBM
side, VMEM-internal traffic excluded) and divides by the measured
device fori-loop slope to place the program against both v5e ceilings:
HBM ~819 GB/s, bf16 MXU ~197 TFLOP/s.

Arithmetic-intensity ridge: 197e12/819e9 = ~240 FLOP/byte. Programs
below the ridge are bandwidth-bound and their MFU ceiling is
intensity/240, NOT 100%.

Usage: python scripts/roofline.py [--out ROOFLINE_rNN.json]
"""

import json
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

HBM_GBPS = 819.0          # v5e HBM bandwidth
BF16_TFLOPS = 197.0       # v5e bf16 MXU peak
RIDGE = BF16_TFLOPS * 1e12 / (HBM_GBPS * 1e9)  # ~240 FLOP/byte

BATCH, H, SCALE = 8, 96, 4


def cost_of(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return (float(cost.get("flops", 0.0)),
            float(cost.get("bytes accessed", 0.0)))


def device_slope(body, x0, n1=4, n2=32, trials=5):
    progs = {n: jax.jit(lambda x, n=n: lax.fori_loop(
        0, n, lambda i, xx: body(xx), x)) for n in (n1, n2)}
    for n in (n1, n2):
        np.asarray(progs[n](x0))
    slopes = []
    for _ in range(trials):
        ts = {}
        for n in (n1, n2):
            t0 = time.perf_counter()
            np.asarray(progs[n](x0))
            ts[n] = time.perf_counter() - t0
        sl = (ts[n2] - ts[n1]) / (n2 - n1)
        if sl > 0:
            slopes.append(sl)
    slopes.sort()
    return slopes[len(slopes) // 2]


def main():
    out_path = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--out":
            out_path = args.pop(0)
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # warm the tunnel

    cfg = Config(scale=SCALE, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, H, H, 3))

    def fwd(p, xx):
        return m2trans_apply(p, xx, cfg, policy=policy)

    flops, bytes_ = cost_of(fwd, params, x)

    def body(xx):
        sc = xx.reshape(-1)[0].astype(jnp.float32) * 1e-30
        p = jax.tree_util.tree_map(
            lambda v: v + sc.astype(v.dtype), params)
        y = fwd(p, xx)
        return xx * 0.999 + y.astype(jnp.float32).mean() * 1e-3

    sl = device_slope(body, x)
    # NOTE: the fori body re-derives params each iter (the +sc nudge
    # defeats loop-invariant hoisting so weights count as traffic, as in
    # steady-state serving where they stream from HBM every step).

    gbps = bytes_ / sl / 1e9
    tflops = flops / sl / 1e12
    intensity = flops / bytes_
    mfu_ceiling = min(1.0, intensity / RIDGE)
    rec = {
        "metric": "flagship_fwd_roofline_placement",
        "recipe": f"batch {BATCH}, {H}^2 -> {H * SCALE}^2 x{SCALE}, "
                  "bf16+Pallas, device fori slope; XLA post-fusion "
                  "cost analysis for flops/bytes",
        "ms_per_step_device": round(sl * 1e3, 3),
        "xla_flops_per_step_G": round(flops / 1e9, 2),
        "xla_bytes_per_step_MB": round(bytes_ / 1e6, 1),
        "arithmetic_intensity_flop_per_byte": round(intensity, 1),
        "ridge_flop_per_byte": round(RIDGE, 0),
        "achieved_GBps": round(gbps, 1),
        "hbm_peak_GBps": HBM_GBPS,
        "pct_of_hbm_roofline": round(100 * gbps / HBM_GBPS, 1),
        "achieved_TFLOPs": round(tflops, 2),
        "mfu_pct": round(100 * tflops / BF16_TFLOPS, 2),
        "bandwidth_bound_mfu_ceiling_pct": round(100 * mfu_ceiling, 1),
    }
    print(json.dumps(rec, indent=1), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
