"""Per-scale HBM roofline placement: is the wide x2 body leaving more
bandwidth idle than the x4 flagship?

SCALES_r05 measured x4 191.1 / x3 123.3 / x2 48.9 MP/s at the same
384^2 output — pixel-proportional to the body FLOPs, i.e. no dispatch
bug. This instrument asks the sharper question: at each scale, what
fraction of the HBM roofline does the compiled forward achieve? If x2
sits well below x4's 55.7% (ROOFLINE_r05), the wide-shape kernel
tilings/budgets are a real single-chip lever; if all three match,
the per-scale MP/s spread is pure byte-count and closed.

Same method as scripts/roofline.py (XLA post-fusion flops/bytes over
the device fori slope, params nudged per-iter so weights count as
steady-state traffic).

Usage: python scripts/roofline_scales.py [--out ROOFLINE_SCALES_rNN.json]
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

HBM_GBPS = 819.0
BF16_TFLOPS = 197.0
RIDGE = BF16_TFLOPS * 1e12 / (HBM_GBPS * 1e9)

BATCH, OUT = 8, 384  # same 384^2 output at every scale (SCALES recipe)


def device_slope(body, x0, n1=4, n2=16, trials=5):
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


def place(scale):
    h = OUT // scale
    cfg = Config(scale=scale, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, h, h, 3))

    def fwd(p, xx):
        return m2trans_apply(p, xx, cfg, policy=policy)

    compiled = jax.jit(fwd).lower(params, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_ = float(cost.get("bytes accessed", 0.0))

    def body(xx):
        sc = xx.reshape(-1)[0].astype(jnp.float32) * 1e-30
        p = jax.tree_util.tree_map(
            lambda v: v + sc.astype(v.dtype), params)
        y = fwd(p, xx)
        return xx * 0.999 + y.astype(jnp.float32).mean() * 1e-3

    sl = device_slope(body, x)
    gbps = bytes_ / sl / 1e9
    tflops = flops / sl / 1e12
    intensity = flops / bytes_
    return {
        "lr_size": h,
        "ms_per_step_device": round(sl * 1e3, 3),
        "mps": round(BATCH * OUT * OUT / sl / 1e6, 1),
        "xla_flops_per_step_G": round(flops / 1e9, 2),
        "xla_bytes_per_step_MB": round(bytes_ / 1e6, 1),
        "arithmetic_intensity_flop_per_byte": round(intensity, 1),
        "achieved_GBps": round(gbps, 1),
        "pct_of_hbm_roofline": round(100 * gbps / HBM_GBPS, 1),
        "achieved_TFLOPs": round(tflops, 2),
        "mfu_pct": round(100 * tflops / BF16_TFLOPS, 2),
        "bandwidth_bound_mfu_ceiling_pct":
            round(100 * min(1.0, intensity / RIDGE), 1),
    }


def main():
    out_path = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--out":
            out_path = args.pop(0)
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # warm the tunnel

    rec = {
        "metric": "per_scale_fwd_roofline_placement",
        "recipe": f"batch {BATCH}, {OUT}^2 output at x2/x3/x4, "
                  "bf16+Pallas, device fori slope; XLA post-fusion "
                  "cost analysis; ridge ~241 FLOP/byte",
        "scales": {},
    }
    for scale in (4, 3, 2):
        rec["scales"][f"x{scale}"] = place(scale)
        print(f"x{scale}: {json.dumps(rec['scales'][f'x{scale}'])}",
              flush=True)
    print(json.dumps(rec, indent=1), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
