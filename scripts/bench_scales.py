"""Per-scale throughput with the canonical bench recipe: batch 8, 384^2
SR output at every scale (so the transformer body runs at 384/s squared),
bf16+Pallas.

r5: device-loop slope method (the chain runs INSIDE one jit via
lax.fori_loop; the slope between two loop lengths is pure device time —
the python-loop wall drifted up to +50% with tunnel conditions and
polluted the r3/r4 per-scale records). Writes --out JSON for the
round-over-round artifact.

Usage: python scripts/bench_scales.py [--out SCALES_rNN.json] [scales...]
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
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)


def main():
    out_path = None
    scales = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--out":
            out_path = args.pop(0)
        else:
            scales.append(int(a))
    scales = scales or [4, 3, 2]
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    batch, out = 8, 384

    results = {}
    for s in scales:
        h = w = out // s
        cfg = Config(scale=s, n_feats=64, n_blocks=8, colors=3,
                     dtype="bfloat16", use_pallas=True)
        policy = policy_from_config(cfg)
        params = init_m2trans(jax.random.PRNGKey(0), cfg)

        def body(xx, cfg=cfg, policy=policy, params=params):
            # data-dependent param perturbation + full-reduction feedback
            # (bench.py's anti-hoist/anti-DCE recipe)
            sc = xx.reshape(-1)[0].astype(jnp.float32) * 1e-30
            p = jax.tree_util.tree_map(
                lambda v: v + sc.astype(v.dtype), params)
            y = m2trans_apply(p, xx, cfg, policy=policy)
            m = y.astype(jnp.float32).mean()
            return xx * 0.999 + m * 1e-3

        x0 = jax.random.uniform(jax.random.PRNGKey(1), (batch, h, w, 3))
        n1, n2 = 4, 24
        chains = {n: jax.jit(lambda x, n=n, body=body: lax.fori_loop(
            0, n, lambda i, xx: body(xx), x)) for n in (n1, n2)}
        for n in (n1, n2):
            np.asarray(chains[n](x0))  # compile + warm

        def run(n):
            t0 = time.perf_counter()
            np.asarray(chains[n](x0))
            return time.perf_counter() - t0

        slopes = []
        for _ in range(5):
            t1, t2 = run(n1), run(n2)
            sl = (t2 - t1) / (n2 - n1)
            if sl > 0:
                slopes.append(sl)
        slopes.sort()
        best = slopes[len(slopes) // 2] if slopes else float("nan")
        mps = batch * (h * s) * (w * s) / 1e6 / best
        results[f"x{s}"] = {"mps": round(mps, 1),
                            "ms_per_batch_device": round(best * 1e3, 2),
                            "lr_size": h}
        print(f"x{s}: {mps:.1f} MP/s ({best * 1e3:.1f} ms/batch device, "
              f"LR {h}x{w})", flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump({"metric": "per_scale_output_mps_device_slope",
                       "recipe": "batch 8, 384^2 output, bf16+Pallas, "
                                 "device fori-loop slope",
                       "scales": results}, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
