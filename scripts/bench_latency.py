"""Single-frame serving latency artifact (VERDICT r3 item 4): p50/p90/p99
through the streaming runner (f32 out and on-device-u8 out), plus
device-only step time via a serialized chain (separating compute from the
remote tunnel's ~60-120 ms RTT) — written as a diffable per-round JSON.

Usage: python scripts/bench_latency.py [--out LATENCY_rNN.json] [sizes...]
       (default sizes 96 256 512; no --out -> print only)
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

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import init_m2trans  # noqa: E402
from m2trans_tpu.parallel.streaming import StreamingSR  # noqa: E402


def main():
    out_path = None
    sizes = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--out":
            out_path = args.pop(0)
        else:
            sizes.append(int(a))
    sizes = sizes or [96, 256, 512]

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    result = {"metric": "x4_single_frame_latency", "unit": "ms",
              "note": ("streaming percentiles include the axon-tunnel "
                       "fetch (transfer-bound at large sizes; PCIe-class "
                       "on local hosts); device_chain_ms is the "
                       "serialized-chain compute slope"),
              "sizes": {}}

    for hw in sizes:
        frames = [rng.uniform(0, 1, (1, hw, hw, 3)).astype(np.float32)
                  for _ in range(24)]
        entry = {}
        for label, u8 in (("f32", False), ("u8", True)):
            runner = StreamingSR(params, cfg, output_u8=u8)
            runner.warmup(frames[0].shape)
            for _ in runner.stream(frames, collect_stats=True):
                pass
            stats = runner.latency_percentiles()
            entry[label] = {k: round(v * 1e3, 1)
                            for k, v in stats.items()
                            if k.startswith("p")}

        # device-only: serialized chain (output feeds input), slope method
        runner = StreamingSR(params, cfg)
        runner.warmup(frames[0].shape)
        fwd = runner._fwd

        def chain(n):
            x = jnp.asarray(frames[0])
            t0 = time.perf_counter()
            for _ in range(n):
                y = fwd(params, x)
                m = y.astype(jnp.float32).mean()
                x = jnp.asarray(frames[0]) * 0.999 + m * 1e-3
            np.asarray(x)
            return time.perf_counter() - t0

        chain(1)
        slopes = []
        for _ in range(4):
            t1, t2 = chain(2), chain(10)
            s = (t2 - t1) / 8
            if s > 0:
                slopes.append(s)
        slopes.sort()
        dev = slopes[len(slopes) // 2] if slopes else float("nan")
        entry["device_chain_ms"] = round(dev * 1e3, 1)
        result["sizes"][f"{hw}x{hw}"] = entry
        print(f"{hw}x{hw} -> x4: f32 p50 {entry['f32'].get('p50_s', '?')}"
              f" ms, u8 p50 {entry['u8'].get('p50_s', '?')} ms, "
              f"device-chain {entry['device_chain_ms']} ms/frame",
              flush=True)

    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
