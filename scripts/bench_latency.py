"""Single-frame serving latency (p50/p90) through the streaming runner,
plus device-only step time via a serialized chain (separating compute
from the remote tunnel's ~60-120 ms RTT).

Usage: python scripts/bench_latency.py [sizes ...]   (default 96 256 512)
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

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import init_m2trans  # noqa: E402
from m2trans_tpu.parallel.streaming import StreamingSR  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [96, 256, 512]
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    runner = StreamingSR(params, cfg)
    rng = np.random.default_rng(0)

    for hw in sizes:
        frames = [rng.uniform(0, 1, (1, hw, hw, 3)).astype(np.float32)
                  for _ in range(24)]
        runner.warmup(frames[0].shape)
        for _ in runner.stream(frames, collect_stats=True):
            pass
        stats = runner.latency_percentiles()

        # device-only: serialized chain (output feeds input), slope method
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
        print(f"{hw}x{hw} -> x4: p50 {stats['p50_s'] * 1e3:.0f} ms, "
              f"p90 {stats['p90_s'] * 1e3:.0f} ms, "
              f"device-chain {dev * 1e3:.1f} ms/frame")


if __name__ == "__main__":
    main()
