"""Measured eager-PyTorch anchor for the GPU-baseline band (VERDICT r3
item 6): run the from-spec reference network (tests/torch_ref.TorchM2Trans
— architecture-identical to /root/reference/models/M2Trans_network.py) in
eager fp32 on this host's CPU at the canonical bench recipe (96x96 LR ->
384x384 SR) and report frames/s and output MP/s.

No CUDA GPU exists in this image, so the anchor bounds the baseline from
a second direction: published eager-PyTorch speedups of RTX-3090-class
GPUs over server-CPU inference for small-channel conv/attention nets
cluster at 10-40x. anchor_mps * [10, 40] then brackets the plausible GPU
baseline, cross-checked against the roofline bound in bench.py's
docstring (1-5% MFU of 71 TFLOP/s fp16 => 18-88 MP/s).

Usage: python scripts/baseline_cpu_anchor.py [batch] [iters]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402
import torch  # noqa: E402

from tests.torch_ref import TorchM2Trans  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    torch.manual_seed(0)
    net = TorchM2Trans(scale=4, n_feats=64, n_blocks=8).eval()
    x = torch.rand(batch, 3, 96, 96)

    with torch.no_grad():
        net(x[:1])  # warm up allocator / thread pool
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            net(x)
            times.append(time.perf_counter() - t0)
    best = min(times)
    out_mp = batch * 384 * 384 / 1e6
    mps = out_mp / best
    print(f"threads={torch.get_num_threads()} batch={batch} "
          f"best={best:.3f}s  frames/s={batch / best:.2f}  "
          f"MP/s={mps:.2f}")
    print(f"gpu-band from anchor (x10..x40): "
          f"{mps * 10:.1f} .. {mps * 40:.1f} MP/s")
    return mps


if __name__ == "__main__":
    main()
