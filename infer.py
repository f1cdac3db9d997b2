"""Batch / streaming inference CLI.

Runs super-resolution over a directory of frames (a cine loop) or single
images, reporting throughput and p50/p90/p99 per-frame latency — the
production-serving surface the reference lacks (its test.py only computes
metrics against ground truth).

Usage:
  python infer.py --config configs/M2Trans_x4_test.yml \
      --input frames_dir/ --output sr_out/ [--mesh-space N] [--f32]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser(description="M2Trans-TPU inference")
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--model_path", type=str, default=None)
    ap.add_argument("--input", type=str, required=True,
                    help="image file or directory of frames")
    ap.add_argument("--output", type=str, default=None)
    ap.add_argument("--mesh-space", type=int, default=0,
                    help="spatial shards over the frame height; 0 = auto "
                         "(shard large frames when >1 device is visible), "
                         "1 = force single-chip")
    ap.add_argument("--f32", action="store_true",
                    help="f32 parity numerics instead of bf16+Pallas")
    ap.add_argument("--u8", action="store_true",
                    help="quantize SR frames to uint8 on device: 4x "
                         "smaller device->host transfer (the latency "
                         "bound for large frames over slow links); "
                         "lossless for 8-bit display/DICOM sinks")
    args = ap.parse_args()

    import imageio.v2 as imageio
    import jax
    import numpy as np

    from m2trans_tpu.config import load_config
    from m2trans_tpu.models.m2trans import policy_from_config
    from m2trans_tpu.parallel.streaming import StreamingSR
    from m2trans_tpu.train.checkpoint import load_params_any

    cfg = load_config(args.config, overrides={"model_path": args.model_path})
    params = load_params_any(cfg.model_path, cfg)

    policy = policy_from_config(cfg) if args.f32 else None

    paths = ([os.path.join(args.input, f)
              for f in sorted(os.listdir(args.input))]
             if os.path.isdir(args.input) else [args.input])
    frames = []
    for p in paths:
        img = imageio.imread(p, mode="RGB")
        frames.append(np.asarray(img, np.float32)[None] / 255.0)
    if not frames:
        raise SystemExit("no input frames found")

    mesh = None
    if args.mesh_space > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[: args.mesh_space]), ("space",))
    elif args.mesh_space == 0:
        from m2trans_tpu.parallel.spatial import auto_space_mesh_multi

        # consider every distinct frame shape so the chosen shard count
        # divides all padded heights (mixed-size cine directories)
        shapes = sorted({(f.shape[1], f.shape[2]) for f in frames})
        mesh = auto_space_mesh_multi(
            shapes, cfg, policy or StreamingSR.default_policy())
        if mesh is not None:
            print(f"## auto spatial sharding: {mesh.shape['space']} shards "
                  f"over H for {len(shapes)} frame shape(s) ##")

    runner = StreamingSR(params, cfg, mesh=mesh, policy=policy,
                         output_u8=args.u8)

    runner.warmup(frames[0].shape)
    if args.output:
        os.makedirs(args.output, exist_ok=True)

    t0 = time.perf_counter()
    n_px = 0
    for path, sr in zip(paths, runner.stream(frames, collect_stats=True)):
        n_px += sr.shape[1] * sr.shape[2]
        if args.output:
            u8 = (sr[0] if args.u8 else
                  np.clip(sr[0] * 255.0 + 0.5, 0, 255).astype(np.uint8))
            imageio.imwrite(
                os.path.join(args.output, os.path.basename(path)), u8)
    wall = time.perf_counter() - t0

    stats = runner.latency_percentiles()
    report = {
        "frames": len(frames),
        "fps": round(len(frames) / wall, 2),
        "output_megapixels_per_sec": round(n_px / 1e6 / wall, 2),
        **{k: round(v * 1e3, 2) for k, v in stats.items()},
    }
    report = {k.replace("_s", "_ms") if k.endswith("_s") else k: v
              for k, v in report.items()}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
