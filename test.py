"""Evaluation/inference CLI — reference-surface equivalent of the
reference's test.py (PSNR/SSIM/FSIM/GMSD over the configured benchmark
dirs from a checkpoint).

Usage: python test.py --config configs/M2Trans_x4_test.yml
Accepts both reference ``.pt`` checkpoints (converted on the fly) and this
framework's orbax checkpoints.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description="M2Trans-TPU eval")
    parser.add_argument("--config", type=str,
                        default="./configs/M2Trans_x2_test.yml")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--full_metrics", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="also compute FSIM/GMSD (reference "
                             "test.py:95-99); --no-full_metrics skips them")
    parser.add_argument("--save_image", action="store_true")
    parser.add_argument("--bucket", type=int, default=0,
                        help="pad LR frames to multiples of N: one compile "
                             "per bucket instead of per shape (approximate; "
                             "0 = exact)")
    parser.add_argument("--dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="float32 = bit-parity eval (default); "
                             "bfloat16 = fast serving numerics")
    args = parser.parse_args()

    from m2trans_tpu.config import load_config

    cfg = load_config(args.config, overrides={"model_path": args.model_path,
                                              "dtype": args.dtype})

    from m2trans_tpu.data import create_datasets
    from m2trans_tpu.train.checkpoint import load_params_any
    from m2trans_tpu.train.evaluate import evaluate_all

    _, eval_sets = create_datasets(cfg, train=False)
    params = load_params_any(cfg.model_path, cfg)

    results = evaluate_all(params, cfg, eval_sets,
                           full_metrics=args.full_metrics,
                           save_root=("test_results" if args.save_image
                                      else None),
                           bucket=args.bucket)
    for name, m in results.items():
        print(f"[{name}-X{cfg.scale}] "
              f"PSNR:{m['psnr']:.2f},SSIM:{m['ssim']:.4f}" +
              (f"\nFSIM:{m['fsim']:.4f},GMSD:{m['gmsd']:.4f}"
               if "fsim" in m else ""))


if __name__ == "__main__":
    main()
