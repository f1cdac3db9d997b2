"""Checkpoint conversion CLI: reference PyTorch .pt <-> orbax.

Usage:
  # torch -> orbax (for serving from this framework)
  python convert_checkpoint.py --config configs/M2Trans_x4_test.yml \
      --input checkpoints/model_x4.pt --output ckpt_x4_orbax

  # orbax (or a training run's models/<epoch>) -> torch .pt (to go back
  # to the PyTorch reference)
  python convert_checkpoint.py --config configs/M2Trans_x4.yml \
      --input experiments/<run>/models/200 --output model_x4_200.pt
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description="M2Trans checkpoint converter")
    ap.add_argument("--config", required=True)
    ap.add_argument("--input", required=True,
                    help=".pt file or orbax checkpoint directory")
    ap.add_argument("--output", required=True,
                    help="orbax directory (torch->jax) or .pt file "
                         "(jax->torch)")
    args = ap.parse_args()

    import numpy as np

    from m2trans_tpu.config import load_config
    from m2trans_tpu.train.checkpoint import load_params_any, save_params
    from m2trans_tpu.train.convert import params_to_torch_state_dict

    cfg = load_config(args.config)
    params = load_params_any(args.input, cfg)

    if args.output.endswith(".pt"):
        import torch

        sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
              params_to_torch_state_dict(params, cfg).items()}
        torch.save({"model_state_dict": sd}, args.output)
        print(f"wrote torch checkpoint: {args.output} ({len(sd)} tensors)")
    else:
        save_params(args.output, params)
        print(f"wrote orbax checkpoint: {args.output}")


if __name__ == "__main__":
    main()
