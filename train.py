"""Training CLI — reference-surface equivalent of the reference's train.py.

Usage: python train.py --config configs/M2Trans_x4.yml [--resume <exp_dir>]
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser(description="M2Trans-TPU training")
    parser.add_argument("--config", type=str,
                        default="./configs/M2Trans_x4.yml")
    parser.add_argument("--resume", type=str, default=None)
    args = parser.parse_args()

    from m2trans_tpu.config import load_config

    cfg = load_config(args.config, overrides={"resume": args.resume})

    import os

    import jax

    # multi-host data parallelism (exceeds the single-node reference by
    # design, SURVEY.md §2.5): when launched under a JAX-aware cluster
    # scheduler, initialize the distributed runtime before touching devices
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        print(f"## multi-host: process {jax.process_index()} of "
              f"{jax.process_count()} ##")

    print(f"## devices: {jax.devices()} ##")

    from m2trans_tpu.train.loop import Trainer

    if cfg.dtype == "float32":
        print("## dtype float32 runs bit-parity (HIGHEST-precision) "
              "numerics — ~2.3x slower training than dtype: bfloat16 ##")

    semantic_loss_fn = None
    if cfg.lambda_clip > 0 and cfg.medclip_path:
        from m2trans_tpu.losses.semantic import make_semantic_loss

        semantic_loss_fn = make_semantic_loss(cfg)
    elif cfg.lambda_clip > 0:
        print("## lambda_clip > 0 but no medclip_path set: training with "
              "L1 only (set medclip_path to pretrained MedCLIP weights) ##")

    writer = None
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        SummaryWriter = None
    trainer = Trainer(cfg, semantic_loss_fn=semantic_loss_fn)
    if SummaryWriter is not None:
        trainer.writer = SummaryWriter(logdir=trainer.experiment_path)

    # FLOPs/params report (reference train.py:148-152, via XLA cost analysis)
    from m2trans_tpu.utils.flops import model_complexity_report

    print(model_complexity_report(trainer.params, cfg))

    trainer.run()


if __name__ == "__main__":
    main()
