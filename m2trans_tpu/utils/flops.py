"""Model complexity report via XLA cost analysis — the TPU-native equivalent
of the reference's ptflops startup report (train.py:148-152), measured on the
same input recipe: one (384/scale, 384/scale) LR frame."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from m2trans_tpu.config import Config
from m2trans_tpu.models import m2trans_apply, policy_from_config
from m2trans_tpu.models.m2trans import param_count


def model_flops(params, cfg: Config, h: int = None, w: int = None) -> float:
    """Analytical XLA FLOPs of one forward at the given LR size."""
    h = h or 384 // cfg.scale
    w = w or 384 // cfg.scale
    policy = policy_from_config(cfg)

    def fwd(p, x):
        return m2trans_apply(p, x, cfg, policy=policy)

    x = jnp.zeros((1, h, w, cfg.colors), jnp.float32)
    compiled = jax.jit(fwd).lower(params, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older API returns one dict per computation
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def model_complexity_report(params, cfg: Config) -> str:
    flops = model_flops(params, cfg)
    n = param_count(params, trainable_only=True)
    return (f"## Flops: {flops / 1e9:.2f} GMac-equiv (XLA, "
            f"{384 // cfg.scale}x{384 // cfg.scale} input), "
            f"Params: {n / 1e6:.2f} M")
