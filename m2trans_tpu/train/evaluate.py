"""Benchmark evaluation runner: jitted forward + on-device metrics.

Reproduces the reference recipes exactly:
  * train-val (train.py:258-339): Y-channel PSNR/SSIM with shave + biases
    ``round(avg + 5e-3, 2)`` / ``round(avg + 5e-5, 4)``;
  * test harness (test.py:77-122): additionally FSIM/GMSD on full RGB
    *before* Y-conversion, with their own +5e-5 biases.

jit caches one executable per distinct LR shape (benchmark images vary);
the persistent compilation cache makes repeat runs cheap. By default
evaluation is exact — images are padded only by the model's own pad-to-32
rule, so metrics are bit-comparable with the reference; ``bucket`` trades
a little border exactness for far fewer compiles.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from m2trans_tpu.config import Config
from m2trans_tpu.metrics import fsim, gmsd, sr_eval_metrics
from m2trans_tpu.models import ComputePolicy, m2trans_apply, policy_from_config


def make_forward_fn(cfg: Config, policy: Optional[ComputePolicy] = None,
                    auto_space: bool = True):
    """Returns a (params, lr_NHWC) -> sr_NHWC forward (jit-cached per LR
    shape). With ``auto_space`` (default), bf16-mode frames too large for
    the single-chip fast path are automatically H-sharded over a 'space'
    mesh when more than one device is visible (north-star config 5's
    large-frame payoff); f32 parity mode always stays single-device."""
    if policy is None:
        policy = policy_from_config(cfg)

    @jax.jit
    def fwd_single(params, lr):
        return m2trans_apply(params, lr, cfg, policy=policy)

    if not auto_space:
        return fwd_single

    def fwd(params, lr):
        from m2trans_tpu.parallel.spatial import (
            auto_space_mesh,
            spatial_sharded_forward,
        )

        mesh = auto_space_mesh(lr.shape[1], lr.shape[2], cfg, policy)
        if mesh is None:
            return fwd_single(params, lr)
        return spatial_sharded_forward(params, lr, cfg, mesh=mesh,
                                       policy=policy)

    return fwd


@partial(jax.jit, static_argnames=("scale", "colors", "rgb_range"))
def _psnr_ssim(sr, hr, *, scale, colors, rgb_range):
    return sr_eval_metrics(sr, hr, scale=scale, colors=colors,
                           rgb_range=rgb_range)


def evaluate_dataset(
    params,
    cfg: Config,
    dataset,
    *,
    forward_fn=None,
    full_metrics: bool = False,
    save_dir: Optional[str] = None,
    writer=None,
    writer_tag: Optional[str] = None,
    writer_step: int = 0,
    bucket: int = 0,
) -> Dict[str, float]:
    """PSNR/SSIM (and optionally FSIM/GMSD) averaged over a benchmark set,
    with the reference's rounding biases applied. When a TensorBoard
    ``writer`` is given, every 20th image emits a [LR-up | SR | HR]
    comparison panel (reference train.py:281-296).

    ``bucket > 0`` reflect-pads every LR frame up to a multiple of
    ``bucket`` before the forward and crops the SR back: one compiled
    executable per bucket instead of per image shape. APPROXIMATE — the
    extra padding context perturbs border pixels slightly (typically
    <0.01 dB); the default (0) evaluates exactly like the reference."""
    fwd = forward_fn or make_forward_fn(cfg)
    sums = {"psnr": 0.0, "ssim": 0.0, "fsim": 0.0, "gmsd": 0.0}
    n = 0
    for lr, hr, name in dataset:
        lr_j = jnp.asarray(lr)
        if bucket > 0:
            from m2trans_tpu.ops.pad import pad_to_multiple

            h0, w0 = lr_j.shape[1], lr_j.shape[2]
            lr_j = pad_to_multiple(lr_j, bucket)
            sr = fwd(params, lr_j)[:, : h0 * cfg.scale, : w0 * cfg.scale]
        else:
            sr = fwd(params, lr_j)
        assert sr.shape == hr.shape, (sr.shape, hr.shape)
        if writer is not None and n % 20 == 0:
            from m2trans_tpu.train.loop import _comparison_panel

            panel = _comparison_panel(
                np.asarray(lr[0]), np.asarray(sr[0], np.float32),
                np.asarray(hr[0]), cfg.rgb_range)
            writer.add_image(f"Valid_{writer_tag}/lr_sr_hr_image", panel,
                             writer_step + n, dataformats="HWC")
        if full_metrics:
            sums["fsim"] += float(fsim(jnp.asarray(hr), sr,
                                       data_range=cfg.rgb_range)[0])
            sums["gmsd"] += float(gmsd(jnp.asarray(hr), sr,
                                       data_range=cfg.rgb_range)[0])
        m = _psnr_ssim(sr, jnp.asarray(hr), scale=cfg.scale,
                       colors=cfg.colors, rgb_range=cfg.rgb_range)
        sums["psnr"] += float(m["psnr"])
        sums["ssim"] += float(m["ssim"])
        n += 1
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            _save_image(np.asarray(sr[0]), os.path.join(save_dir, name))

    out = {
        "psnr": round(sums["psnr"] / n + 5e-3, 2),
        "ssim": round(sums["ssim"] / n + 5e-5, 4),
    }
    if full_metrics:
        out["fsim"] = round(sums["fsim"] / n + 5e-5, 4)
        out["gmsd"] = round(sums["gmsd"] / n + 5e-5, 4)
    return out


def _save_image(img_hwc: np.ndarray, path: str) -> None:
    import imageio.v2 as imageio

    u8 = np.clip(img_hwc * 255.0 + 0.5, 0, 255).astype(np.uint8)
    imageio.imwrite(path, u8)


def evaluate_all(
    params,
    cfg: Config,
    eval_sets: List[Dict],
    *,
    full_metrics: bool = False,
    save_root: Optional[str] = None,
    writer=None,
    writer_step: int = 0,
    bucket: int = 0,
) -> Dict[str, Dict[str, float]]:
    fwd = make_forward_fn(cfg)
    results = {}
    for item in eval_sets:
        save_dir = (os.path.join(save_root, item["name"])
                    if save_root else None)
        results[item["name"]] = evaluate_dataset(
            params, cfg, item["dataset"], forward_fn=fwd,
            full_metrics=full_metrics, save_dir=save_dir,
            writer=writer, writer_tag=item["name"], writer_step=writer_step,
            bucket=bucket)
    return results
