"""End-to-end eval slice: synthetic benchmark dirs + a reference-format .pt
checkpoint -> create_datasets -> converted params -> jitted forward ->
PSNR/SSIM/FSIM/GMSD report (SURVEY.md §7 build-plan stage 4)."""

import os

import imageio.v2 as imageio
import jax
import numpy as np
import pytest
import torch

from m2trans_tpu.config import Config
from m2trans_tpu.data import create_datasets
from m2trans_tpu.models import init_m2trans
from m2trans_tpu.train.checkpoint import load_params_any
from m2trans_tpu.train.convert import params_to_torch_state_dict
from m2trans_tpu.train.evaluate import evaluate_all


@pytest.fixture
def synthetic_benchmark(tmp_path, rng):
    """benchmark/UI5 with 2 HR/LR pairs (jpg postfix, like CCA-US)."""
    scale = 2
    hr_dir = tmp_path / "benchmark/UI5/HR"
    lr_dir = tmp_path / "benchmark/UI5/LR_bicubic/X2"
    hr_dir.mkdir(parents=True)
    lr_dir.mkdir(parents=True)
    for i, (h, w) in enumerate([(48, 40), (56, 48)]):
        hr = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        lr = hr[::scale, ::scale]
        imageio.imwrite(hr_dir / f"img{i}.jpg", hr)
        imageio.imwrite(lr_dir / f"img{i}x{scale}.jpg", lr)
    return tmp_path


def test_eval_pipeline_from_pt_checkpoint(synthetic_benchmark, tmp_path):
    cfg = Config(
        scale=2, n_feats=8, n_blocks=1,
        data_path=str(synthetic_benchmark),
        eval_sets=["CCA-US"],
    )
    # reference-format checkpoint
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          params_to_torch_state_dict(params, cfg).items()}
    pt = tmp_path / "model_x2.pt"
    torch.save({"model_state_dict": sd}, pt)

    _, eval_sets = create_datasets(cfg, train=False)
    assert len(eval_sets) == 1 and eval_sets[0]["name"] == "CCA-US"
    assert len(eval_sets[0]["dataset"]) == 2

    loaded = load_params_any(str(pt), cfg)
    results = evaluate_all(loaded, cfg, eval_sets, full_metrics=True)
    m = results["CCA-US"]
    assert set(m) == {"psnr", "ssim", "fsim", "gmsd"}
    # random model on random images: metrics exist and are sane
    assert 0 < m["psnr"] < 60
    assert -1 <= m["ssim"] <= 1
    assert 0 <= m["fsim"] <= 1
    assert m["gmsd"] >= 0


def test_eval_save_images(synthetic_benchmark, tmp_path):
    cfg = Config(scale=2, n_feats=8, n_blocks=1,
                 data_path=str(synthetic_benchmark), eval_sets=["CCA-US"])
    params = init_m2trans(jax.random.PRNGKey(1), cfg)
    _, eval_sets = create_datasets(cfg, train=False)
    out_root = tmp_path / "sr_out"
    evaluate_all(params, cfg, eval_sets, save_root=str(out_root))
    files = sorted(os.listdir(out_root / "CCA-US"))
    assert files == ["img0.jpg", "img1.jpg"]
    img = imageio.imread(out_root / "CCA-US/img0.jpg")
    assert img.shape == (48, 40, 3)


def test_bucketed_eval_close_to_exact(synthetic_benchmark, rng):
    cfg = Config(scale=2, n_feats=8, n_blocks=1,
                 data_path=str(synthetic_benchmark), eval_sets=["CCA-US"])
    params = init_m2trans(jax.random.PRNGKey(4), cfg)
    _, eval_sets = create_datasets(cfg, train=False)
    exact = evaluate_all(params, cfg, eval_sets)["CCA-US"]
    bucketed = evaluate_all(params, cfg, eval_sets, bucket=64)["CCA-US"]
    assert abs(exact["psnr"] - bucketed["psnr"]) < 0.3
    assert abs(exact["ssim"] - bucketed["ssim"]) < 0.01


def test_evaluate_dataset_bf16_fast_path(rng):
    """The eval runner over the bf16+Pallas fast path (the serving
    configuration), full metrics included."""
    import jax.numpy as jnp

    from m2trans_tpu.models.m2trans import ComputePolicy
    from m2trans_tpu.train.evaluate import evaluate_dataset, make_forward_fn

    cfg = Config(scale=2, n_feats=8, n_blocks=1, colors=3)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    ds = [(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32),
           rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32),
           f"im{i}.png") for i in range(2)]
    pol = ComputePolicy(dtype=jnp.bfloat16, precision=None, use_pallas=True)
    out = evaluate_dataset(params, cfg, ds,
                           forward_fn=make_forward_fn(cfg, policy=pol),
                           full_metrics=True)
    assert set(out) == {"psnr", "ssim", "fsim", "gmsd"}
    assert 0 < out["psnr"] < 60 and 0 <= out["ssim"] <= 1
