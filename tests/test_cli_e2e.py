"""CLI-level end-to-end: a reference-format ``.pt`` file on disk driven
through the ACTUAL ``test.py`` entry point (VERDICT r2 item 5).

The checkpoint is written by the from-spec torch model (tests/torch_ref)
in the reference's exact on-disk format — ``{epoch, model_state_dict}``
with DataParallel ``module.``-prefixed keys (reference train.py:342-349,
test.py:64-73) — so the moment the released ``model_x{2,3,4}.pt`` blobs
appear, the same command line produces the parity numbers (runbook in
README.md)."""

import sys

import imageio.v2 as imageio
import numpy as np
import pytest
import torch
import yaml

from m2trans_tpu.config import Config
from m2trans_tpu.data import create_datasets
from m2trans_tpu.train.checkpoint import load_params_any
from m2trans_tpu.train.evaluate import evaluate_all


@pytest.fixture
def bench_root(tmp_path, rng):
    scale = 2
    hr_dir = tmp_path / "benchmark/UI5/HR"
    lr_dir = tmp_path / "benchmark/UI5/LR_bicubic/X2"
    hr_dir.mkdir(parents=True)
    lr_dir.mkdir(parents=True)
    for i, (h, w) in enumerate([(48, 40), (64, 48)]):
        hr = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        imageio.imwrite(hr_dir / f"img{i}.jpg", hr)
        imageio.imwrite(lr_dir / f"img{i}x{scale}.jpg", hr[::scale, ::scale])
    return tmp_path


def test_testpy_cli_on_reference_pt(bench_root, tmp_path, monkeypatch,
                                    capsys):
    from tests.torch_ref import TorchM2Trans

    torch.manual_seed(7)
    net = TorchM2Trans(scale=2, n_feats=8, n_blocks=1)
    # the reference saves the nn.DataParallel-wrapped module
    # (train.py:342-349): keys carry the "module." prefix
    sd = {f"module.{k}": v for k, v in net.state_dict().items()}
    pt = tmp_path / "model_x2.pt"
    torch.save({"epoch": 3, "model_state_dict": sd}, pt)

    cfg_file = tmp_path / "tiny_x2_test.yml"
    yaml.safe_dump({
        "scale": 2, "n_feats": 8, "n_blocks": 1,
        "data_path": str(bench_root), "eval_sets": ["CCA-US"],
        "model_path": str(pt), "dtype": "float32",
    }, open(cfg_file, "w"))

    monkeypatch.setattr(sys, "argv",
                        ["test.py", "--config", str(cfg_file)])
    import test as test_cli

    test_cli.main()
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith("[CCA-US-X2]")]
    assert line, f"no metrics line in CLI output:\n{out}"
    psnr_cli = float(line[0].split("PSNR:")[1].split(",")[0])
    ssim_cli = float(line[0].split("SSIM:")[1])
    assert "FSIM:" in out and "GMSD:" in out

    # the same file evaluated in-process must give the same numbers
    cfg = Config(scale=2, n_feats=8, n_blocks=1,
                 data_path=str(bench_root), eval_sets=["CCA-US"])
    params = load_params_any(str(pt), cfg)
    _, eval_sets = create_datasets(cfg, train=False)
    m = evaluate_all(params, cfg, eval_sets)["CCA-US"]
    assert psnr_cli == pytest.approx(m["psnr"], abs=0.011)
    assert ssim_cli == pytest.approx(m["ssim"], abs=0.0011)
