"""Training loop: loss decreases on synthetic data, checkpoints save/resume,
data pipeline contract."""

import os

import imageio.v2 as imageio
import numpy as np
import pytest

from m2trans_tpu.config import Config
from m2trans_tpu.data import create_datasets
from m2trans_tpu.data.pipeline import TrainLoader
from m2trans_tpu.data.us1k import US1KDataset


@pytest.fixture
def synthetic_us1k(tmp_path, rng):
    """Tiny US1K tree: 3 HR images (indices 0001..0003) + x2 LR + benchmark."""
    scale = 2
    hr_dir = tmp_path / "US1K/US1K_train_HR"
    lr_dir = tmp_path / "US1K/US1K_train_LR_bicubic/X2"
    hr_dir.mkdir(parents=True)
    lr_dir.mkdir(parents=True)
    for i in range(1, 4):
        hr = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
        imageio.imwrite(hr_dir / f"{i:04d}.png", hr)
        imageio.imwrite(lr_dir / f"{i:04d}x{scale}.png", hr[::2, ::2])
    bhr = tmp_path / "benchmark/UI5/HR"
    blr = tmp_path / "benchmark/UI5/LR_bicubic/X2"
    bhr.mkdir(parents=True)
    blr.mkdir(parents=True)
    hr = rng.uniform(0, 255, (40, 40, 3)).astype(np.uint8)
    imageio.imwrite(bhr / "b0.jpg", hr)
    imageio.imwrite(blr / "b0x2.jpg", hr[::2, ::2])
    return tmp_path


def make_cfg(root, tmp_path, **kw):
    base = dict(
        scale=2, n_feats=8, n_blocks=1, colors=3,
        patch_size=32, batch_size=2, data_repeat=2,
        epochs=2, lr=1e-3, eta_min=1e-5, log_every=1, test_every=1,
        data_path=str(root), eval_sets=["CCA-US"],
        log_path=str(tmp_path / "experiments"), threads=2,
        cutmix=True, cutout=True, save_image=False,
    )
    base.update(kw)
    return Config(**base)


def test_us1k_dataset_and_loader(synthetic_us1k, tmp_path):
    ds = US1KDataset(
        str(synthetic_us1k / "US1K/US1K_train_HR"),
        str(synthetic_us1k / "US1K/US1K_train_LR_bicubic"),
        str(tmp_path / "cache"),
        train=True, scale=2, colors=3, patch_size=32, repeat=2,
        start_idx=1, end_idx=4,
    )
    assert len(ds) == 6
    rng = np.random.default_rng(0)
    lr, hr = ds.get(0, rng)
    assert lr.shape == (16, 16, 3) and hr.shape == (32, 32, 3)
    assert 0.0 <= lr.min() and lr.max() <= 1.0

    loader = TrainLoader(ds, batch_size=2, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    blr, bhr = batches[0]
    assert blr.shape == (2, 16, 16, 3) and bhr.shape == (2, 32, 32, 3)
    # cache reused on second construction (npy files already present)
    n_npy = len(os.listdir(tmp_path / "cache/us1k_hr/rgb"))
    assert n_npy == 3


def test_trainer_learns_and_checkpoints(synthetic_us1k, tmp_path, monkeypatch):
    # patch the US1K index range onto our 3-image synthetic set
    import m2trans_tpu.data.pipeline as pipeline

    orig = US1KDataset.__init__

    def patched(self, *a, **kw):
        kw["start_idx"], kw["end_idx"] = 1, 4
        orig(self, *a, **kw)

    monkeypatch.setattr(US1KDataset, "__init__", patched)

    from m2trans_tpu.train.loop import Trainer

    cfg = make_cfg(synthetic_us1k, tmp_path, epochs=2)
    trainer = Trainer(cfg)
    first_loss = None
    stat = trainer.run()
    assert stat["epochs"] == 2
    assert len(stat["CCA-US"]["psnrs"]) == 2
    assert stat["CCA-US"]["best_psnr"]["value"] > 0
    # experiment artifacts
    exp = trainer.experiment_path
    assert os.path.exists(os.path.join(exp, "config.yml"))
    assert os.path.exists(os.path.join(exp, "stat_dict.yml"))
    assert os.path.exists(os.path.join(exp, "log.txt"))

    # resume continues from epoch 3
    cfg2 = make_cfg(synthetic_us1k, tmp_path, epochs=3, resume=exp)
    trainer2 = Trainer(cfg2)
    assert trainer2.start_epoch == 3
    stat2 = trainer2.run()
    assert stat2["epochs"] == 3
    assert len(stat2["CCA-US"]["psnrs"]) == 3


def test_create_datasets_surface(synthetic_us1k, monkeypatch):
    orig = US1KDataset.__init__

    def patched(self, *a, **kw):
        kw["start_idx"], kw["end_idx"] = 1, 4
        orig(self, *a, **kw)

    monkeypatch.setattr(US1KDataset, "__init__", patched)
    cfg = Config(scale=2, patch_size=32, batch_size=2, data_repeat=2,
                 data_path=str(synthetic_us1k), eval_sets=["CCA-US"],
                 threads=1)
    loader, eval_sets = create_datasets(cfg)
    assert len(loader) == 3
    assert eval_sets[0]["name"] == "CCA-US"
    with pytest.raises(NotImplementedError):
        create_datasets(cfg.replace(training_dataset="div2k"))
