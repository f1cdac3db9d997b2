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


def test_faithful_tail_batch_loader(tmp_path, rng):
    """include_tail pads the ragged tail to batch_size with a validity
    mask (reference drop_last=False, datas/utils.py:22)."""
    import numpy as np

    from m2trans_tpu.data.pipeline import TrainLoader

    class _DS:
        def __len__(self):
            return 10

        def get(self, idx, rng_):
            x = np.full((4, 4, 3), float(idx), np.float32)
            return x, np.repeat(np.repeat(x, 2, 0), 2, 1)

    drop = TrainLoader(_DS(), 4, num_workers=1, seed=1)
    assert len(drop) == 2
    assert all(len(b) == 2 for b in drop)

    keep = TrainLoader(_DS(), 4, num_workers=1, seed=1, include_tail=True)
    assert len(keep) == 3
    batches = list(keep)
    assert all(len(b) == 3 for b in batches)
    # full batches carry an all-ones mask; the tail keeps 10 % 4 = 2
    np.testing.assert_array_equal(batches[0][2], np.ones(4, np.float32))
    np.testing.assert_array_equal(batches[1][2], np.ones(4, np.float32))
    np.testing.assert_array_equal(batches[2][2], [1, 1, 0, 0])
    # every dataset index appears exactly once across the valid slots
    seen = []
    for lr, hr, m in batches:
        seen += [int(lr[i, 0, 0, 0]) for i in range(4) if m[i]]
    assert sorted(seen) == list(range(10))
    # padded slots duplicate real samples (static shape, finite values)
    assert batches[2][0].shape == (4, 4, 4, 3)


def test_masked_train_step_matches_unmasked_on_full_batch(rng):
    """sample_mask of all-ones must reproduce the unmasked loss path."""
    import jax
    import jax.numpy as jnp

    from m2trans_tpu.models import init_m2trans
    from m2trans_tpu.train.loop import make_optimizer, make_train_step

    cfg = Config(scale=2, n_feats=8, n_blocks=1, batch_size=2,
                 epochs=2, lr=1e-4, cutmix=0.0, cutout=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    step = make_train_step(cfg, tx)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    opt = tx.init(params)
    lr_img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)),
                         jnp.float32)
    hr_img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)),
                         jnp.float32)
    key = jax.random.PRNGKey(3)

    import copy

    p1, o1, aux1 = step(copy.deepcopy(params), copy.deepcopy(opt),
                        lr_img, hr_img, key, None, None)
    p2, o2, aux2 = step(copy.deepcopy(params), copy.deepcopy(opt),
                        lr_img, hr_img, key, None, jnp.ones(2))
    assert float(aux1["loss"]) == pytest.approx(float(aux2["loss"]),
                                                rel=1e-6)
