"""Config system: the shipped YAML files parse, surface parity, overrides."""

import glob
import os

import pytest

from m2trans_tpu.config import Config, load_config, save_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("path", sorted(glob.glob(os.path.join(
    REPO, "configs", "*.yml"))))
def test_shipped_configs_parse(path):
    cfg = load_config(path)
    assert cfg.scale in (2, 3, 4)
    assert cfg.n_feats == 64 and cfg.n_blocks == 8
    assert cfg.pad_multiple == 32  # LCM(8, 16, 32)
    if path.endswith("_test.yml"):
        assert cfg.model_path
    assert cfg.eval_sets == ["CCA-US", "US-CASE", "US1K_23"]


def test_overrides_beat_yaml(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("scale: 2\nlr: 0.5\n")
    cfg = load_config(str(p), overrides={"lr": 0.25, "resume": None})
    assert cfg.scale == 2
    assert cfg.lr == 0.25  # CLI override wins
    assert cfg.resume is None


def test_unknown_keys_kept_with_warning(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("scale: 2\nsome_future_knob: 7\n")
    with pytest.warns(UserWarning, match="unknown keys"):
        cfg = load_config(str(p))
    assert cfg.extras["some_future_knob"] == 7


def test_validation_errors():
    with pytest.raises(ValueError, match="scale"):
        Config(scale=5).__class__(scale=5) and load_config(
            None, overrides={"scale": 5})
    with pytest.raises(ValueError, match="dtype"):
        load_config(None, overrides={"dtype": "float16"})


def test_save_roundtrip(tmp_path):
    cfg = load_config(None, overrides={"scale": 3, "lambda_clip": 0.5})
    out = tmp_path / "snap.yml"
    save_config(cfg, str(out))
    back = load_config(str(out))
    assert back.scale == 3 and back.lambda_clip == 0.5


def test_experiment_setup_and_stat_dict(tmp_path):
    from m2trans_tpu.utils.experiment import get_stat_dict, setup_experiment

    cfg = load_config(None, overrides={
        "log_path": str(tmp_path), "log_name": "myrun", "scale": 3})
    exp, models, log_file, _ = setup_experiment(cfg)
    assert "myrun-" in exp
    assert os.path.isdir(models)
    assert os.path.isdir(os.path.join(exp, "test_results_x3"))
    assert os.path.exists(os.path.join(exp, "config.yml"))

    stat = get_stat_dict(["CCA-US", "Custom-Set"])
    assert set(stat) == {"epochs", "losses", "ema_loss", "CCA-US",
                         "Custom-Set"}
    assert stat["Custom-Set"]["best_psnr"] == {"value": 0.0, "epoch": 0}
