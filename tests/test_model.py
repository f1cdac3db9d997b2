"""M2Trans model: end-to-end numerics vs the numpy oracle, shape properties,
and parameter accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2trans_tpu.config import Config
from m2trans_tpu.models import init_m2trans, m2trans_apply
from m2trans_tpu.models.m2trans import param_count, trainable_mask

from oracles import np_m2trans


def tiny_cfg(scale=2, n_blocks=1, n_feats=8):
    return Config(scale=scale, n_feats=n_feats, n_blocks=n_blocks, colors=3)


def params_to_np(params):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_forward_matches_numpy_oracle(scale, rng):
    cfg = tiny_cfg(scale=scale)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = rng.uniform(0, 1, (1, 8, 12, 3)).astype(np.float32)
    got = np.asarray(m2trans_apply(params, jnp.asarray(x), cfg))
    want = np_m2trans(params_to_np(params), x.astype(np.float64), scale,
                      rgb_range=cfg.rgb_range, pad_multiple=cfg.pad_multiple)
    assert got.shape == want.shape == (1, 8 * scale, 12 * scale, 3)
    np.testing.assert_allclose(got, want, atol=5e-5)


@pytest.mark.parametrize("hw", [(8, 8), (13, 17), (32, 32), (33, 47)])
def test_output_shape_property(hw, rng):
    # any (h, w) -> exactly (h*s, w*s) (reference pad-to-32 + crop, :76-86)
    cfg = tiny_cfg(scale=2)
    params = init_m2trans(jax.random.PRNGKey(1), cfg)
    h, w = hw
    x = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
    y = m2trans_apply(params, x, cfg)
    assert y.shape == (1, h * 2, w * 2, 3)


def test_output_clamped(rng):
    cfg = tiny_cfg()
    params = init_m2trans(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)) * 10
    y = np.asarray(m2trans_apply(params, x, cfg))
    assert y.min() >= 0.0 and y.max() <= cfg.rgb_range


def test_param_count_matches_published():
    # paper/table: 3.63M params at x4 with n_feats=64, n_blocks=8
    # (BASELINE.md / img/performance1.png)
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    n = param_count(params, trainable_only=True)
    assert 3.55e6 < n < 3.70e6, f"got {n}"


def test_mean_shift_frozen():
    cfg = tiny_cfg()
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params)
    assert mask["sub_mean"]["w"] is False
    assert mask["add_mean"]["b"] is False
    assert mask["head"]["w"] is True


def test_bfloat16_mode_close_to_f32(rng):
    from m2trans_tpu.models.m2trans import ComputePolicy

    cfg = tiny_cfg()
    params = init_m2trans(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    y32 = np.asarray(m2trans_apply(params, x, cfg))
    ybf = np.asarray(m2trans_apply(
        params, x, cfg,
        policy=ComputePolicy(dtype=jnp.bfloat16, precision=None)))
    assert np.abs(y32 - ybf).mean() < 2e-2


def test_forward_is_jittable():
    cfg = tiny_cfg()
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    fn = jax.jit(lambda p, x: m2trans_apply(p, x, cfg))
    y = fn(params, jnp.zeros((1, 8, 8, 3)))
    assert y.shape == (1, 16, 16, 3)


def test_colors_1_y_channel_path(rng):
    # Y-channel training/eval config (reference colors: 1 support,
    # datas/us1k.py:115-116, model head cin=1)
    cfg = Config(scale=2, n_feats=8, n_blocks=1, colors=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    assert params["head"]["w"].shape == (3, 3, 1, 8)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 1)).astype(np.float32))
    y = m2trans_apply(params, x, cfg)
    assert y.shape == (1, 32, 32, 3)  # tail always emits 3 channels
    from m2trans_tpu.metrics import sr_eval_metrics

    m = sr_eval_metrics(y[..., :1], y[..., :1], scale=2, colors=1)
    assert float(m["ssim"]) == 1.0


def test_colors_1_semantic_loss(rng):
    from m2trans_tpu.losses.semantic import semantic_loss
    from m2trans_tpu.models.medclip.model import MedCLIPConfig, init_medclip

    mcfg = MedCLIPConfig.tiny()
    mp = init_medclip(jax.random.PRNGKey(0), mcfg)
    sr = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
    hr = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    loss = semantic_loss(mp, mcfg, sr, hr, ids, mask, jax.random.PRNGKey(1),
                         n_patches=2, clip_size=56)
    assert float(loss) > 0


def test_microbatched_apply_matches_plain(rng):
    """lax.map micro-batching (the batch-scaling fix, NOTES_ROUND2) must
    reproduce the plain forward: instance norm is per-sample, so chunking
    the batch cannot change any value."""
    from m2trans_tpu.models import m2trans_apply_microbatched

    cfg = Config(scale=2, n_feats=8, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32))
    want = np.asarray(m2trans_apply(params, x, cfg))
    got = np.asarray(jax.jit(
        lambda p, z: m2trans_apply_microbatched(p, z, cfg, micro_batch=2)
    )(params, x))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # non-divisible and small batches fall through to the plain forward
    got3 = np.asarray(m2trans_apply_microbatched(params, x[:3], cfg,
                                                 micro_batch=2))
    np.testing.assert_allclose(got3, want[:3], atol=1e-6)


def test_microbatched_lax_map_branch(rng):
    """Many chunks through the lax.map microbatcher — same values as the
    plain forward."""
    from m2trans_tpu.models import m2trans_apply_microbatched

    cfg = Config(scale=2, n_feats=8, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (6, 8, 8, 3)).astype(np.float32))
    want = np.asarray(m2trans_apply(params, x, cfg))
    got = np.asarray(jax.jit(
        lambda p, z: m2trans_apply_microbatched(p, z, cfg, micro_batch=2)
    )(params, x))
    np.testing.assert_allclose(got, want, atol=1e-6)
