"""Streaming SR runner: ordering, shapes, stats, spatially-sharded mode."""

import jax
import numpy as np
from jax.sharding import Mesh

from m2trans_tpu.config import Config
from m2trans_tpu.models import init_m2trans, m2trans_apply, policy_from_config
from m2trans_tpu.parallel.streaming import StreamingSR


def test_stream_matches_sync_and_keeps_order(rng):
    cfg = Config(scale=2, n_feats=8, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    pol = policy_from_config(cfg)
    runner = StreamingSR(params, cfg, policy=pol, depth=3)
    frames = [rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
              for _ in range(5)]
    runner.warmup(frames[0].shape)
    outs = list(runner.stream(frames, collect_stats=True))
    assert len(outs) == 5
    for f, o in zip(frames, outs):
        want = np.asarray(m2trans_apply(params, f, cfg, policy=pol))
        np.testing.assert_allclose(o, want, atol=1e-5)
    stats = runner.latency_percentiles()
    assert set(stats) == {"p50_s", "p90_s", "p99_s"}
    assert stats["p50_s"] > 0


def test_stream_spatially_sharded(rng):
    cfg = Config(scale=2, n_feats=8, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(1), cfg)
    pol = policy_from_config(cfg)
    mesh = Mesh(np.array(jax.devices()[:4]), ("space",))
    runner = StreamingSR(params, cfg, mesh=mesh, policy=pol)
    frame = rng.uniform(0, 1, (1, 128, 32, 3)).astype(np.float32)
    out = runner(frame)
    want = np.asarray(m2trans_apply(params, frame, cfg, policy=pol))
    np.testing.assert_allclose(out, want, atol=2e-4)


def test_stream_u8_output(rng):
    """output_u8 quantizes on device: uint8 frames == round(f32*255)."""
    cfg = Config(scale=2, n_feats=8, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(2), cfg)
    pol = policy_from_config(cfg)
    runner = StreamingSR(params, cfg, policy=pol, output_u8=True)
    frame = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    out = runner(frame)
    assert out.dtype == np.uint8
    want = np.asarray(m2trans_apply(params, frame, cfg, policy=pol))
    want_u8 = np.round(np.clip(want, 0, 1) * 255.0).astype(np.uint8)
    # allow +-1 code on exact-half rounding (device rounds to even)
    assert np.abs(out.astype(int) - want_u8.astype(int)).max() <= 1
