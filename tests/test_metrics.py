"""Metrics: PSNR/YCbCr vs closed-form, SSIM vs a from-definition numpy
oracle, FSIM/GMSD invariants."""

import jax.numpy as jnp
import numpy as np

from m2trans_tpu.metrics import (
    calc_psnr,
    calc_ssim,
    fsim,
    gmsd,
    rgb_to_ycbcr,
    sr_eval_metrics,
    ssim,
)


def test_psnr_known_value():
    sr = jnp.full((1, 8, 8, 1), 100.0)
    hr = jnp.full((1, 8, 8, 1), 110.0)
    # mse = (10/255)^2 -> psnr = -10 log10 = 20 log10(25.5)
    want = 20 * np.log10(25.5)
    np.testing.assert_allclose(float(calc_psnr(sr, hr)), want, rtol=1e-5)


def test_psnr_identical_is_inf():
    x = jnp.ones((1, 4, 4, 1)) * 42
    assert float(calc_psnr(x, x)) == np.inf


def test_ycbcr_matches_reference_formula(rng):
    x = rng.uniform(0, 1, (2, 5, 5, 3)).astype(np.float32)
    got = np.asarray(rgb_to_ycbcr(jnp.asarray(x)))
    xi = x / 255.0
    want_y = 65.481 * xi[..., 0] + 128.553 * xi[..., 1] + 24.966 * xi[..., 2] + 16
    np.testing.assert_allclose(got[..., 0], want_y, atol=1e-5)
    # gray input: cb = cr = 128
    g = np.ones((1, 3, 3, 3), np.float32) * 0.5
    got = np.asarray(rgb_to_ycbcr(jnp.asarray(g)))
    np.testing.assert_allclose(got[..., 1:], 128.0, atol=1e-3)


def np_ssim(x, y, data_range=255.0, win_size=11, sigma=1.5):
    """From-definition SSIM oracle: gaussian-weighted local stats, VALID."""
    coords = np.arange(win_size) - (win_size - 1) / 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    win = np.outer(g, g)
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2

    def filt(im):
        b, h, w, c = im.shape
        ho, wo = h - win_size + 1, w - win_size + 1
        out = np.zeros((b, ho, wo, c))
        for i in range(win_size):
            for j in range(win_size):
                out += win[i, j] * im[:, i:i + ho, j:j + wo, :]
        return out

    mx, my = filt(x), filt(y)
    sxx = filt(x * x) - mx * mx
    syy = filt(y * y) - my * my
    sxy = filt(x * y) - mx * my
    lum = (2 * mx * my + c1) / (mx ** 2 + my ** 2 + c1)
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    return (lum * cs).mean()


def test_ssim_matches_numpy_oracle(rng):
    x = rng.uniform(0, 255, (1, 24, 24, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 10, x.shape), 0, 255).astype(np.float32)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    want = np_ssim(x.astype(np.float64), y.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ssim_identity_is_one(rng):
    x = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    assert abs(float(calc_ssim(jnp.asarray(x), jnp.asarray(x))) - 1.0) < 1e-6


def test_ssim_degrades_with_noise(rng):
    x = rng.uniform(0, 255, (1, 32, 32, 1)).astype(np.float32)
    y1 = np.clip(x + rng.normal(0, 5, x.shape), 0, 255).astype(np.float32)
    y2 = np.clip(x + rng.normal(0, 40, x.shape), 0, 255).astype(np.float32)
    s1 = float(ssim(jnp.asarray(x), jnp.asarray(y1)))
    s2 = float(ssim(jnp.asarray(x), jnp.asarray(y2)))
    assert s1 > s2


def test_gmsd_invariants(rng):
    x = rng.uniform(0, 1, (2, 48, 48, 3)).astype(np.float32)
    same = np.asarray(gmsd(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(same, 0.0, atol=1e-5)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    noisy = np.asarray(gmsd(jnp.asarray(x), jnp.asarray(y)))
    assert (noisy > same + 1e-4).all()
    assert noisy.shape == (2,)


def test_fsim_invariants(rng):
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    same = np.asarray(fsim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(same, 1.0, atol=1e-4)
    y1 = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    y2 = np.clip(x + rng.normal(0, 0.3, x.shape), 0, 1).astype(np.float32)
    f1 = float(fsim(jnp.asarray(x), jnp.asarray(y1))[0])
    f2 = float(fsim(jnp.asarray(x), jnp.asarray(y2))[0])
    assert 0.0 < f2 < f1 < 1.0


def test_eval_recipe_shapes_and_range(rng):
    sr = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    hr = np.clip(sr + rng.normal(0, 0.02, sr.shape), 0, 1).astype(np.float32)
    m = sr_eval_metrics(jnp.asarray(sr), jnp.asarray(hr), scale=4)
    assert 20 < float(m["psnr"]) < 60
    assert 0 < float(m["ssim"]) <= 1


def test_fsim_gray_input(rng):
    # 1-channel input takes the repeat->3ch path
    x = rng.uniform(0, 1, (1, 48, 48, 1)).astype(np.float32)
    s = np.asarray(fsim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_gmsd_odd_sizes(rng):
    x = rng.uniform(0, 1, (1, 33, 47, 3)).astype(np.float32)
    same = np.asarray(gmsd(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(same, 0.0, atol=1e-5)


def test_fsim_downsample_path(rng):
    # min(H, W) >= 384 triggers the F=round(min/256)>1 mean-pool downsample
    x = rng.uniform(0, 1, (1, 384, 384, 3)).astype(np.float32)
    s = float(fsim(jnp.asarray(x), jnp.asarray(x))[0])
    assert abs(s - 1.0) < 1e-3


def test_eval_metrics_bf16_inputs_promoted():
    """sr_eval_metrics must promote bf16 SR tensors before any metric
    arithmetic: feeding the speed mode's bf16 output through the
    ycbcr/x255 chain unpromoted lost ~17 dB PSNR (38.7 -> 21.6 observed)
    and destabilized SSIM's windowed variances."""
    from m2trans_tpu.metrics.eval_recipe import sr_eval_metrics

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, 48, 48, 3)).astype(np.float32)
    # smooth so quantization, not content, dominates any delta
    k = np.ones((5, 5)) / 25.0
    hr = np.stack([np.convolve(base[0, :, :, c].ravel(), k.ravel(),
                               "same").reshape(48, 48)
                   for c in range(3)], -1)[None].astype(np.float32)
    sr = np.clip(hr + rng.normal(0, 0.02, hr.shape), 0, 1) \
        .astype(np.float32)

    m32 = sr_eval_metrics(jnp.asarray(sr), jnp.asarray(hr), scale=2,
                          colors=3, rgb_range=1.0)
    m16 = sr_eval_metrics(jnp.asarray(sr).astype(jnp.bfloat16),
                          jnp.asarray(hr), scale=2, colors=3,
                          rgb_range=1.0)
    assert abs(float(m32["psnr"]) - float(m16["psnr"])) < 0.1
    assert abs(float(m32["ssim"]) - float(m16["ssim"])) < 0.005
    assert -1.0 <= float(m16["ssim"]) <= 1.0
