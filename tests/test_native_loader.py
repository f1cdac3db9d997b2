"""C++ native data loader: build, sample semantics, determinism,
throughput sanity vs the Python loader."""

import numpy as np
import pytest

pytest.importorskip("ctypes")


@pytest.fixture(scope="module")
def npy_cache(tmp_path_factory):
    root = tmp_path_factory.mktemp("cache")
    rng = np.random.default_rng(5)
    hr_paths, lr_paths, arrays = [], [], []
    for i in range(4):
        hr = rng.integers(0, 256, (64, 48, 3), np.uint8)
        lr = hr[::2, ::2]
        hp = root / f"hr_{i}.npy"
        lp = root / f"lr_{i}.npy"
        np.save(hp, hr)
        np.save(lp, np.ascontiguousarray(lr))
        hr_paths.append(str(hp))
        lr_paths.append(str(lp))
        arrays.append((lr, hr))
    return hr_paths, lr_paths, arrays


def make_loader(npy_cache, **kw):
    from m2trans_tpu.runtime import NativeTrainLoader

    hr, lr, _ = npy_cache
    args = dict(patch_size=32, scale=2, batch_size=2, repeat=3,
                num_workers=3, seed=7)
    args.update(kw)
    return NativeTrainLoader(hr, lr, **args)


def test_builds_and_iterates(npy_cache):
    loader = make_loader(npy_cache)
    batches = list(loader)
    assert len(batches) == len(loader) == 4 * 3 // 2
    lr, hr = batches[0]
    assert lr.shape == (2, 16, 16, 3) and lr.dtype == np.float32
    assert hr.shape == (2, 32, 32, 3)
    assert 0.0 <= lr.min() and lr.max() <= 1.0


def test_patches_are_aligned_crops(npy_cache):
    """Every LR patch must be a subsampling of its HR patch: with
    lr = hr[::2, ::2] in the fixture, an aligned crop gives
    lr_patch == hr_patch[::2, ::2]; a flip applied to both (reference
    crop_patch order: crop, then flip) shifts the subsample parity to 1::2
    on the flipped axis, and rot90 transposes. Accept exactly those
    variants."""
    loader = make_loader(npy_cache)
    for lr, hr in loader:
        for i in range(lr.shape[0]):
            variants = []
            for hy in (slice(0, None, 2), slice(1, None, 2)):
                for hx in (slice(0, None, 2), slice(1, None, 2)):
                    sub = hr[i][hy, hx, :]
                    variants += [sub, sub.transpose(1, 0, 2)]
            assert any(np.allclose(lr[i], v, atol=1e-6) for v in variants)


def test_deterministic_across_runs(npy_cache):
    a = [b for b in make_loader(npy_cache)]
    b = [b for b in make_loader(npy_cache)]
    for (l1, h1), (l2, h2) in zip(a, b):
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(h1, h2)


def test_epochs_differ(npy_cache):
    loader = make_loader(npy_cache)
    e1 = np.stack([h for _, h in loader])
    e2 = np.stack([h for _, h in loader])
    assert not np.allclose(e1, e2)


def test_patch_values_come_from_source_images(npy_cache):
    _, _, arrays = npy_cache
    loader = make_loader(npy_cache, batch_size=1, repeat=2)
    # each HR patch must appear somewhere in one of the source HR images
    # (up to flips/rot); check via multiset of pixel values per patch
    for _, hr in loader:
        patch = np.round(hr[0] * 255).astype(np.uint8)
        vals = np.sort(patch.reshape(-1))
        found = False
        for _, src in arrays:
            # cheap necessary condition: all patch values exist in source
            if np.isin(patch, src).all():
                found = True
                break
        assert found


def test_no_deadlock_with_tiny_window_many_epochs(npy_cache):
    """Regression: size-based backpressure could fill the ready map with
    batches ahead of the in-order consumer and deadlock the producer
    holding the needed batch. Many epochs x many workers x small batches
    makes the race likely; the loader must finish every epoch."""
    loader = make_loader(npy_cache, batch_size=1, repeat=24, num_workers=6)
    for _ in range(6):
        n = sum(1 for _ in loader)
        assert n == len(loader) == 96


def test_rejects_invalid_caches(npy_cache, tmp_path):
    """loader_create must return nullptr (-> RuntimeError + Python
    fallback) for caches the sampler cannot index safely (ADVICE r1):
    images smaller than the patch, and HR/LR channel mismatches that
    would corrupt the numpy output buffers."""
    from m2trans_tpu.runtime import NativeTrainLoader

    hr, lr, _ = npy_cache
    rng = np.random.default_rng(9)

    # (a) LR image smaller than the LR patch
    tiny = rng.integers(0, 256, (8, 8, 3), np.uint8)
    tp = tmp_path / "tiny_lr.npy"
    np.save(tp, tiny)
    with pytest.raises(RuntimeError):
        NativeTrainLoader(hr[:1], [str(tp)], patch_size=32, scale=2,
                          batch_size=1)

    # (b) HR too small to cover the scaled crop window of its LR
    small_hr = rng.integers(0, 256, (40, 40, 3), np.uint8)
    sp = tmp_path / "small_hr.npy"
    np.save(sp, small_hr)
    with pytest.raises(RuntimeError):
        NativeTrainLoader([str(sp)], lr[:1], patch_size=32, scale=2,
                          batch_size=1)

    # (c) channel mismatch between HR (3ch) and LR (1ch)
    gray = rng.integers(0, 256, (32, 24), np.uint8)
    gp = tmp_path / "gray_lr.npy"
    np.save(gp, gray)
    with pytest.raises(RuntimeError):
        NativeTrainLoader(hr[:1], [str(gp)], patch_size=32, scale=2,
                          batch_size=1)

    # (d) patch not divisible by scale
    with pytest.raises(RuntimeError):
        NativeTrainLoader(hr[:1], lr[:1], patch_size=33, scale=2,
                          batch_size=1)
