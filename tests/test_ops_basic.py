"""Conv / pixel-shuffle / instance-norm / GELU / padding parity vs torch-CPU.

torch (CPU build, baked into the image) is used here purely as a numerical
oracle for PyTorch op semantics the reference relies on — conv padding modes,
PixelShuffle channel order, InstanceNorm2d statistics, exact-GELU.
"""

import jax.numpy as jnp
from jax import lax
import numpy as np
import torch
import torch.nn.functional as tF

from m2trans_tpu.ops import (
    conv2d,
    instance_norm,
    pad_to_multiple,
    pixel_shuffle,
)
from m2trans_tpu.ops.conv import gelu_exact


def to_nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def from_nchw(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_conv3x3_reflect_matches_torch(rng):
    x = rng.standard_normal((2, 10, 14, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 8)).astype(np.float32)  # HWIO
    b = rng.standard_normal((8,)).astype(np.float32)
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                            padding="reflect", precision=lax.Precision.HIGHEST))
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
    tx = tF.pad(to_nchw(x), (1, 1, 1, 1), mode="reflect")
    want = from_nchw(tF.conv2d(tx, tw, torch.from_numpy(b)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv3x3_zeros_matches_torch(rng):
    x = rng.standard_normal((1, 9, 9, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 4)).astype(np.float32)
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), padding="zeros", precision=lax.Precision.HIGHEST))
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1))
    want = from_nchw(tF.conv2d(to_nchw(x), tw, padding=1))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv1x1_matches_torch(rng):
    x = rng.standard_normal((2, 6, 6, 16)).astype(np.float32)
    w = rng.standard_normal((1, 1, 16, 48)).astype(np.float32)
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), padding="valid", precision=lax.Precision.HIGHEST))
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1))
    want = from_nchw(tF.conv2d(to_nchw(x), tw))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pixel_shuffle_matches_torch(rng):
    for r in (2, 3, 4):
        x = rng.standard_normal((2, 5, 7, 3 * r * r)).astype(np.float32)
        got = np.asarray(pixel_shuffle(jnp.asarray(x), r))
        want = from_nchw(tF.pixel_shuffle(to_nchw(x), r))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((3, 12, 10, 6)).astype(np.float32) * 4 + 1
    got = np.asarray(instance_norm(jnp.asarray(x)))
    want = from_nchw(tF.instance_norm(to_nchw(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gelu_exact_matches_torch(rng):
    x = rng.standard_normal((128,)).astype(np.float32) * 3
    got = np.asarray(gelu_exact(jnp.asarray(x)))
    want = tF.gelu(torch.from_numpy(x)).numpy()  # torch default = exact erf
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pad_to_multiple_matches_torch_reflect(rng):
    x = rng.standard_normal((1, 37, 45, 3)).astype(np.float32)
    got = np.asarray(pad_to_multiple(jnp.asarray(x), 32))
    assert got.shape == (1, 64, 64, 3)
    ph, pw = 64 - 37, 64 - 45
    want = from_nchw(tF.pad(to_nchw(x), (0, pw, 0, ph), mode="reflect"))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pad_to_multiple_noop():
    x = jnp.zeros((1, 32, 64, 3))
    assert pad_to_multiple(x, 32) is x
