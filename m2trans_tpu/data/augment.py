"""On-device batched augmentations (cutmix / cutout), jit-compatible.

The reference applies these on the host with numpy between the H2D copy and
the forward pass (utils.py:16-108, train.py:177-181) — a per-step host sync.
Here they run inside the jitted train step with ``jax.random``, so the whole
step stays on-device.

Semantics preserved (not the RNG stream — numpy vs threefry):
  * cutmix (utils.py:36-71): per half-batch, with p=0.5, paste ``n_patch``
    random boxes from a shuffled copy of the half into LR, and the x`scale`
    box into HR; box area ratio lam ~ clip(Beta(alpha, alpha), 0.1, 0.3),
    side = dim * sqrt(lam), centered at a uniform pixel, clipped to bounds.
    n_patch ~ U{1..4} (train.py:178).
  * cutout (utils.py:74-108): per half-batch, with p=0.5, zero ``n_holes``
    ~ U{1..9} squares of side ``length`` in LR (train.py:181), only while
    epoch < 0.2 * epochs.

Static bounds (MAX_PATCHES / MAX_HOLES) with per-iteration activity masks
keep control flow compiler-friendly (no data-dependent Python loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_PATCHES = 4  # reference n_patch ∈ [1, 5)
MAX_HOLES = 9  # reference n_holes ∈ [1, 10)


def _clipped_box(h: int, w: int, cy, cx, cut_h, cut_w):
    """Clipped box coords centered at (cy, cx) (reference rand_bbox,
    utils.py:16-33)."""
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def _coords_mask(h: int, w: int, y1, y2, x1, x2) -> jnp.ndarray:
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)


def _box_mask(h: int, w: int, cy, cx, cut_h, cut_w) -> jnp.ndarray:
    """(H, W) bool mask of the clipped box centered at (cy, cx)."""
    return _coords_mask(h, w, *_clipped_box(h, w, cy, cx, cut_h, cut_w))


def _cutmix_half(key, lr, hr, alpha: float, scale: int):
    b, lh, lw, _ = lr.shape
    keys = jax.random.split(key, 2 + MAX_PATCHES)
    apply = jax.random.uniform(keys[0]) < 0.5
    n_patch = jax.random.randint(keys[1], (), 1, MAX_PATCHES + 1)

    def one_patch(i, carry):
        lr_c, hr_c = carry
        pk = jax.random.fold_in(keys[2], i)
        k_perm, k_lam, k_cy, k_cx = jax.random.split(pk, 4)
        perm = jax.random.permutation(k_perm, b)
        lam = jnp.clip(jax.random.beta(k_lam, alpha, alpha), 0.1, 0.3)
        cut = jnp.sqrt(lam)
        cut_h = (lh * cut).astype(jnp.int32)
        cut_w = (lw * cut).astype(jnp.int32)
        cy = jax.random.randint(k_cy, (), 0, lh)
        cx = jax.random.randint(k_cx, (), 0, lw)
        active = i < n_patch

        y1, y2, x1, x2 = _clipped_box(lh, lw, cy, cx, cut_h, cut_w)
        m_lr = _coords_mask(lh, lw, y1, y2, x1, x2) & active
        lr_new = jnp.where(m_lr[None, :, :, None], lr_c[perm], lr_c)
        # the HR box is the scaled *clipped* LR box (reference utils.py:49)
        m_hr = _coords_mask(lh * scale, lw * scale, y1 * scale, y2 * scale,
                            x1 * scale, x2 * scale) & active
        hr_new = jnp.where(m_hr[None, :, :, None], hr_c[perm], hr_c)
        return lr_new, hr_new

    lr_m, hr_m = jax.lax.fori_loop(0, MAX_PATCHES, one_patch, (lr, hr))
    return (jnp.where(apply, lr_m, lr), jnp.where(apply, hr_m, hr))


def cutmix(key, lr: jnp.ndarray, hr: jnp.ndarray, *, alpha: float = 1.0,
           scale: int = 2):
    """Scale-consistent CutMix on (LR, HR) NHWC batches."""
    b = lr.shape[0]
    if b > 1:
        k1, k2 = jax.random.split(key)
        h = b // 2
        lr1, hr1 = _cutmix_half(k1, lr[:h], hr[:h], alpha, scale)
        lr2, hr2 = _cutmix_half(k2, lr[h:], hr[h:], alpha, scale)
        return (jnp.concatenate([lr1, lr2]), jnp.concatenate([hr1, hr2]))
    return _cutmix_half(key, lr, hr, alpha, scale)


def _cutout_half(key, img, length: int):
    _, h, w, _ = img.shape
    k_apply, k_n, k_pos = jax.random.split(key, 3)
    apply = jax.random.uniform(k_apply) < 0.5
    n_holes = jax.random.randint(k_n, (), 1, MAX_HOLES + 1)

    def one_hole(i, mask):
        hk = jax.random.fold_in(k_pos, i)
        ky, kx = jax.random.split(hk)
        cy = jax.random.randint(ky, (), 0, h)
        cx = jax.random.randint(kx, (), 0, w)
        hole = _box_mask(h, w, cy, cx, length, length) & (i < n_holes)
        return mask & ~hole

    keep = jax.lax.fori_loop(0, MAX_HOLES, one_hole,
                             jnp.ones((h, w), jnp.bool_))
    out = img * keep[None, :, :, None].astype(img.dtype)
    return jnp.where(apply, out, img)


def gaussian_noise(key, img: jnp.ndarray, *, std_range=(-0.01, 0.01)
                   ) -> jnp.ndarray:
    """Additive gaussian noise with a per-batch random std (the reference's
    data_add_noise path, utils.py:187-189 + commented-out application in
    datas/us1k.py:156-160 — gated off by default there and here)."""
    k1, k2 = jax.random.split(key)
    std = jax.random.uniform(k1, (), minval=std_range[0], maxval=std_range[1])
    return img + std * jax.random.normal(k2, img.shape, img.dtype)


def cut_out(key, img: jnp.ndarray, *, length: int):
    """Zero random squares in an NHWC batch (per half-batch p=0.5)."""
    b = img.shape[0]
    if b > 1:
        k1, k2 = jax.random.split(key)
        h = b // 2
        return jnp.concatenate([
            _cutout_half(k1, img[:h], length),
            _cutout_half(k2, img[h:], length),
        ])
    return _cutout_half(key, img, length)
