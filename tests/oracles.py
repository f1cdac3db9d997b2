"""First-principles numpy oracles for parity testing.

These re-derive the reference's math from its definition (loops, explicit
padding) rather than translating its torch code — slow, tiny-shape oracles
used to validate the JAX implementation end-to-end (SURVEY.md §4 oracle (a)).
All arrays NHWC.
"""

import math

import numpy as np
from scipy import special as _sp  # scipy ships with the image (skimage absent)


def np_conv2d(x, w, b=None, pad_mode="zeros"):
    """x: (B,H,W,Ci), w: (kh,kw,Ci,Co). pad = (k-1)//2 per side."""
    kh, kw = w.shape[:2]
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    if ph or pw:
        mode = "reflect" if pad_mode == "reflect" else "constant"
        x = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=mode)
    bsz, hp, wp, ci = x.shape
    ho, wo = hp - kh + 1, wp - kw + 1
    out = np.zeros((bsz, ho, wo, w.shape[3]), np.float64)
    for i in range(kh):
        for j in range(kw):
            patch = x[:, i:i + ho, j:j + wo, :].astype(np.float64)
            out += np.einsum("bhwc,co->bhwo", patch, w[i, j].astype(np.float64))
    if b is not None:
        out += b
    return out


def np_instance_norm(x, eps=1e-5):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / np.sqrt(var + eps)


def np_gelu(x):
    return 0.5 * x * (1.0 + _sp.erf(x / math.sqrt(2.0)))


def np_pixel_shuffle(x, r):
    bsz, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(bsz, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(bsz, h * r, w * r, c)


def np_haar_dwt(x):
    a = x[:, 0::2, 0::2, :]
    b = x[:, 1::2, 0::2, :]
    c = x[:, 0::2, 1::2, :]
    d = x[:, 1::2, 1::2, :]
    return np.concatenate([
        (a + b + c + d) / 2, (-a - b + c + d) / 2,
        (-a + b - c + d) / 2, (a - b - c + d) / 2,
    ], axis=-1)


def np_haar_iwt(x):
    bsz, h, w, c4 = x.shape
    c = c4 // 4
    ll, hl, lh, hh = np.split(x, 4, axis=-1)
    out = np.zeros((bsz, 2 * h, 2 * w, c), x.dtype)
    out[:, 0::2, 0::2] = (ll - hl - lh + hh) / 2
    out[:, 1::2, 0::2] = (ll - hl + lh - hh) / 2
    out[:, 0::2, 1::2] = (ll + hl - lh - hh) / 2
    out[:, 1::2, 1::2] = (ll + hl + lh + hh) / 2
    return out


def np_halo_attention(x_q, x_k, x_v, rel_h, rel_w, block=8, halo=1):
    bsz, h, w, c = x_q.shape
    win = block + 2 * halo
    out = np.zeros_like(x_q)
    kp = np.pad(x_k, ((0, 0), (halo, halo), (halo, halo), (0, 0)))
    vp = np.pad(x_v, ((0, 0), (halo, halo), (halo, halo), (0, 0)))
    for b in range(bsz):
        for bi in range(h // block):
            for bj in range(w // block):
                q = x_q[b, bi * block:(bi + 1) * block,
                        bj * block:(bj + 1) * block].reshape(-1, c)
                q = q * (c ** -0.5)
                k = kp[b, bi * block:bi * block + win,
                       bj * block:bj * block + win].copy()
                k[..., : c // 2] += rel_h[:, None, :]
                k[..., c // 2:] += rel_w[None, :, :]
                k = k.reshape(-1, c)
                v = vp[b, bi * block:bi * block + win,
                       bj * block:bj * block + win].reshape(-1, c)
                sim = q @ k.T
                sim -= sim.max(-1, keepdims=True)
                attn = np.exp(sim)
                attn /= attn.sum(-1, keepdims=True)
                out[b, bi * block:(bi + 1) * block,
                    bj * block:(bj + 1) * block] = (attn @ v).reshape(
                        block, block, c)
    return out


def np_tblock(p, x, block=8, halo=1):
    qkv = np_conv2d(x, p["qkv_w"])
    c = x.shape[-1]
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    return np_halo_attention(q, k, v, np.asarray(p["rel_h"]),
                             np.asarray(p["rel_w"]), block, halo)


def np_cftm(p, x, block=8, halo=1):
    xn = np_instance_norm(x)
    c4 = x.shape[-1] // 4
    x1, x2, x3, x4 = (xn[..., i * c4:(i + 1) * c4] for i in range(4))

    x1 = np_tblock(p["attn1"], x1, block, halo) + x1
    x2 = (x2 + x1) / 2
    x2 = np_haar_iwt(np_tblock(p["attn2"], np_haar_dwt(x2), block, halo)) + x2
    x3 = (x3 + x2) / 2
    x3 = np_haar_iwt(np_haar_iwt(
        np_tblock(p["attn3"], np_haar_dwt(np_haar_dwt(x3)), block, halo))) + x3
    x4 = (x4 + x3) / 2
    x4 = np_haar_iwt(np_haar_iwt(
        np_tblock(p["attn4"], np_haar_dwt(np_haar_dwt(x4)), block, halo))) + x4

    xc = np.concatenate([x1, x2, x3, x4], axis=-1)
    return np_conv2d(xc, p["ff"]["w"], p["ff"]["b"], pad_mode="zeros") + x


def np_m2trans(params, x, scale, rgb_range=1.0, pad_multiple=32):
    h, w = x.shape[1], x.shape[2]
    ph = (pad_multiple - h % pad_multiple) % pad_multiple
    pw = (pad_multiple - w % pad_multiple) % pad_multiple
    if ph or pw:
        x = np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    res = np_conv2d(x, params["head"]["w"], params["head"]["b"],
                    pad_mode="reflect")
    y = res
    for blk in params["body"]:
        y = np_cftm(blk, y)
    y = res + y
    t = params["tail"]
    if scale == 4:
        y = np_gelu(np_pixel_shuffle(np_conv2d(y, t["c0"]["w"], t["c0"]["b"]), 2))
        y = np_gelu(np_pixel_shuffle(np_conv2d(y, t["c1"]["w"], t["c1"]["b"]), 2))
        y = np_conv2d(y, t["c2"]["w"], pad_mode="reflect")
    else:
        y = np_gelu(np_pixel_shuffle(
            np_conv2d(y, t["c0"]["w"], t["c0"]["b"]), scale))
        y = np_conv2d(y, t["c1"]["w"], pad_mode="reflect")
    y = np.clip(y, 0.0, rgb_range)
    return y[:, : h * scale, : w * scale, :]
