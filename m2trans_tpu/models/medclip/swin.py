"""Swin Transformer vision encoder in functional JAX (NHWC).

MedCLIP's ViT vision encoder is HF ``SwinModel``
('microsoft/swin-tiny-patch4-window7-224'): patch-embed conv (4x4/4) +
LayerNorm, 4 stages of [W-MSA | SW-MSA] blocks with relative position bias
and PatchMerging downsampling, final LayerNorm, mean-pool pooler. Needed so
the SemanticLoss (reference losses.py:18-81) runs fully under jit.

Architecture parity is tested against a randomly-initialized torch
``transformers.SwinModel`` via the weight converter (tests/test_medclip.py)
— exact to f32 tolerance, so loading the released MedCLIP weights is a pure
key-mapping exercise.

Param layout: nested dicts; Linear weights stored (in, out) = torch ``.T``.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_size: int = 224
    patch_size: int = 4
    num_channels: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-5

    @property
    def hidden_size(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


def _layer_norm(x, g, b, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return (y * g + b).astype(x.dtype)


@lru_cache(maxsize=8)
def _relative_position_index(window: int) -> np.ndarray:
    """(window^2, window^2) indices into the (2w-1)^2 bias table (the
    standard Swin construction)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # 2, w, w
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, w^2, w^2
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


@lru_cache(maxsize=32)
def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(num_windows, w^2, w^2) additive mask (-100 off-region) for SW-MSA."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(h // window, window, w // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = img[:, :, None] != img[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _window_partition(x, window):
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def _window_reverse(x, window, h, w):
    b = x.shape[0] // ((h // window) * (w // window))
    c = x.shape[-1]
    x = x.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _attention(p, x, heads, window, shift, h, w, eps):
    """Windowed (optionally shifted) MHA over (B, H, W, C)."""
    b, _, _, c = x.shape
    hd = c // heads

    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    xw = _window_partition(x, window)  # (B*nW, w^2, C)
    n = window * window

    def proj(name):
        return xw @ p[f"{name}_w"] + p[f"{name}_b"]

    def split_heads(t):
        return t.reshape(-1, n, heads, hd).transpose(0, 2, 1, 3)

    q = split_heads(proj("q")) * (hd ** -0.5)
    k = split_heads(proj("k"))
    v = split_heads(proj("v"))
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32)

    rpi = _relative_position_index(window)
    bias = p["rpb_table"][jnp.asarray(rpi.reshape(-1))]
    bias = bias.reshape(n, n, heads).transpose(2, 0, 1)  # (heads, n, n)
    attn = attn + bias[None].astype(attn.dtype)

    if shift:
        mask = jnp.asarray(_shift_attn_mask(h, w, window, shift))
        nw = mask.shape[0]
        attn = attn.reshape(-1, nw, heads, n, n) + mask[None, :, None]
        attn = attn.reshape(-1, heads, n, n)

    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(-1, n, c)
    out = out @ p["o_w"] + p["o_b"]
    out = _window_reverse(out, window, h, w)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    return out


def _mlp(p, x):
    h = x @ p["fc1_w"] + p["fc1_b"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ p["fc2_w"] + p["fc2_b"]


def _patch_merge(p, x, eps):
    """2x2 neighbor concat -> LayerNorm -> Linear(4C->2C, no bias)."""
    a = x[:, 0::2, 0::2, :]
    b = x[:, 1::2, 0::2, :]
    c = x[:, 0::2, 1::2, :]
    d = x[:, 1::2, 1::2, :]
    y = jnp.concatenate([a, b, c, d], axis=-1)
    y = _layer_norm(y, p["norm"]["g"], p["norm"]["b"], eps)
    return y @ p["reduction_w"]


def swin_apply(params: Params, pixel_values: jnp.ndarray,
               cfg: SwinConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pixel_values: (B, H, W, 3) NHWC. Returns (sequence_output pooled,
    pooler_output): pooled mean over tokens of the layernormed final
    features (HF SwinModel pooler)."""
    eps = cfg.layer_norm_eps
    x = lax.conv_general_dilated(
        pixel_values, params["patch_embed"]["w"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_embed"]["b"]
    x = _layer_norm(x, params["embed_norm"]["g"], params["embed_norm"]["b"],
                    eps)

    for si, stage in enumerate(params["stages"]):
        heads = cfg.num_heads[si]
        h, w = x.shape[1], x.shape[2]
        for di, blk in enumerate(stage["blocks"]):
            shift = 0 if di % 2 == 0 else cfg.window_size // 2
            if min(h, w) <= cfg.window_size:
                shift = 0  # HF behavior when the window covers the image
            res = x
            y = _layer_norm(x, blk["ln1"]["g"], blk["ln1"]["b"], eps)
            y = _attention(blk["attn"], y, heads, cfg.window_size, shift,
                           h, w, eps)
            x = res + y
            res = x
            y = _layer_norm(x, blk["ln2"]["g"], blk["ln2"]["b"], eps)
            x = res + _mlp(blk["mlp"], y)
        if stage.get("downsample") is not None:
            x = _patch_merge(stage["downsample"], x, eps)

    x = _layer_norm(x, params["final_norm"]["g"], params["final_norm"]["b"],
                    eps)
    b, h, w, c = x.shape
    seq = x.reshape(b, h * w, c)
    pooled = jnp.mean(seq, axis=1)
    return seq, pooled


# ---------------------------------------------------------------------------
# init + torch conversion
# ---------------------------------------------------------------------------


def init_swin(key, cfg: SwinConfig) -> Params:
    """Random init (trunc-normal-ish); real use loads converted weights."""
    e = cfg.embed_dim
    # fold-in counter instead of a fixed pre-split pool: the full-size
    # config needs 88 keys (12 blocks x 7 + embeddings + reductions) and
    # a 64-key pool StopIteration'd on it (r3 fix; tiny config fit)
    counter = iter(range(1 << 30))

    def nrm(shape, std=0.02):
        k = jax.random.fold_in(key, next(counter))
        return jax.random.normal(k, shape, jnp.float32) * std

    def linear(cin, cout, bias=True):
        p = {}
        p["w"] = nrm((cin, cout))
        if bias:
            p["b"] = jnp.zeros((cout,), jnp.float32)
        return p

    params: Params = {
        "patch_embed": {
            "w": nrm((cfg.patch_size, cfg.patch_size, cfg.num_channels, e)),
            "b": jnp.zeros((e,), jnp.float32),
        },
        "embed_norm": {"g": jnp.ones((e,)), "b": jnp.zeros((e,))},
    }
    stages: List[Params] = []
    dim = e
    nw = 2 * cfg.window_size - 1
    for si, depth in enumerate(cfg.depths):
        heads = cfg.num_heads[si]
        blocks = []
        for _ in range(depth):
            qkv = {}
            for nme in ("q", "k", "v", "o"):
                lin = linear(dim, dim)
                qkv[f"{nme}_w"] = lin["w"]
                qkv[f"{nme}_b"] = lin["b"]
            qkv["rpb_table"] = nrm((nw * nw, heads))
            hidden = int(dim * cfg.mlp_ratio)
            fc1 = linear(dim, hidden)
            fc2 = linear(hidden, dim)
            blocks.append({
                "ln1": {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))},
                "attn": qkv,
                "ln2": {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))},
                "mlp": {"fc1_w": fc1["w"], "fc1_b": fc1["b"],
                        "fc2_w": fc2["w"], "fc2_b": fc2["b"]},
            })
        stage: Params = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": {"g": jnp.ones((4 * dim,)), "b": jnp.zeros((4 * dim,))},
                "reduction_w": nrm((4 * dim, 2 * dim)),
            }
            dim *= 2
        else:
            stage["downsample"] = None
        stages.append(stage)
    params["stages"] = stages
    params["final_norm"] = {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}
    return params


def swin_from_torch(sd: Dict[str, Any], cfg: SwinConfig,
                    prefix: str = "") -> Params:
    """Convert an HF ``SwinModel`` state dict (optionally nested under
    ``prefix``, e.g. 'vision_model.model.') to our param layout."""

    def t(name):
        v = sd[prefix + name]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    def lin(name):
        return {"w": t(f"{name}.weight").T.copy(), "b": t(f"{name}.bias")}

    params: Params = {
        "patch_embed": {
            "w": t("embeddings.patch_embeddings.projection.weight"
                   ).transpose(2, 3, 1, 0).copy(),
            "b": t("embeddings.patch_embeddings.projection.bias"),
        },
        "embed_norm": {"g": t("embeddings.norm.weight"),
                       "b": t("embeddings.norm.bias")},
    }
    stages: List[Params] = []
    for si, depth in enumerate(cfg.depths):
        blocks = []
        for di in range(depth):
            base = f"encoder.layers.{si}.blocks.{di}"
            attn: Params = {}
            for ours, theirs in (("q", "attention.self.query"),
                                 ("k", "attention.self.key"),
                                 ("v", "attention.self.value"),
                                 ("o", "attention.output.dense")):
                ln_ = lin(f"{base}.{theirs}")
                attn[f"{ours}_w"] = ln_["w"]
                attn[f"{ours}_b"] = ln_["b"]
            attn["rpb_table"] = t(
                f"{base}.attention.self.relative_position_bias_table")
            fc1 = lin(f"{base}.intermediate.dense")
            fc2 = lin(f"{base}.output.dense")
            blocks.append({
                "ln1": {"g": t(f"{base}.layernorm_before.weight"),
                        "b": t(f"{base}.layernorm_before.bias")},
                "attn": attn,
                "ln2": {"g": t(f"{base}.layernorm_after.weight"),
                        "b": t(f"{base}.layernorm_after.bias")},
                "mlp": {"fc1_w": fc1["w"], "fc1_b": fc1["b"],
                        "fc2_w": fc2["w"], "fc2_b": fc2["b"]},
            })
        stage: Params = {"blocks": blocks}
        ds = f"encoder.layers.{si}.downsample"
        if prefix + ds + ".reduction.weight" in sd:
            stage["downsample"] = {
                "norm": {"g": t(f"{ds}.norm.weight"),
                         "b": t(f"{ds}.norm.bias")},
                "reduction_w": t(f"{ds}.reduction.weight").T.copy(),
            }
        else:
            stage["downsample"] = None
        stages.append(stage)
    params["stages"] = stages
    params["final_norm"] = {"g": t("layernorm.weight"),
                            "b": t("layernorm.bias")}
    return jax.tree_util.tree_map(jnp.asarray, params)
