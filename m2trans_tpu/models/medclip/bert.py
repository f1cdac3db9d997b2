"""BERT text encoder in functional JAX.

MedCLIP's text encoder is ``emilyalsentzer/Bio_ClinicalBERT`` (a bert-base
post-LN encoder) via HF ``BertModel``; the MedCLIP text head averages
hidden states of layers [1, 2, last] over layers and tokens before the
projection (see model.py). Architecture parity is tested against a
randomly-initialized torch ``transformers.BertModel`` through the weight
converter.

Param layout: nested dicts; Linear weights stored (in, out) = torch ``.T``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 28996
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


def _layer_norm(x, g, b, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return (y * g + b).astype(x.dtype)


def bert_apply(params: Params, input_ids: jnp.ndarray,
               attention_mask: jnp.ndarray, cfg: BertConfig,
               token_type_ids: jnp.ndarray = None
               ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Returns (last_hidden_state, hidden_states list of num_layers+1)."""
    bsz, seq = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    emb = (params["embeddings"]["word"][input_ids]
           + params["embeddings"]["position"][jnp.arange(seq)][None]
           + params["embeddings"]["token_type"][token_type_ids])
    x = _layer_norm(emb, params["embeddings"]["ln"]["g"],
                    params["embeddings"]["ln"]["b"], cfg.layer_norm_eps)

    ext_mask = (1.0 - attention_mask.astype(jnp.float32)) * -10000.0
    ext_mask = ext_mask[:, None, None, :]  # (B, 1, 1, S)

    hd = cfg.hidden_size // cfg.num_heads
    hidden_states = [x]
    for layer in params["layers"]:
        a = layer["attn"]

        def split(t):
            return t.reshape(bsz, seq, cfg.num_heads, hd).transpose(
                0, 2, 1, 3)

        q = split(x @ a["q_w"] + a["q_b"]) * (hd ** -0.5)
        k = split(x @ a["k_w"] + a["k_b"])
        v = split(x @ a["v_w"] + a["v_b"])
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores + ext_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(bsz, seq, cfg.hidden_size)
        attn_out = ctx @ a["o_w"] + a["o_b"]
        x = _layer_norm(x + attn_out, a["ln"]["g"], a["ln"]["b"],
                        cfg.layer_norm_eps)

        f = layer["ffn"]
        h = jax.nn.gelu(x @ f["fc1_w"] + f["fc1_b"], approximate=False)
        h = h @ f["fc2_w"] + f["fc2_b"]
        x = _layer_norm(x + h, f["ln"]["g"], f["ln"]["b"],
                        cfg.layer_norm_eps)
        hidden_states.append(x)
    return x, hidden_states


def init_bert(key, cfg: BertConfig) -> Params:
    keys = jax.random.split(key, 8 + 8 * cfg.num_layers)
    ki = iter(range(len(keys)))

    def nrm(shape, std=0.02):
        return jax.random.normal(keys[next(ki)], shape, jnp.float32) * std

    def linear(cin, cout):
        return {"w": nrm((cin, cout)), "b": jnp.zeros((cout,), jnp.float32)}

    h = cfg.hidden_size
    params: Params = {
        "embeddings": {
            "word": nrm((cfg.vocab_size, h)),
            "position": nrm((cfg.max_position_embeddings, h)),
            "token_type": nrm((cfg.type_vocab_size, h)),
            "ln": {"g": jnp.ones((h,)), "b": jnp.zeros((h,))},
        },
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        attn = {}
        for nme in ("q", "k", "v", "o"):
            lin = linear(h, h)
            attn[f"{nme}_w"] = lin["w"]
            attn[f"{nme}_b"] = lin["b"]
        attn["ln"] = {"g": jnp.ones((h,)), "b": jnp.zeros((h,))}
        fc1 = linear(h, cfg.intermediate_size)
        fc2 = linear(cfg.intermediate_size, h)
        params["layers"].append({
            "attn": attn,
            "ffn": {"fc1_w": fc1["w"], "fc1_b": fc1["b"],
                    "fc2_w": fc2["w"], "fc2_b": fc2["b"],
                    "ln": {"g": jnp.ones((h,)), "b": jnp.zeros((h,))}},
        })
    return params


def bert_from_torch(sd: Dict[str, Any], cfg: BertConfig,
                    prefix: str = "") -> Params:
    """Convert an HF ``BertModel`` state dict (optionally nested under
    ``prefix``, e.g. 'text_model.model.')."""

    def t(name):
        v = sd[prefix + name]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    def lin(name):
        return {"w": t(f"{name}.weight").T.copy(), "b": t(f"{name}.bias")}

    params: Params = {
        "embeddings": {
            "word": t("embeddings.word_embeddings.weight"),
            "position": t("embeddings.position_embeddings.weight"),
            "token_type": t("embeddings.token_type_embeddings.weight"),
            "ln": {"g": t("embeddings.LayerNorm.weight"),
                   "b": t("embeddings.LayerNorm.bias")},
        },
        "layers": [],
    }
    for i in range(cfg.num_layers):
        base = f"encoder.layer.{i}"
        attn = {}
        for ours, theirs in (("q", "attention.self.query"),
                             ("k", "attention.self.key"),
                             ("v", "attention.self.value"),
                             ("o", "attention.output.dense")):
            ln_ = lin(f"{base}.{theirs}")
            attn[f"{ours}_w"] = ln_["w"]
            attn[f"{ours}_b"] = ln_["b"]
        attn["ln"] = {"g": t(f"{base}.attention.output.LayerNorm.weight"),
                      "b": t(f"{base}.attention.output.LayerNorm.bias")}
        fc1 = lin(f"{base}.intermediate.dense")
        fc2 = lin(f"{base}.output.dense")
        params["layers"].append({
            "attn": attn,
            "ffn": {"fc1_w": fc1["w"], "fc1_b": fc1["b"],
                    "fc2_w": fc2["w"], "fc2_b": fc2["b"],
                    "ln": {"g": t(f"{base}.output.LayerNorm.weight"),
                           "b": t(f"{base}.output.LayerNorm.bias")}},
        })
    return jax.tree_util.tree_map(jnp.asarray, params)
