"""MedCLIP dual encoder in JAX: Swin-tiny vision + Bio_ClinicalBERT text.

Rebuild of the ``medclip`` pip package's ``MedCLIPModel(vision_cls=
MedCLIPVisionModelViT)`` that the reference's SemanticLoss instantiates
(reference losses.py:14-15,22-25), so that training runs end-to-end under
jit. Heads per medclip v0.0.3:

  * vision: SwinModel pooler_output -> Linear(768, 512) projection;
  * text: BertModel with output_hidden_states; hidden states of layers
    [1, 2, last] stacked, averaged over the three layers and over tokens
    (mask-weighted by default — see MedCLIPConfig.masked_token_mean),
    then Linear(768, 512);
  * ``encode_image``/``encode_text`` L2-normalize their outputs.

Pretrained weights: ``load_medclip_torch`` maps the released
``pytorch_model.bin`` (keys ``vision_model.model.*``,
``vision_model.projection_head.*``, ``text_model.model.*``,
``text_model.projection_head.*``, ``logit_scale``). The architecture +
converters are validated exactly against randomly-initialized torch
``SwinModel``/``BertModel`` in tests; validation against the released
weights themselves needs the weight file (not downloadable in this
zero-egress image) and is a load-and-run exercise.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from m2trans_tpu.models.medclip.bert import (
    BertConfig,
    bert_apply,
    bert_from_torch,
    init_bert,
)
from m2trans_tpu.models.medclip.swin import (
    SwinConfig,
    init_swin,
    swin_apply,
    swin_from_torch,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MedCLIPConfig:
    vision: SwinConfig = SwinConfig()
    text: BertConfig = BertConfig()
    projection_dim: int = 512
    # medclip v0.0.3's text pooling averages hidden layers [1, 2, -1] over
    # layers and ALL tokens ('mixed'); kept switchable in case the released
    # package differs when validated with real weights:
    #   'mixed'    — mean(hidden[1], hidden[2], hidden[-1]) then token mean
    #   'last4'    — mean of the last 4 hidden layers then token mean
    #   'cls'      — last layer [CLS] token
    text_pooling: str = "mixed"
    # The reference tokenizes each caption unpadded (losses.py:64: one
    # caption per call), so medclip's "mean over all tokens" is a mean over
    # REAL tokens only. Our batched tokenizer pads to a static max_length;
    # a mask-weighted token mean (default) reproduces the reference's
    # per-caption behavior exactly and keeps the embedding independent of
    # padding. Set False only to mirror the medclip package's behavior on
    # batched padded input (padding included in the mean).
    masked_token_mean: bool = True

    @staticmethod
    def tiny() -> "MedCLIPConfig":
        """Small config for tests / smoke training."""
        return MedCLIPConfig(
            vision=SwinConfig(image_size=56, embed_dim=16, depths=(1, 1),
                              num_heads=(2, 4)),
            text=BertConfig(vocab_size=128, hidden_size=32, num_layers=2,
                            num_heads=2, intermediate_size=64,
                            max_position_embeddings=64),
            projection_dim=16,
        )


def init_medclip(key, cfg: MedCLIPConfig) -> Params:
    kv, kt, kp1, kp2 = jax.random.split(key, 4)
    vdim = cfg.vision.hidden_size
    tdim = cfg.text.hidden_size
    return {
        "vision": init_swin(kv, cfg.vision),
        "vision_proj": {
            "w": jax.random.normal(kp1, (vdim, cfg.projection_dim)) * 0.02,
            "b": jnp.zeros((cfg.projection_dim,)),
        },
        "text": init_bert(kt, cfg.text),
        "text_proj": {
            "w": jax.random.normal(kp2, (tdim, cfg.projection_dim)) * 0.02,
            "b": jnp.zeros((cfg.projection_dim,)),
        },
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def encode_image(params: Params, pixel_values: jnp.ndarray,
                 cfg: MedCLIPConfig) -> jnp.ndarray:
    """(B, H, W, 3) NHWC -> L2-normalized (B, projection_dim).

    Note: the reference feeds raw [0,1] tensors (bicubic-resized SR/HR
    patches) directly, bypassing the MedCLIPProcessor's normalization
    (losses.py:53-69) — callers here do the same for parity."""
    _, pooled = swin_apply(params["vision"], pixel_values, cfg.vision)
    proj = pooled @ params["vision_proj"]["w"] + params["vision_proj"]["b"]
    return _normalize(proj)


def encode_text(params: Params, input_ids: jnp.ndarray,
                attention_mask: jnp.ndarray, cfg: MedCLIPConfig
                ) -> jnp.ndarray:
    """Token ids + mask -> L2-normalized (B, projection_dim), with the
    medclip layer-[1,2,-1] + token mean pooling."""
    _, hidden = bert_apply(params["text"], input_ids, attention_mask,
                           cfg.text)

    def token_mean(mix):
        if not cfg.masked_token_mean:
            return jnp.mean(mix, axis=1)  # padding included (medclip pkg)
        m = attention_mask[..., None].astype(mix.dtype)
        return (jnp.sum(mix * m, axis=1)
                / jnp.maximum(jnp.sum(m, axis=1), 1.0))

    if cfg.text_pooling == "mixed":
        pooled = token_mean((hidden[1] + hidden[2] + hidden[-1]) / 3.0)
    elif cfg.text_pooling == "last4":
        k = min(4, len(hidden) - 1)
        pooled = token_mean(sum(hidden[-i] for i in range(1, k + 1)) / k)
    elif cfg.text_pooling == "cls":
        pooled = hidden[-1][:, 0]
    else:
        raise ValueError(f"unknown text_pooling {cfg.text_pooling}")
    proj = pooled @ params["text_proj"]["w"] + params["text_proj"]["b"]
    return _normalize(proj)


def load_medclip_torch(path_or_sd, cfg: Optional[MedCLIPConfig] = None
                       ) -> Params:
    """Load the released MedCLIP ``pytorch_model.bin`` (or an in-memory
    state dict) into our param layout."""
    cfg = cfg or MedCLIPConfig()
    if isinstance(path_or_sd, (str,)):
        import torch

        sd = torch.load(path_or_sd, map_location="cpu", weights_only=True)
    else:
        sd = path_or_sd

    def t(name):
        v = sd[name]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    def proj(name, dim_out):
        w = t(f"{name}.weight").T.copy()
        b = (t(f"{name}.bias") if f"{name}.bias" in sd
             else np.zeros((dim_out,), np.float32))
        return {"w": w, "b": b}

    params = {
        "vision": swin_from_torch(sd, cfg.vision,
                                  prefix="vision_model.model."),
        "vision_proj": proj("vision_model.projection_head",
                            cfg.projection_dim),
        "text": bert_from_torch(sd, cfg.text, prefix="text_model.model."),
        "text_proj": proj("text_model.projection_head", cfg.projection_dim),
        "logit_scale": (t("logit_scale")
                        if "logit_scale" in sd
                        else np.asarray(np.log(1 / 0.07), np.float32)),
    }
    return jax.tree_util.tree_map(jnp.asarray, params)
