"""MedCLIP semantic (image-text) regularization loss, batched + jittable.

Reference semantics (losses.py:18-81, SemanticLoss): per SR/HR pair, build
a patch set = [bicubic-resize-to-224 (align_corners=True)] + (N_patches-1)
random aligned 224x224 crops; encode each patch pair and the caption with
MedCLIP; loss += |x_clip . t^T - y_clip . t^T| / N_patches, summed over the
batch (train.py:202-205 loops samples and accumulates).

The reference implementation has three load-bearing quirks (SURVEY.md §2.2)
— reproduced only under ``faithful=True``:
  1. everything under torch.no_grad() -> the CLIP term contributes a value
     but ZERO gradient (losses.py:63);
  2. the patch loop overwrites x_clip/y_clip, so only the LAST patch
     contributes, scaled by 1/N_patches (losses.py:67-79);
  3. encode_text is called with token_type_ids (all zeros) instead of
     input_ids (losses.py:64-65) — the text embedding is that of a zero
     token sequence, constant across captions.

Default (fixed) mode implements the paper's intent: differentiable, all
patches averaged, real token ids.

TPU-first: the whole loss is one jitted computation over the batch — the
reference serializes B tokenizer calls + 2*B*N_patches CLIP forwards per
step on the host (its biggest throughput sin, SURVEY.md §3.1). Tokenization
happens once on the host per step with static padding (``tokenize``); the
text encoder pools with a mask-weighted token mean by default so the
embedding is independent of the static padding amount (it matches the
reference's per-caption unpadded tokenization).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from m2trans_tpu.models.medclip.model import (
    MedCLIPConfig,
    encode_image,
    encode_text,
)
from m2trans_tpu.ops.resize import bicubic_resize


def crop_offsets(key, bsz, h, w, n, size):
    """(n, B) y/x origins for the aligned random crops — the shared
    randomness both sides of the staged loss must agree on."""
    keys = jax.random.split(key, 2)
    ys = jax.random.randint(keys[0], (n, bsz), 0, h - size)
    xs = jax.random.randint(keys[1], (n, bsz), 0, w - size)
    return ys, xs


def _crops_at(x, ys, xs, size):
    """(n, B, size, size, C) crops of x at the given per-image origins."""
    c = x.shape[-1]

    def crop_one(img, oy, ox):
        return jax.lax.dynamic_slice(img, (oy, ox, 0), (size, size, c))

    return jax.vmap(lambda oys, oxs: jax.vmap(crop_one)(x, oys, oxs))(ys, xs)


def _random_aligned_crops(key, x, y, n, size):
    """(n, B, size, size, C) aligned random crops of x and y."""
    bsz, h, w, _ = x.shape
    ys, xs = crop_offsets(key, bsz, h, w, n, size)
    return _crops_at(x, ys, xs, size), _crops_at(y, ys, xs, size)


def semantic_loss(
    medclip_params,
    mcfg: MedCLIPConfig,
    sr: jnp.ndarray,
    hr: jnp.ndarray,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    key,
    *,
    n_patches: int = 3,
    clip_size: int = 224,
    faithful: bool = False,
    token_type_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched CLIP loss; returns the SUM over the batch (matching the
    reference's per-sample accumulation)."""
    bsz = sr.shape[0]
    if sr.shape[-1] != 3:  # gray -> 3ch repeat (reference losses.py:47-49)
        sr = jnp.repeat(sr, 3, axis=-1)
        hr = jnp.repeat(hr, 3, axis=-1)
    resized = (bicubic_resize(sr, (clip_size, clip_size)),
               bicubic_resize(hr, (clip_size, clip_size)))
    patches_x = [resized[0]]
    patches_y = [resized[1]]
    if min(sr.shape[1], sr.shape[2]) <= clip_size:
        # image too small for random crops (the reference would crash on
        # torch.randint(dim - 224) here); fall back to the resized patch only
        n_patches = 1
    if n_patches > 1:
        cx, cy = _random_aligned_crops(key, sr, hr, n_patches - 1, clip_size)
        patches_x += [cx[i] for i in range(n_patches - 1)]
        patches_y += [cy[i] for i in range(n_patches - 1)]

    if faithful:
        # quirk 3: the "text" is the zero token sequence
        ids = (token_type_ids if token_type_ids is not None
               else jnp.zeros_like(input_ids))
        t = encode_text(medclip_params, ids, attention_mask, mcfg)
    else:
        t = encode_text(medclip_params, input_ids, attention_mask, mcfg)

    # one batched vision forward over all patches of both images; the
    # encoders run in the MedCLIP params' dtype (bf16 when
    # cfg.medclip_dtype selects the speed mode — the f32 path moves
    # ~30 ms/step of embedding-table copies + stage-1 activation DMA at
    # real scale, NOTES_ROUND4), similarity in f32 either way
    pdt = medclip_params["vision_proj"]["w"].dtype
    stack = jnp.concatenate(patches_x + patches_y, axis=0).astype(pdt)
    emb = encode_image(medclip_params, stack, mcfg)  # already normalized
    emb = emb.reshape(2 * n_patches, bsz, -1).astype(jnp.float32)
    t = t.astype(jnp.float32)

    ex, ey = emb[:n_patches], emb[n_patches:]
    sim_x = jnp.einsum("pbd,bd->pb", ex, t)
    sim_y = jnp.einsum("pbd,bd->pb", ey, t)
    per_patch = jnp.abs(sim_x - sim_y)  # (P, B)

    if faithful:
        # quirk 2: only the last patch contributes, scaled 1/N
        loss = jnp.sum(per_patch[-1]) / n_patches
        # quirk 1: value only, no gradient
        return jax.lax.stop_gradient(loss)
    return jnp.sum(per_patch) / n_patches


# --- staged formulation -------------------------------------------------
#
# d clip/d sr does not flow through the text encoder or the HR-side
# vision encoder — both are constants w.r.t. sr. The staged API lets a
# split train step (e.g. scripts/bench_clip_train.py's exact-split
# formulation) keep them OUT of the differentiated program entirely:
# the BERT token-embedding table (89 MB f32 — the profiled ~30 ms/step
# of copies, NOTES_ROUND4 §6) and half the Swin patch batch then never
# enter the grad program. Composition reproduces ``semantic_loss``
# exactly (same crop randomness via ``crop_offsets``; the only change
# is encoding sr/hr patches in two P*B batches instead of one 2*P*B —
# LayerNorm is per-token, so values match to f32 reduction noise).


def _patch_stack(img, ys, xs, n_patches, clip_size):
    """[resized] + aligned crops -> (P*B, clip, clip, 3) patch stack."""
    if img.shape[-1] != 3:  # gray -> 3ch repeat (reference losses.py:47-49)
        img = jnp.repeat(img, 3, axis=-1)
    patches = [bicubic_resize(img, (clip_size, clip_size))]
    if n_patches > 1:
        c = _crops_at(img, ys, xs, clip_size)
        patches += [c[i] for i in range(n_patches - 1)]
    return jnp.concatenate(patches, axis=0)


def clip_text_embed(medclip_params, mcfg, input_ids, attention_mask, *,
                    faithful=False, token_type_ids=None):
    """Text-side stage: caption embedding t (B, D) in f32."""
    if faithful:  # quirk 3: the "text" is the zero token sequence
        ids = (token_type_ids if token_type_ids is not None
               else jnp.zeros_like(input_ids))
        t = encode_text(medclip_params, ids, attention_mask, mcfg)
    else:
        t = encode_text(medclip_params, input_ids, attention_mask, mcfg)
    return t.astype(jnp.float32)


def clip_image_sims(medclip_params, mcfg, img, ys, xs, t, *,
                    n_patches=3, clip_size=224):
    """Vision-side stage: per-patch similarities (P, B) in f32."""
    bsz = img.shape[0]
    if min(img.shape[1], img.shape[2]) <= clip_size:
        n_patches = 1  # same small-image fallback as semantic_loss
    pdt = medclip_params["vision_proj"]["w"].dtype
    stack = _patch_stack(img, ys, xs, n_patches, clip_size).astype(pdt)
    emb = encode_image(medclip_params, stack, mcfg)  # already normalized
    emb = emb.reshape(n_patches, bsz, -1).astype(jnp.float32)
    return jnp.einsum("pbd,bd->pb", emb, t)


def semantic_loss_staged(medclip_params, mcfg, sr, ys, xs, t, sim_y, *,
                         n_patches=3, clip_size=224, faithful=False):
    """Grad-side stage: only the SR-side vision encoder is inside.

    ``t`` from :func:`clip_text_embed`, ``sim_y`` from
    :func:`clip_image_sims` on hr, ``ys``/``xs`` from
    :func:`crop_offsets` with the same key semantics as semantic_loss.
    """
    if min(sr.shape[1], sr.shape[2]) <= clip_size:
        n_patches = 1
    sim_x = clip_image_sims(medclip_params, mcfg, sr, ys, xs, t,
                            n_patches=n_patches, clip_size=clip_size)
    per_patch = jnp.abs(sim_x - sim_y)  # (P, B)
    if faithful:
        loss = jnp.sum(per_patch[-1]) / n_patches
        return jax.lax.stop_gradient(loss)
    return jnp.sum(per_patch) / n_patches


class SemanticLossFn:
    """Callable bundle the Trainer uses: host-side ``tokenize`` + the
    jit-traceable loss."""

    def __init__(self, medclip_params, mcfg: MedCLIPConfig, tokenizer,
                 *, n_patches: int = 3, clip_size: int = 224,
                 faithful: bool = False, max_length: int = 64,
                 dtype=None):
        if dtype is not None:
            medclip_params = jax.tree_util.tree_map(
                lambda x: x.astype(dtype)
                if x.dtype == jnp.float32 else x, medclip_params)
        self.params = medclip_params
        self.mcfg = mcfg
        self.tokenizer = tokenizer
        self.n_patches = n_patches
        self.clip_size = clip_size
        self.faithful = faithful
        self.max_length = max_length

    def tokenize(self, captions: List[str]) -> Dict[str, np.ndarray]:
        out = self.tokenizer(
            captions, return_tensors="np", padding="max_length",
            truncation=True, max_length=self.max_length)
        toks = {"input_ids": out["input_ids"].astype(np.int32),
                "attention_mask": out["attention_mask"].astype(np.int32)}
        if "token_type_ids" in out:
            toks["token_type_ids"] = out["token_type_ids"].astype(np.int32)
        return toks

    def loss_from_params(self, medclip_params, sr, hr,
                         captions: Dict[str, Any], key=None):
        """Same loss with the MedCLIP weights as an EXPLICIT (traced)
        argument — required inside jitted train steps: closure-captured
        weight trees are baked into the serialized compile payload as
        HLO constants, which remote AOT compile services reject for the
        89 MB BERT table (HTTP 413 via the axon tunnel)."""
        if captions is None:
            return jnp.float32(0.0)
        if key is None:
            key = jax.random.PRNGKey(0)
        return semantic_loss(
            medclip_params, self.mcfg, sr, hr,
            jnp.asarray(captions["input_ids"]),
            jnp.asarray(captions["attention_mask"]),
            key,
            n_patches=self.n_patches,
            clip_size=self.clip_size,
            faithful=self.faithful,
            token_type_ids=(jnp.asarray(captions["token_type_ids"])
                            if "token_type_ids" in captions else None),
        )

    def const_stage_from_params(self, medclip_params, hr,
                                captions: Dict[str, Any], key=None):
        """Everything the CLIP loss needs that carries no d/d(sr): crop
        offsets + text embedding + HR-side patch similarities. Computed
        OUTSIDE the differentiated closure of the train step, so the
        BERT text encoder (89 MB embedding table) and the HR-side Swin
        forward never enter the backward program — measured -16.7
        ms/step bf16 / -19.7 f32 at the x4 recipe vs the monolithic
        loss (CLIP_STAGED_r05.json; composition parity:
        tests/test_medclip.py::test_semantic_loss_staged_matches_monolithic).
        Pairs with :meth:`loss_staged_from_params` inside the grad."""
        if captions is None:
            return None
        if key is None:
            key = jax.random.PRNGKey(0)
        bsz, h, w = hr.shape[0], hr.shape[1], hr.shape[2]
        n_crops = max(self.n_patches - 1, 0)
        if min(h, w) <= self.clip_size:
            # small-image fallback (semantic_loss drops to the resized
            # patch only); offsets are unused but keep a static shape
            ys = xs = jnp.zeros((n_crops, bsz), jnp.int32)
        else:
            ys, xs = crop_offsets(key, bsz, h, w, n_crops,
                                  self.clip_size)
        t = clip_text_embed(
            medclip_params, self.mcfg,
            jnp.asarray(captions["input_ids"]),
            jnp.asarray(captions["attention_mask"]),
            faithful=self.faithful,
            token_type_ids=(jnp.asarray(captions["token_type_ids"])
                            if "token_type_ids" in captions else None))
        sim_y = clip_image_sims(medclip_params, self.mcfg, hr, ys, xs, t,
                                n_patches=self.n_patches,
                                clip_size=self.clip_size)
        return ys, xs, t, sim_y

    def loss_staged_from_params(self, medclip_params, sr, const):
        """Grad-side half of the staged loss: only the SR-side vision
        encoder runs inside the differentiated program."""
        if const is None:
            return jnp.float32(0.0)
        ys, xs, t, sim_y = const
        return semantic_loss_staged(medclip_params, self.mcfg, sr, ys,
                                    xs, t, sim_y,
                                    n_patches=self.n_patches,
                                    clip_size=self.clip_size,
                                    faithful=self.faithful)

    def __call__(self, sr, hr, captions: Dict[str, Any], key=None):
        if captions is None:
            return jnp.float32(0.0)
        if key is None:
            key = jax.random.PRNGKey(0)
        return semantic_loss(
            self.params, self.mcfg, sr, hr,
            jnp.asarray(captions["input_ids"]),
            jnp.asarray(captions["attention_mask"]),
            key,
            n_patches=self.n_patches,
            clip_size=self.clip_size,
            faithful=self.faithful,
            token_type_ids=(jnp.asarray(captions["token_type_ids"])
                            if "token_type_ids" in captions else None),
        )


def make_semantic_loss(cfg) -> SemanticLossFn:
    """Build the loss from a Config: loads MedCLIP weights + tokenizer from
    ``cfg.medclip_path`` (a directory with pytorch_model.bin + tokenizer
    files, i.e. the released MedCLIP zip contents)."""
    import os

    from transformers import AutoTokenizer

    from m2trans_tpu.models.medclip.model import load_medclip_torch

    tiny = getattr(cfg, "medclip_tiny", False)
    mcfg = MedCLIPConfig.tiny() if tiny else MedCLIPConfig()
    weight_file = os.path.join(cfg.medclip_path, "pytorch_model.bin")
    params = load_medclip_torch(weight_file, mcfg)
    tokenizer = AutoTokenizer.from_pretrained(cfg.medclip_path)
    dtype = (jnp.bfloat16 if getattr(cfg, "medclip_dtype",
                                     "float32") == "bfloat16" else None)
    return SemanticLossFn(params, mcfg, tokenizer, n_patches=3,
                          clip_size=(56 if tiny else 224),
                          faithful=cfg.faithful_clip, dtype=dtype)
