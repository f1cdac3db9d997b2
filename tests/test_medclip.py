"""MedCLIP-JAX: exact architecture parity vs torch transformers (random
weights through the converters), loss semantics, faithful-quirk modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from m2trans_tpu.models.medclip.bert import BertConfig, bert_apply, bert_from_torch
from m2trans_tpu.models.medclip.model import (
    MedCLIPConfig,
    encode_image,
    encode_text,
    init_medclip,
    load_medclip_torch,
)
from m2trans_tpu.models.medclip.swin import SwinConfig, swin_apply, swin_from_torch
from m2trans_tpu.losses.semantic import SemanticLossFn, semantic_loss


def test_swin_matches_torch(rng):
    from transformers import SwinConfig as HFSwinConfig, SwinModel

    hf = SwinModel(HFSwinConfig(
        image_size=56, patch_size=4, embed_dim=16, depths=[2, 2],
        num_heads=[2, 4], window_size=7, num_channels=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0)).eval()
    cfg = SwinConfig(image_size=56, embed_dim=16, depths=(2, 2),
                     num_heads=(2, 4))
    params = swin_from_torch(hf.state_dict(), cfg)
    x = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    seq, pool = swin_apply(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(seq),
                               out.last_hidden_state.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pool),
                               out.pooler_output.numpy(), atol=2e-5)


def test_bert_matches_torch(rng):
    from transformers import BertConfig as HFBertConfig, BertModel

    hf = BertModel(HFBertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0), add_pooling_layer=False).eval()
    cfg = BertConfig(vocab_size=99, hidden_size=32, num_layers=3,
                     num_heads=4, intermediate_size=64,
                     max_position_embeddings=64)
    params = bert_from_torch(hf.state_dict(), cfg)
    ids = rng.integers(0, 99, (2, 11)).astype(np.int32)
    mask = np.ones((2, 11), np.int32)
    mask[1, 7:] = 0
    with torch.no_grad():
        out = hf(torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask.astype(np.int64)),
                 output_hidden_states=True)
    last, hidden = bert_apply(params, jnp.asarray(ids), jnp.asarray(mask),
                              cfg)
    np.testing.assert_allclose(np.asarray(last),
                               out.last_hidden_state.numpy(), atol=2e-5)
    assert len(hidden) == len(out.hidden_states)
    np.testing.assert_allclose(np.asarray(hidden[1]),
                               out.hidden_states[1].numpy(), atol=2e-5)


def test_medclip_release_key_mapping(rng):
    """load_medclip_torch maps the released checkpoint key layout
    (vision_model.model.* / text_model.model.* / projection heads)."""
    from transformers import (
        BertConfig as HFBertConfig,
        BertModel,
        SwinConfig as HFSwinConfig,
        SwinModel,
    )

    mcfg = MedCLIPConfig.tiny()
    sv = SwinModel(HFSwinConfig(
        image_size=56, patch_size=4, embed_dim=16, depths=[1, 1],
        num_heads=[2, 4], window_size=7)).eval()
    tb = BertModel(HFBertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64), add_pooling_layer=False).eval()
    sd = {}
    for k, v in sv.state_dict().items():
        sd[f"vision_model.model.{k}"] = v
    for k, v in tb.state_dict().items():
        sd[f"text_model.model.{k}"] = v
    vd = sv.config.hidden_size
    sd["vision_model.projection_head.weight"] = torch.randn(16, vd)
    sd["text_model.projection_head.weight"] = torch.randn(16, 32)
    sd["text_model.projection_head.bias"] = torch.randn(16)
    sd["logit_scale"] = torch.tensor(2.0)

    params = load_medclip_torch(sd, mcfg)
    x = rng.uniform(0, 1, (2, 56, 56, 3)).astype(np.float32)
    emb = np.asarray(encode_image(params, jnp.asarray(x), mcfg))
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    ids = rng.integers(0, 128, (2, 9)).astype(np.int32)
    t = np.asarray(encode_text(params, jnp.asarray(ids),
                               jnp.ones((2, 9), np.int32), mcfg))
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)


@pytest.fixture
def tiny_loss(rng):
    mcfg = MedCLIPConfig.tiny()
    params = init_medclip(jax.random.PRNGKey(0), mcfg)
    return params, mcfg


def test_semantic_loss_modes(tiny_loss, rng):
    params, mcfg = tiny_loss
    sr = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    hr = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 128, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)
    key = jax.random.PRNGKey(1)

    args = dict(n_patches=3, clip_size=56)
    loss = semantic_loss(params, mcfg, sr, hr, ids, mask, key, **args)
    assert float(loss) > 0
    # identical images -> zero loss
    z = semantic_loss(params, mcfg, sr, sr, ids, mask, key, **args)
    np.testing.assert_allclose(float(z), 0.0, atol=1e-6)

    # faithful mode: no gradient flows
    g = jax.grad(lambda s: semantic_loss(params, mcfg, s, hr, ids, mask,
                                         key, faithful=True, **args))(sr)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=0)
    # fixed mode: gradient flows
    g2 = jax.grad(lambda s: semantic_loss(params, mcfg, s, hr, ids, mask,
                                          key, **args))(sr)
    assert np.abs(np.asarray(g2)).max() > 0

    # faithful text path ignores the real input ids (uses zeros)
    ids2 = jnp.asarray(rng.integers(0, 128, (2, 8)).astype(np.int32))
    f1 = semantic_loss(params, mcfg, sr, hr, ids, mask, key,
                       faithful=True, **args)
    f2 = semantic_loss(params, mcfg, sr, hr, ids2, mask, key,
                       faithful=True, **args)
    np.testing.assert_allclose(float(f1), float(f2), atol=1e-7)


def test_semantic_loss_staged_matches_monolithic(tiny_loss, rng):
    """The staged formulation (text + hr-side encoders hoisted out of the
    grad program) composes to exactly semantic_loss, values and d/d sr."""
    from m2trans_tpu.losses.semantic import (
        clip_image_sims,
        clip_text_embed,
        crop_offsets,
        semantic_loss_staged,
    )

    params, mcfg = tiny_loss
    sr = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    hr = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 128, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)
    key = jax.random.PRNGKey(7)
    kw = dict(n_patches=3, clip_size=56)

    for faithful in (False, True):
        ref = semantic_loss(params, mcfg, sr, hr, ids, mask, key,
                            faithful=faithful, **kw)

        # const stage (would be a separate fwd-only jit in production)
        ys, xs = crop_offsets(key, 2, 64, 64, kw["n_patches"] - 1,
                              kw["clip_size"])
        t = clip_text_embed(params, mcfg, ids, mask, faithful=faithful)
        sim_y = clip_image_sims(params, mcfg, hr, ys, xs, t, **kw)

        # grad stage
        fn = lambda s: semantic_loss_staged(  # noqa: E731
            params, mcfg, s, ys, xs, t, sim_y, faithful=faithful, **kw)
        np.testing.assert_allclose(float(fn(sr)), float(ref),
                                   rtol=2e-5, atol=2e-6)
        if not faithful:
            g_ref = jax.grad(lambda s: semantic_loss(
                params, mcfg, s, hr, ids, mask, key, **kw))(sr)
            g_st = jax.grad(fn)(sr)
            np.testing.assert_allclose(np.asarray(g_st),
                                       np.asarray(g_ref),
                                       rtol=1e-4, atol=1e-6)

    # small-image fallback (n_patches -> 1) stays consistent too
    sr_s = sr[:, :56, :56]
    hr_s = hr[:, :56, :56]
    ref = semantic_loss(params, mcfg, sr_s, hr_s, ids, mask, key, **kw)
    t = clip_text_embed(params, mcfg, ids, mask)
    sim_y = clip_image_sims(params, mcfg, hr_s, ys, xs, t, **kw)
    st = semantic_loss_staged(params, mcfg, sr_s, ys, xs, t, sim_y, **kw)
    np.testing.assert_allclose(float(st), float(ref), rtol=2e-5, atol=2e-6)


def test_semantic_loss_fn_tokenize_and_train_step(tiny_loss, rng, tmp_path):
    """SemanticLossFn plugs into the jitted train step end-to-end."""
    from transformers import BertTokenizerFast

    params, mcfg = tiny_loss
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "ultrasound",
         "image", "of", "carotid", "artery", "liver", "the", "a"]))
    tok = BertTokenizerFast(vocab_file=str(vocab), do_lower_case=True)
    fn = SemanticLossFn(params, mcfg, tok, n_patches=2, clip_size=56,
                        max_length=16)
    toks = fn.tokenize(["ultrasound image of carotid artery",
                        "the liver image"])
    assert toks["input_ids"].shape == (2, 16)

    from m2trans_tpu.config import Config
    from m2trans_tpu.models import init_m2trans
    from m2trans_tpu.train.loop import make_optimizer, make_train_step

    cfg = Config(scale=2, n_feats=8, n_blocks=1, lambda_clip=0.01,
                 patch_size=64)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    step = make_train_step(cfg, tx, semantic_loss_fn=fn)
    mp = init_m2trans(jax.random.PRNGKey(3), cfg)
    opt = tx.init(mp)
    lr_img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    hr_img = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    mp2, opt2, aux = step(mp, opt, lr_img, hr_img, jax.random.PRNGKey(4),
                          toks)
    assert float(aux["clip"]) > 0
    assert np.isfinite(float(aux["loss"]))

    # explicit clip_params (the Trainer's production path: a closure-
    # captured weight tree bakes into the serialized compile payload and
    # a remote AOT compile rejects the 89 MB table — HTTP 413): the same
    # step with the weights traced must produce the identical loss
    mp3 = init_m2trans(jax.random.PRNGKey(3), cfg)
    opt3 = tx.init(mp3)
    _, _, aux2 = step(mp3, opt3, lr_img, hr_img, jax.random.PRNGKey(4),
                      toks, clip_params=fn.params)
    np.testing.assert_allclose(float(aux2["clip"]), float(aux["clip"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(aux2["loss"]), float(aux["loss"]),
                               rtol=1e-6)


def test_text_pooling_variants(tiny_loss, rng):
    import dataclasses

    params, mcfg = tiny_loss
    ids = jnp.asarray(rng.integers(0, 128, (2, 9)).astype(np.int32))
    mask = jnp.ones((2, 9), jnp.int32)
    outs = {}
    for mode in ("mixed", "last4", "cls"):
        cfg_m = dataclasses.replace(mcfg, text_pooling=mode)
        t = np.asarray(encode_text(params, ids, mask, cfg_m))
        np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0,
                                   atol=1e-5)
        outs[mode] = t
    assert not np.allclose(outs["mixed"], outs["cls"])
    with pytest.raises(ValueError, match="text_pooling"):
        encode_text(params, ids, mask,
                    dataclasses.replace(mcfg, text_pooling="bogus"))


def test_text_embedding_padding_invariant(tiny_loss, rng):
    """Mask-weighted pooling (default): the embedding must not depend on
    how much static padding the batched tokenizer added (ADVICE r1; the
    reference tokenizes per caption unpadded, losses.py:64)."""
    import dataclasses

    params, mcfg = tiny_loss
    ids = rng.integers(5, 128, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    pad_ids = np.zeros((2, 16), np.int32)
    pad_ids[:, :9] = ids
    pad_mask = np.zeros((2, 16), np.int32)
    pad_mask[:, :9] = 1

    t_short = np.asarray(encode_text(params, jnp.asarray(ids),
                                     jnp.asarray(mask), mcfg))
    t_padded = np.asarray(encode_text(params, jnp.asarray(pad_ids),
                                      jnp.asarray(pad_mask), mcfg))
    np.testing.assert_allclose(t_short, t_padded, atol=2e-5)

    # medclip-package mode (padding included) does depend on padding
    cfg_pkg = dataclasses.replace(mcfg, masked_token_mean=False)
    t_pkg = np.asarray(encode_text(params, jnp.asarray(pad_ids),
                                   jnp.asarray(pad_mask), cfg_pkg))
    assert not np.allclose(t_short, t_pkg, atol=1e-3)


def test_semantic_loss_bf16_close_to_f32(rng):
    """bf16 MedCLIP compute (medclip_dtype speed mode) tracks the f32
    loss on toy sizes."""
    import jax.numpy as jnp

    from m2trans_tpu.losses.semantic import SemanticLossFn

    mcfg = MedCLIPConfig.tiny()
    params = init_medclip(jax.random.PRNGKey(3), mcfg)
    f32 = SemanticLossFn(params, mcfg, tokenizer=None, clip_size=56)
    b16 = SemanticLossFn(params, mcfg, tokenizer=None, clip_size=56,
                         dtype=jnp.bfloat16)
    assert b16.params["vision_proj"]["w"].dtype == jnp.bfloat16

    sr = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    hr = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    toks = {"input_ids": jnp.asarray(
                rng.integers(5, 99, (2, 16)), jnp.int32),
            "attention_mask": jnp.ones((2, 16), jnp.int32)}
    key = jax.random.PRNGKey(0)
    a = float(f32(sr, hr, toks, key))
    b = float(b16(sr, hr, toks, key))
    assert abs(a - b) < 0.05 * max(1.0, abs(a))
