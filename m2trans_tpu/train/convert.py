"""PyTorch <-> JAX checkpoint conversion for M2Trans.

The reference saves monolithic ``torch.save`` dicts with a
``model_state_dict`` whose keys carry the ``module.`` DataParallel prefix
(reference train.py:342-349, test.py:64-70). Released inference checkpoints
are ``checkpoints/model_x{2,3,4}.pt``. This module maps those state dicts to
our NHWC/HWIO param pytree and back.

Layout rules:
  * conv weight OIHW -> HWIO (transpose 2,3,1,0);
  * qkv 1x1 conv (3C, C, 1, 1) -> (1, 1, C, 3C); torch chunk(qkv, 3, dim=1)
    order (q|k|v rows) is preserved by jnp.split on the output-channel axis;
  * rel_h (1, win, 1, c/2) / rel_w (1, 1, win, c/2) -> (win, c/2);
  * the dead sub_mean/add_mean MeanShift convs are carried through so a
    round-trip reproduces every reference key (SURVEY.md §5 checkpoint note);
  * scale-transfer: like the reference's tolerant load_state_dict
    (models/M2Trans_network.py:88-112), ``load tail=False`` lets an x2
    backbone seed an x4 model.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from m2trans_tpu.config import Config

Params = Dict[str, Any]


def _strip_module(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _conv_w(t) -> np.ndarray:
    return np.ascontiguousarray(_to_np(t).transpose(2, 3, 1, 0))


def torch_state_dict_to_params(
    sd: Dict[str, Any], cfg: Config, *, load_tail: bool = True
) -> Params:
    """Reference state_dict -> our param pytree. Raises KeyError on missing
    non-tail keys (strict, like test.py:70)."""
    sd = _strip_module(sd)

    def get(k):
        return sd[k]

    params: Params = {}
    for ms in ("sub_mean", "add_mean"):
        params[ms] = {"w": _conv_w(get(f"{ms}.weight")),
                      "b": _to_np(get(f"{ms}.bias"))}
    params["head"] = {"w": _conv_w(get("head.weight")),
                      "b": _to_np(get("head.bias"))}

    body = []
    i = 0
    while f"body.{i}.feed_forward.0.weight" in sd:
        blk: Params = {}
        for a in ("attn1", "attn2", "attn3", "attn4"):
            rel_h = _to_np(get(f"body.{i}.{a}.rel_h"))  # (1, win, 1, c/2)
            rel_w = _to_np(get(f"body.{i}.{a}.rel_w"))  # (1, 1, win, c/2)
            blk[a] = {
                "qkv_w": _conv_w(get(f"body.{i}.{a}.qkv_conv.weight")),
                "rel_h": rel_h.reshape(rel_h.shape[1], rel_h.shape[3]),
                "rel_w": rel_w.reshape(rel_w.shape[2], rel_w.shape[3]),
            }
        blk["ff"] = {"w": _conv_w(get(f"body.{i}.feed_forward.0.weight")),
                     "b": _to_np(get(f"body.{i}.feed_forward.0.bias"))}
        body.append(blk)
        i += 1
    if i != cfg.n_blocks:
        raise KeyError(f"checkpoint has {i} body blocks, config wants "
                       f"{cfg.n_blocks}")
    params["body"] = body

    if load_tail:
        if cfg.scale == 4:
            params["tail"] = {
                "c0": {"w": _conv_w(get("tail.0.weight")),
                       "b": _to_np(get("tail.0.bias"))},
                "c1": {"w": _conv_w(get("tail.3.weight")),
                       "b": _to_np(get("tail.3.bias"))},
                "c2": {"w": _conv_w(get("tail.6.weight"))},
            }
        else:
            params["tail"] = {
                "c0": {"w": _conv_w(get("tail.0.weight")),
                       "b": _to_np(get("tail.0.bias"))},
                "c1": {"w": _conv_w(get("tail.3.weight"))},
            }
    return params


def params_to_torch_state_dict(params: Params, cfg: Config,
                               module_prefix: bool = True) -> Dict[str, Any]:
    """Our param pytree -> reference-keyed numpy state dict (for users going
    back to the PyTorch reference, and for round-trip tests)."""

    def conv_w(w):
        return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))

    sd: Dict[str, Any] = {}
    for ms in ("sub_mean", "add_mean"):
        sd[f"{ms}.weight"] = conv_w(params[ms]["w"])
        sd[f"{ms}.bias"] = np.asarray(params[ms]["b"])
    sd["head.weight"] = conv_w(params["head"]["w"])
    sd["head.bias"] = np.asarray(params["head"]["b"])
    for i, blk in enumerate(params["body"]):
        for a in ("attn1", "attn2", "attn3", "attn4"):
            win, c2 = np.asarray(blk[a]["rel_h"]).shape
            sd[f"body.{i}.{a}.qkv_conv.weight"] = conv_w(blk[a]["qkv_w"])
            sd[f"body.{i}.{a}.rel_h"] = np.asarray(
                blk[a]["rel_h"]).reshape(1, win, 1, c2)
            sd[f"body.{i}.{a}.rel_w"] = np.asarray(
                blk[a]["rel_w"]).reshape(1, 1, win, c2)
        sd[f"body.{i}.feed_forward.0.weight"] = conv_w(blk["ff"]["w"])
        sd[f"body.{i}.feed_forward.0.bias"] = np.asarray(blk["ff"]["b"])
    t = params["tail"]
    if cfg.scale == 4:
        sd["tail.0.weight"] = conv_w(t["c0"]["w"])
        sd["tail.0.bias"] = np.asarray(t["c0"]["b"])
        sd["tail.3.weight"] = conv_w(t["c1"]["w"])
        sd["tail.3.bias"] = np.asarray(t["c1"]["b"])
        sd["tail.6.weight"] = conv_w(t["c2"]["w"])
    else:
        sd["tail.0.weight"] = conv_w(t["c0"]["w"])
        sd["tail.0.bias"] = np.asarray(t["c0"]["b"])
        sd["tail.3.weight"] = conv_w(t["c1"]["w"])
    if module_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd


def load_torch_checkpoint(path: str, cfg: Config, *,
                          load_tail: bool = True) -> Params:
    """Load a reference ``.pt`` checkpoint file into a param pytree.

    Accepts both the full training dict ({'model_state_dict': ...}) and a
    bare state dict.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return torch_state_dict_to_params(sd, cfg, load_tail=load_tail)
