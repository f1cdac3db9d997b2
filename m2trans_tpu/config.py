"""Typed configuration matching the reference YAML surface.

The reference merges a flat YAML dict over an argparse namespace
(/root/reference/train.py:30-34); every layer then reads ``args.<key>``.
We keep the exact YAML key set (configs/M2Trans_x4.yml:1-40) but validate it
into a typed dataclass. Unknown keys are kept in ``extras`` with a warning so
user configs written for the reference keep working.
"""

from __future__ import annotations

import dataclasses
import warnings
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


@dataclass
class Config:
    """Flat config — one dataclass mirroring the reference's flat YAML."""

    # --- model (reference configs/M2Trans_x4.yml:1-8) ---
    model: str = "M2Trans"
    scale: int = 4
    rgb_range: float = 1.0
    colors: int = 3
    n_feats: int = 64
    num_heads: int = 4  # present in YAML; network hardcodes 1 per TBlock
    n_blocks: int = 8
    pretrain: Optional[str] = None

    # --- training (reference configs/M2Trans_x4.yml:11-29) ---
    patch_size: int = 384  # HR patch size
    batch_size: int = 2
    data_repeat: int = 5
    data_augment: int = 1
    data_add_noise: bool = False
    cutout: bool = False
    cutmix: bool = False
    epochs: int = 200
    lr: float = 1e-4
    eta_min: float = 1e-6
    gamma: float = 0.5  # unused by cosine schedule; kept for surface parity
    log_every: int = 200
    test_every: int = 1
    log_path: str = "./experiments"
    log_name: Optional[str] = None
    lambda_l1: float = 1.0
    lambda_clip: float = 0.01

    # --- hardware (reference configs/M2Trans_x4.yml:31-34) ---
    gpu_ids: Optional[List[int]] = None  # ignored on TPU; kept for parity
    threads: int = 8
    save_image: bool = False

    # --- data (reference configs/M2Trans_x4.yml:36-39) ---
    data_path: str = "../SR_datasets/"
    training_dataset: str = "us1k"
    eval_sets: List[str] = field(
        default_factory=lambda: ["CCA-US", "US-CASE", "US1K_23"]
    )

    # --- test-only (reference configs/M2Trans_x4_test.yml) ---
    model_path: Optional[str] = None

    # --- new, TPU-native knobs (not in the reference) ---
    seed: int = 33
    dtype: str = "float32"  # compute dtype: "float32" | "bfloat16"
    use_pallas: bool = False  # fused Pallas halo-attention kernel
    mesh_data: int = 1  # devices on the `data` mesh axis
    mesh_space: int = 1  # devices on the `space` (spatial-shard) mesh axis
    captions_path: Optional[str] = None  # text descriptions for SemanticLoss
    medclip_path: Optional[str] = None  # pretrained MedCLIP weights dir
    medclip_tiny: bool = False  # tiny MedCLIP config (smoke tests only)
    # MedCLIP encoder compute dtype for the semantic loss: "float32"
    # (default; matches the reference numerics) or "bfloat16" (speed —
    # halves the encoder HBM traffic; LN stats stay f32)
    medclip_dtype: str = "float32"
    native_loader: bool = True  # C++ runtime data loader (falls back to
    # the Python thread pool when the cache dtype is unsupported)
    profile_dir: Optional[str] = None  # jax.profiler trace of a few steps
    faithful_clip: bool = False  # bit-faithful reference SemanticLoss quirks
    # reference DataLoader uses drop_last=False (datas/utils.py:22): the
    # ragged tail batch still trains. Static shapes forbid a ragged batch
    # under jit, so this flag pads the tail to batch_size and masks the
    # loss to the valid samples — same gradients, one executable. Default
    # off (drop the tail, <1% of samples at data_repeat=5).
    faithful_tail_batch: bool = False
    # training image index range (reference hardcodes 1..1000,
    # datas/us1k.py:74-76); [start, end) like Python ranges
    train_range: tuple = (1, 1001)
    resume: Optional[str] = None
    config: Optional[str] = None  # the yaml path itself (argparse parity)

    # anything in the YAML we do not know about
    extras: Dict[str, Any] = field(default_factory=dict)

    # fixed architecture constants (reference M2Trans_network.py:23,37)
    block_size: int = 8
    halo_size: int = 1
    window_sizes: tuple = (8, 16, 32)

    @property
    def pad_multiple(self) -> int:
        """LCM of window_sizes — input H,W padded to this before the body
        (reference models/M2Trans_network.py:78-86)."""
        import math

        m = self.window_sizes[0]
        for w in self.window_sizes[1:]:
            m = m * w // math.gcd(m, w)
        return m

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_FIELD_NAMES = {f.name for f in dataclasses.fields(Config)}


def load_config(path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Load a reference-style flat YAML into a Config.

    Mirrors the reference merge order: YAML values override defaults,
    then explicit ``overrides`` (CLI flags) override YAML.
    """
    raw: Dict[str, Any] = {}
    if path is not None:
        with open(path) as f:
            raw.update(yaml.safe_load(f) or {})
        raw["config"] = path
    if overrides:
        raw.update({k: v for k, v in overrides.items() if v is not None})

    known, extras = {}, {}
    for k, v in raw.items():
        if k in _FIELD_NAMES:
            known[k] = v
        else:
            extras[k] = v
    if extras:
        warnings.warn(f"config: unknown keys kept in extras: {sorted(extras)}")
    cfg = Config(**known, extras=extras) if "extras" not in known else Config(**known)

    if cfg.scale not in (2, 3, 4):
        raise ValueError(f"scale must be 2, 3 or 4, got {cfg.scale}")
    if cfg.n_feats % 4 != 0:
        raise ValueError("n_feats must be divisible by 4 (channel chunking)")
    if cfg.dtype not in ("float32", "bfloat16"):
        raise ValueError(f"unsupported dtype {cfg.dtype}")
    return cfg


def save_config(cfg: Config, path: str) -> None:
    """Dump the config back to YAML (experiment snapshot parity:
    reference train.py:129-132)."""
    d = dataclasses.asdict(cfg)
    extras = d.pop("extras", {})
    d.update(extras)
    d = {k: (list(v) if isinstance(v, tuple) else v) for k, v in d.items()}
    with open(path, "w") as f:
        yaml.dump(d, f, default_flow_style=False)
