"""Checkpoint save/restore: orbax-native + reference-.pt interop.

Replaces the reference's monolithic ``torch.save`` dicts
(train.py:342-349) with orbax async checkpoints holding the full train
state {params, opt_state, epoch, stat_dict}; ``--resume`` restores the
latest step like the reference's glob-by-epoch logic (train.py:92-108).
Reference ``.pt`` files load through the converter for eval/pretrain parity.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from m2trans_tpu.config import Config
from m2trans_tpu.train.convert import load_torch_checkpoint


def make_manager(models_path: str, max_to_keep: Optional[int] = None
                 ) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, enable_async_checkpointing=True)
    return ocp.CheckpointManager(os.path.abspath(models_path), options=options)


def save_state(mgr: ocp.CheckpointManager, epoch: int, state: Dict[str, Any],
               stat_dict: Dict) -> None:
    mgr.save(
        epoch,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            stat_dict=ocp.args.JsonSave(stat_dict),
        ),
    )


def restore_latest(mgr: ocp.CheckpointManager,
                   abstract_state: Dict[str, Any]):
    """Returns (epoch, state, stat_dict) or None if no checkpoint exists."""
    step = mgr.latest_step()
    if step is None:
        return None
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract_state),
            stat_dict=ocp.args.JsonRestore(),
        ),
    )
    return step, restored["state"], restored["stat_dict"]


def load_params_any(path: str, cfg: Config):
    """Load model params from either a reference ``.pt`` or an orbax dir.

    ``.pt`` -> converter. Directories: accepts a raw StandardSave dir, a
    CheckpointManager step dir (``<models>/<epoch>`` containing ``state/``),
    or the manager root itself (``<exp>/models`` — picks the latest epoch,
    like the reference's glob-by-epoch resume, train.py:92-108).
    """
    if path is None:
        raise ValueError("model_path is not set")
    if path.endswith(".pt"):
        params = load_torch_checkpoint(path, cfg)
        return jax.tree_util.tree_map(
            lambda x: jax.numpy.asarray(np.asarray(x)), params)
    p = os.path.abspath(path)
    if os.path.isdir(os.path.join(p, "state")):  # manager step dir
        p = os.path.join(p, "state")
    elif os.path.isdir(p):  # manager root: newest epoch that has a state
        steps = [int(d) for d in os.listdir(p) if d.isdigit()
                 and os.path.isdir(os.path.join(p, d, "state"))]
        if steps:
            p = os.path.join(p, str(max(steps)), "state")
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(p)
    if isinstance(restored, dict) and "params" in restored:
        return restored["params"]
    return restored


def save_params(path: str, params) -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()
