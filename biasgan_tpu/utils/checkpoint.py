"""Orbax checkpointing of the full GANTrainState.

Capability parity-plus vs. the reference's ``save_networks``/``load_networks``
(<epoch>_net_<name>.pth state_dicts, SURVEY.md section 5 checkpoint row [K]): we
persist the ENTIRE train state — params of every net, BOTH optimizer states,
step counter, LR scale and replay-pool buffers — so resume is exact (the
reference does not checkpoint optimizer state at all).

Layout: <run_dir>/ckpt/<tag>/  where tag is 'latest', 'epoch_<N>' or
'iter_<N>' (reference tag scheme).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_path(run_dir: str, tag: str) -> str:
    return os.path.abspath(os.path.join(run_dir, "ckpt", str(tag)))


def save_state(run_dir: str, tag: str, state, meta: Optional[Dict[str, Any]] = None):
    """Save the full train-state pytree under <run_dir>/ckpt/<tag>."""
    path = _ckpt_path(run_dir, tag)
    if os.path.exists(path):  # 'latest' is overwritten every save_latest_freq
        shutil.rmtree(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)
    if meta is not None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    return path


def restore_state(run_dir: str, tag: str, abstract_state):
    """Restore into the structure of ``abstract_state`` (a concrete state of
    the right shape works; use jax.eval_shape output to avoid allocation)."""
    path = _ckpt_path(run_dir, tag)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no checkpoint at {path}")
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, abstract_state)
    return restored


def load_meta(run_dir: str, tag: str) -> Dict[str, Any]:
    path = os.path.join(_ckpt_path(run_dir, tag), "meta.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def has_checkpoint(run_dir: str, tag: str) -> bool:
    return os.path.isdir(_ckpt_path(run_dir, tag))


def abstract_like(state):
    """ShapeDtypeStruct skeleton of a state pytree (for restore)."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        state,
    )
