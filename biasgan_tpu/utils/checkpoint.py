"""Orbax checkpointing of the full GANTrainState.

Capability parity-plus vs. the reference's ``save_networks``/``load_networks``
(<epoch>_net_<name>.pth state_dicts, SURVEY.md section 5 checkpoint row [K]): we
persist the ENTIRE train state — params of every net, BOTH optimizer states,
step counter, LR scale and replay-pool buffers — so resume is exact (the
reference does not checkpoint optimizer state at all).

Saves are ASYNC (SURVEY.md section 5 failure-detection row): orbax snapshots
the device arrays and writes in a background thread while the train loop
keeps stepping; the checkpoint directory appears atomically (rename) only
when complete, so ``has_checkpoint`` / restore never see partial state. Call
``wait_for_saves()`` before process exit (train.py does).

Layout: <run_dir>/ckpt/<tag>/  where tag is 'latest', 'epoch_<N>' or
'iter_<N>' (reference tag scheme); host metadata in <tag>.meta.json.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_saves() -> None:
    """Block until all in-flight async saves are durable."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def _ckpt_path(run_dir: str, tag: str) -> str:
    return os.path.abspath(os.path.join(run_dir, "ckpt", str(tag)))


def save_state(
    run_dir: str,
    tag: str,
    state,
    meta: Optional[Dict[str, Any]] = None,
    block: bool = False,
):
    """Save the full train-state pytree under <run_dir>/ckpt/<tag>
    (async unless ``block``)."""
    path = _ckpt_path(run_dir, tag)
    ckptr = _checkpointer()
    # wait BEFORE the exists() check: an in-flight async save of this same
    # tag may not have committed (renamed) its directory yet — checking
    # first would skip the overwrite handling and orbax would raise
    # 'already exists'
    ckptr.wait_until_finished()
    if os.path.exists(path):
        # crash-safe overwrite ('latest' every save_latest_freq): rename the
        # committed checkpoint aside instead of deleting it, so a kill that
        # lands before the new save commits still leaves a restorable
        # '<tag>.old' (restore_state/has_checkpoint fall back to it)
        old = path + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
        if os.path.exists(path + ".meta.json"):  # keep meta paired with data
            os.replace(path + ".meta.json", old + ".meta.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ckptr.save(path, state)
    if meta is not None:  # tiny host-side metadata; atomic (kill-safe) write
        tmp = path + ".meta.json.tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, path + ".meta.json")
    if block:
        ckptr.wait_until_finished()
    return path


def _resolve(run_dir: str, tag: str) -> str:
    """Committed checkpoint dir for a tag; falls back to '<tag>.old' when a
    crash interrupted an overwrite (see save_state)."""
    path = _ckpt_path(run_dir, tag)
    if os.path.isdir(path):
        return path
    if os.path.isdir(path + ".old"):
        return path + ".old"
    return path


def restore_state(run_dir: str, tag: str, abstract_state):
    """Restore into the structure of ``abstract_state`` (a concrete state of
    the right shape works; use jax.eval_shape output to avoid allocation)."""
    wait_for_saves()  # the tag may still be in flight from this process
    path = _resolve(run_dir, tag)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no checkpoint at {path}")
    return _checkpointer().restore(path, abstract_state)


def restore_raw(run_dir: str, tag: str):
    """Restore a checkpoint with its SAVED structure (no caller-side
    abstract tree) — for cross-model loading, e.g. TestModel extracting
    G_A from a CycleGAN checkpoint (reference --model_suffix semantics),
    or test-phase G-only models grafting from a full training state.

    The abstract target is rebuilt from the checkpoint's own metadata with
    THIS process's sharding: without one, orbax replays the sharding file
    written at save time, which names the SAVING topology — a checkpoint
    written on a TPU mesh could not restore on a CPU host or a different
    chip count."""
    wait_for_saves()
    path = _resolve(run_dir, tag)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no checkpoint at {path}")
    ckptr = _checkpointer()
    abstract = None
    try:
        meta = ckptr.metadata(path)
        tree = meta.item_metadata  # StepMetadata -> per-leaf metadata
        tree = getattr(tree, "tree", tree)
        local = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=local)
            if getattr(m, "shape", None) is not None
            else m,
            tree,
        )
    except Exception as e:  # metadata unavailable: fall back to saved shardings
        # Loud on purpose: the fallback replays SAVE-time shardings — exactly
        # the cross-topology failure the rebuilt abstract tree exists to fix.
        # If orbax's metadata API changes shape, this warning is the only
        # signal that topology-safe restore silently degraded.
        import warnings

        warnings.warn(
            f"restore_raw: checkpoint metadata unreadable ({type(e).__name__}: "
            f"{e}); falling back to save-time shardings — restore may fail "
            "across topologies (different chip count / backend than the save)",
            RuntimeWarning,
            stacklevel=2,
        )
        abstract = None
    if abstract is not None:
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def load_meta(run_dir: str, tag: str) -> Dict[str, Any]:
    path = _resolve(run_dir, tag)  # meta rides with the resolved data dir
    for candidate in (path + ".meta.json", os.path.join(path, "meta.json")):
        if os.path.exists(candidate):
            with open(candidate) as f:
                return json.load(f)
    return {}


def has_checkpoint(run_dir: str, tag: str) -> bool:
    wait_for_saves()
    return os.path.isdir(_resolve(run_dir, tag))


def abstract_like(state):
    """ShapeDtypeStruct skeleton of a state pytree (for restore).

    Each leaf carries a concrete sharding: without one orbax falls back to
    the sharding file written at save time, which names the SAVING topology
    — a checkpoint written on the TPU could not restore on a CPU host. Use
    the LIVE state leaf's own sharding when it has one (so sharded state —
    e.g. W-sharded spatial-training pools — restores into the current
    layout, not onto one device), falling back to this process's default
    device for plain arrays."""
    local = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def shard_of(x):
        s = getattr(x, "sharding", None)
        return s if isinstance(s, jax.sharding.Sharding) else local

    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=shard_of(x))
        if hasattr(x, "shape")
        else x,
        state,
    )
