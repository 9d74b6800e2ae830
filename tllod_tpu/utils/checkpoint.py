"""Checkpoint save/restore (orbax), with detector-subset restore.

Replaces ``save_checkpoint`` (``lib/model/utils/net_utils.py:69-70``) +
``torch.load`` resume (``methods/DAF/DAF_train.py:327-339``). Keeps the
reference's key capability: evaluation loads a *DA-method* checkpoint into the
*vanilla* detector by dropping method-only parameters (the filtered
state_dict load at ``methods/DAF/DAF_test.py:194``) — here a simple subtree
selection, because method params live in disjoint sibling subtrees of
``params`` (e.g. ``detector/...`` vs ``img_da/...``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, *, params: Any, opt_state: Any = None,
                    step: int = 0, epoch: int = 0, session: int = 1,
                    meta: Optional[Dict[str, Any]] = None) -> None:
    """Write a checkpoint directory at ``path`` (overwrites).

    ``opt_state`` (an optax chain pytree of namedtuples) is stored as a flax
    state dict — pure nested dicts — so orbax round-trips it losslessly and
    :func:`resume_train_state` can map it back onto a live optimizer state.
    """
    path = os.path.abspath(path)
    payload = {"params": _to_host(params), "step": step, "epoch": epoch,
               "session": session}
    if opt_state is not None:
        payload["opt_state"] = _to_host(serialization.to_state_dict(opt_state))
    if meta:
        payload["meta"] = meta
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def load_checkpoint(path: str) -> Dict[str, Any]:
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def resume_train_state(state, path: str):
    """Restore a full ``TrainState`` — params, optimizer state (momentum
    buffers + LR-schedule count) and step — from a checkpoint directory.

    This is the complete resume the reference does at
    ``methods/DAF/DAF_train.py:327-339`` (``load_state_dict`` on model AND
    optimizer, plus ``lr``/``start_epoch``): after resume the momentum and
    LR-decay trajectory continue exactly as in an uninterrupted run.

    Returns ``(state, epoch, step)`` where ``epoch`` is the checkpoint's
    epoch (resume training at ``epoch + 1``).
    """
    restored = load_checkpoint(path)
    params = serialization.from_state_dict(state.params, restored["params"])
    state = state._replace(params=params)
    if restored.get("opt_state") is not None:
        state = state._replace(opt_state=serialization.from_state_dict(
            state.opt_state, restored["opt_state"]))
    step = int(np.asarray(restored.get("step", 0)))
    state = state._replace(step=jnp.asarray(step, jnp.int32))
    return state, int(np.asarray(restored.get("epoch", 0))), step


def detector_params(params: Dict[str, Any],
                    detector_key: str = "detector") -> Dict[str, Any]:
    """Select the detector subtree from a DA-method param tree; if the tree
    is already a bare detector, return it unchanged."""
    if detector_key in params:
        return params[detector_key]
    return params


def restore_into(template: Any, restored: Any) -> Any:
    """Match ``restored`` leaves (by path) onto ``template``'s structure,
    shape-checked — the guard the reference gets from ``load_state_dict``.
    Extra leaves in ``restored`` are dropped (that's how DA-only params fall
    away at eval); missing or shape-mismatched leaves raise."""
    r_by_path = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_flatten_with_path(restored)[0]}
    t_flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, t_leaf in t_flat:
        key = jax.tree_util.keystr(path)
        if key not in r_by_path:
            raise KeyError(f"checkpoint missing parameter {key}")
        r_leaf = r_by_path[key]
        if np.shape(r_leaf) != np.shape(t_leaf):
            raise ValueError(f"shape mismatch for {key}: "
                             f"{np.shape(r_leaf)} vs {np.shape(t_leaf)}")
        leaves.append(r_leaf)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)
