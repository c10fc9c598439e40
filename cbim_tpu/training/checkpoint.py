"""Checkpointing: {epoch, params, ema_params, opt_state} with latest/best
policy (reference train.py:104-128, utils.py:41-55).

Serialized with flax msgpack (dependency-light, pytree-exact; written by
process 0 only under multi-host).  File layout matches the
reference's naming: ``fold_<k>_latest.ckpt`` / ``fold_<k>_best.ckpt``.
"""

from __future__ import annotations

import os


import jax
from flax import serialization


def save_checkpoint(path: str, state, epoch: int) -> None:
    from ..utils.logging import is_master
    if not is_master():
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "epoch": epoch,
        "step": state.step,
        "params": state.params,
        "ema_params": state.ema_params if state.ema_params is not None else {},
        "batch_stats": state.batch_stats,
        "ema_batch_stats": state.ema_batch_stats
        if state.ema_batch_stats is not None else {},
        "opt_state": state.opt_state,
    }
    data = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, state, epoch: int = 0):
    """Restore into an existing state template; returns (state, start_epoch)."""
    template = {
        "epoch": epoch,
        "step": state.step,
        "params": state.params,
        "ema_params": state.ema_params if state.ema_params is not None else {},
        "batch_stats": state.batch_stats,
        "ema_batch_stats": state.ema_batch_stats
        if state.ema_batch_stats is not None else {},
        "opt_state": state.opt_state,
    }
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    new_state = state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        opt_state=restored["opt_state"],
        batch_stats=restored["batch_stats"],
        ema_params=restored["ema_params"] if state.ema_params is not None else None,
        ema_batch_stats=restored["ema_batch_stats"]
        if state.ema_batch_stats is not None else None,
    )
    return new_state, int(restored["epoch"])


def load_params_for_eval(path: str, params_template, prefer_ema: bool = False):
    """Load just (ema_)params from a checkpoint (prediction.py:211-214)."""
    template = {"epoch": 0, "step": 0, "params": params_template,
                "ema_params": params_template, "batch_stats": {},
                "ema_batch_stats": {}, "opt_state": None}
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    key = "ema_params" if prefer_ema else "params"
    return restored[key]
