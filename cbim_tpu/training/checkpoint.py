"""Checkpointing: {epoch, params, ema_params, opt_state} with latest/best
policy (reference train.py:104-128, utils.py:41-55).

Serialized with flax msgpack (dependency-light, pytree-exact; written by
process 0 only under multi-host).  File layout matches the
reference's naming: ``fold_<k>_latest.ckpt`` / ``fold_<k>_best.ckpt``.

Writes are asynchronous by default: the device->host snapshot is taken
synchronously (cheap), then msgpack serialization + the atomic tmp/rename
write run on a background thread so the train loop overlaps them with the
next epoch (the reference blocks on ``torch.save``).  At most one write is
in flight; any save/load joins the pending one first, so readers never see
a torn or stale file.
"""

from __future__ import annotations

import os
import threading


import jax
from flax import serialization

_pending: threading.Thread | None = None
_lock = threading.Lock()


def wait_pending() -> None:
    """Block until any in-flight checkpoint write completes."""
    global _pending
    with _lock:
        t, _pending = _pending, None
    if t is not None:
        t.join()


def _write_atomic(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(path: str, state, epoch: int,
                    async_write: bool = True) -> None:
    global _pending
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
    wait_pending()
    if not async_write:
        _write_atomic(path, serialization.to_bytes(payload))
        return
    # snapshot to host now (the arrays may be donated/overwritten by the
    # next train step); serialize + write off-thread
    snapshot = jax.device_get(payload)
    t = threading.Thread(
        target=lambda: _write_atomic(path, serialization.to_bytes(snapshot)),
        name="ckpt-writer", daemon=False)
    with _lock:
        _pending = t
    t.start()


def load_checkpoint(path: str, state, epoch: int = 0):
    """Restore into an existing state template; returns (state, start_epoch)."""
    wait_pending()
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
    wait_pending()
    template = {"epoch": 0, "step": 0, "params": params_template,
                "ema_params": params_template, "batch_stats": {},
                "ema_batch_stats": {}, "opt_state": None}
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    key = "ema_params" if prefer_ema else "params"
    return restored[key]
