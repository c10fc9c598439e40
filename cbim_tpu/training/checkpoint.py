"""Checkpointing: {epoch, params, ema_params, opt_state} with latest/best
policy (reference train.py:104-128, utils.py:41-55).

Two backends behind one API:

- ``msgpack`` (default): flax msgpack file, dependency-light, pytree-exact;
  written by process 0 only (correct while params are replicated, which is
  the case for this framework's dp/sp meshes).  File layout matches the
  reference's naming: ``fold_<k>_latest.ckpt`` / ``fold_<k>_best.ckpt``.
- ``orbax`` (``ckpt_backend: orbax``): an orbax directory per checkpoint at
  ``<path>.orbax``.  Every process participates (orbax coordinates the
  multi-host write), shards are written by their owners — the right backend
  once params/opt state are sharded across hosts rather than replicated.
  Saves are async via orbax's own background machinery.

Msgpack writes are also asynchronous by default: the device->host snapshot
is taken synchronously (cheap), then serialization + the atomic tmp/rename
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
    """Block until any in-flight checkpoint write completes (both backends)."""
    global _pending
    with _lock:
        t, _pending = _pending, None
    if t is not None:
        t.join()
    if _orbax_ckptr is not None:
        _orbax_ckptr.wait_until_finished()


def _write_atomic(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# orbax backend
# ---------------------------------------------------------------------------

_orbax_ckptr = None


def _get_orbax():
    """One StandardCheckpointer per process (it owns async write threads)."""
    global _orbax_ckptr
    if _orbax_ckptr is None:
        import logging as _logging

        import orbax.checkpoint as ocp
        # orbax narrates every async save at INFO through the root logger;
        # keep the reference-style epoch log readable
        for name in ("orbax", "absl", "orbax.checkpoint"):
            _logging.getLogger(name).setLevel(_logging.WARNING)
        _orbax_ckptr = ocp.StandardCheckpointer()
    return _orbax_ckptr


def _orbax_dir(path: str) -> str:
    """Checkpoint directory for a ``fold_k_latest.ckpt``-style path."""
    return os.path.abspath(path) + ".orbax"


def _save_orbax(path: str, payload) -> None:
    import numpy as np
    ckptr = _get_orbax()
    # scalars -> arrays (orbax round-trips arrays; python ints land as
    # restored scalars otherwise-typed)
    payload = dict(payload, epoch=np.asarray(payload["epoch"], np.int32))
    ckptr.save(_orbax_dir(path), payload, force=True)


def _restore_orbax(path: str, template, strict: bool = True):
    ckptr = _get_orbax()
    return ckptr.restore(_orbax_dir(path), template, strict=strict)


def save_checkpoint(path: str, state, epoch: int,
                    async_write: bool = True, backend: str = "msgpack") -> None:
    global _pending
    from ..utils.logging import is_master
    if backend != "orbax" and not is_master():
        return  # orbax saves are collective: every process participates
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
    if backend == "orbax":
        _save_orbax(path, payload)  # async via orbax's own writer
        return
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
    if os.path.isdir(_orbax_dir(path)):
        restored = _restore_orbax(path, template)
    else:
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
    key = "ema_params" if prefer_ema else "params"
    if os.path.isdir(_orbax_dir(path)):
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                _orbax_dir(path),
                args=ocp.args.PyTreeRestore(item={key: params_template},
                                            partial_restore=True))
        return restored[key]
    template = {"epoch": 0, "step": 0, "params": params_template,
                "ema_params": params_template, "batch_stats": {},
                "ema_batch_stats": {}, "opt_state": None}
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return restored[key]
