"""AOT inference export for serving: ``jax.export`` (StableHLO) artifacts.

The reference's deployment story is ``prediction.py`` driving live torch
modules (reference prediction.py:35-62, 204-224).  Ours matches that CLI,
and additionally can freeze the inference program into a self-contained
serialized artifact a serving host runs WITHOUT the model code, configs, or
checkpoint files — deserialization needs only jax.

Two program shapes:

- **window forward** (`export_window_forward`): ``(batch, *window, in_chan)
  -> fp32 softmax probs`` — the serving hot unit (one sliding-window
  position, deep-supervision head[0], softmax, exactly the per-window
  computation of ``InferenceEngine``).  The host drives the window sweep.
- **whole sliding-window volume** (`export_sliding_window`): for a fixed
  raw volume shape, the full pad -> batched window sweep -> uniform fusion
  -> unpad program of ``InferenceEngine.sliding_window`` as ONE function
  ``(1, *spatial, in_chan) -> (1, *spatial, classes)``, with the start
  table and the host-precomputed fusion denominator baked in as constants.

Exports are shape-specialized (XLA semantics; prediction pads to
training_size anyway) and can target platforms other than the exporting
host's (``platforms=("tpu",)`` from a CPU box).  Pallas fast paths are
backend-gated at trace time, so a cross-platform export lowers through the
portable XLA ops; exporting ON a TPU for TPU keeps them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .engines import make_engine


def _head0_apply(model, variables):
    def apply_fn(x):
        out = model.apply(variables, x, train=False)
        if isinstance(out, (tuple, list)):
            out = out[0]
        return out
    return apply_fn


def export_window_forward(model, variables, window_size, in_chan: int,
                          *, batch: int = 1, platforms=None) -> bytes:
    """Serialize one window forward (+softmax) at a fixed window shape."""
    apply_fn = _head0_apply(model, variables)

    def fwd(x):
        return jax.nn.softmax(apply_fn(x).astype(jnp.float32), axis=-1)

    spec = jax.ShapeDtypeStruct((batch, *window_size, in_chan), jnp.float32)
    exp = jax.export.export(jax.jit(fwd), platforms=platforms)(spec)
    return bytes(exp.serialize())


def export_whole_image(model, variables, volume_shape, in_chan: int,
                       *, platforms=None) -> bytes:
    """Serialize the whole-image engine (2D/3D) at a fixed volume shape."""
    return export_window_forward(model, variables, volume_shape, in_chan,
                                 batch=1, platforms=platforms)


def export_sliding_window(model, variables, cfg, volume_shape,
                          *, window_batch: int = 1, platforms=None) -> bytes:
    """Serialize the full sliding-window program for one raw volume shape.

    Semantics identical to ``InferenceEngine.sliding_window`` (itself
    reference inference3d.py:28-92 exact): pad up to window, edge-clamped
    half-window start grid, masked window batching, softmax-sum fusion with
    the precomputed denominator, crop back to the raw shape.
    """
    engine = make_engine(model, variables, cfg, window_batch)
    in_shape = (1, *volume_shape, in_chan := getattr(cfg, "in_chan", 1))
    probe = jnp.zeros(in_shape, jnp.float32)
    img_p, starts, valid, pads, spatial, padded_spatial = \
        engine._prepare_windows(probe)
    groups, wb = valid.shape
    sweep = engine._sw_sweep(padded_spatial, engine.window_size, wb)
    cnt = jnp.asarray(engine._count_map(padded_spatial, starts, valid))
    starts_c = jnp.asarray(starts)
    valid_c = jnp.asarray(valid)
    pad_cfg = [(0, 0)] + list(pads) + [(0, 0)]
    need_pad = any(p[1] > 0 for p in pads)

    def run(img):
        img_p = jnp.pad(img, pad_cfg) if need_pad else img
        probs = sweep(engine.variables, img_p, starts_c, valid_c) / cnt
        return engine._crop_pads(probs, pads, spatial)

    spec = jax.ShapeDtypeStruct(in_shape, jnp.float32)
    exp = jax.export.export(jax.jit(run), platforms=platforms)(spec)
    return bytes(exp.serialize())


def load_exported(data: bytes):
    """bytes -> callable.  The inverse of the exporters above; also plain
    ``jax.export.deserialize(data).call``."""
    return jax.export.deserialize(data).call
