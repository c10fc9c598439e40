#!/usr/bin/env python
"""Decompose sliding-window inference cost on the real chip.

Measures, for the AMOS-scale eval setup (MedFormer-3D 16 classes, 128^3
window, volume 160x256x256 = 32 windows):
  1. forward-only per window batch (the compute floor), batch 1/2/4;
  2. the full engine sweep at each window_batch;
so the extract/softmax/scatter overhead = (2) - 32/wb * (1).

Usage: python tools/probe_infer_fwd.py [--batches 1,2,4] [--iters 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import numpy as np
    # block_until_ready does not reliably sync on the tunneled backend;
    # force a tiny readback (ROUND1_NOTES.md)
    np.asarray(jax_tree_leaf(x))


def jax_tree_leaf(x):
    import jax
    return jax.tree_util.tree_leaves(x)[0].ravel()[:1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--sweep", default="1,2,4", help="window_batch values for the full sweep ('' to skip)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cbim_tpu.config import config_from_dict
    from cbim_tpu.models import get_model
    from cbim_tpu.inference.engines import InferenceEngine

    window = (128, 128, 128)
    vol = (160, 256, 256)
    cfg = config_from_dict(dict(
        dataset="synthetic", model="medformer", dimension="3d",
        classes=16, in_chan=1, base_chan=32, conv_block="BasicBlock",
        down_scale=[[2, 2, 2]] * 4, kernel_size=[[3, 3, 3]] * 5,
        norm="in", act="gelu", map_size=[4, 4, 4],
        conv_num=[2, 1, 0, 0, 0, 1, 2, 2], trans_num=[0, 1, 4, 6, 4, 1, 0, 0],
        num_heads=[1, 4, 8, 10, 8, 4, 1, 1], expansion=4, fusion_depth=2,
        fusion_dim=320, fusion_heads=5, attn_drop=0.0, proj_drop=0.0,
        proj_type="depthwise", aux_loss=False, aux_weight=[1.0], amp=True))
    model = get_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, *window, 1), jnp.float32), train=False)

    def apply_fn(x):
        out = model.apply(variables, x, train=False)
        return out[0] if isinstance(out, (tuple, list)) else out

    # 1. forward-only floor
    for b in (int(x) for x in args.batches.split(",") if x):
        f = jax.jit(lambda x: jax.nn.softmax(
            apply_fn(x).astype(jnp.float32), axis=-1))
        x = jnp.zeros((b, *window, 1), jnp.float32)
        _sync(f(x))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = f(x)
        _sync(y)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"fwd+softmax batch={b}: {dt*1e3:8.1f} ms  "
              f"({dt/b*1e3:.1f} ms/window; 32 windows => {dt/b*32:.2f} s/vol)",
              flush=True)

    # 2. full sweep
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, *vol, 1), jnp.float32)
    img = jax.device_put(img)
    for wb in (int(x) for x in args.sweep.split(",") if x):
        eng = InferenceEngine(apply_fn, cfg.classes, window_size=window,
                              window_batch=wb)
        _sync(eng.sliding_window(img))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = eng.sliding_window(img)
        _sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"sweep wb={wb}: {dt:8.3f} s/vol  ({1/dt:.3f} vols/s)", flush=True)


if __name__ == "__main__":
    main()
