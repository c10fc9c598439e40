#!/usr/bin/env python
"""Sliding-window inference benchmark (volumes/sec) on the real chip.

Measures the eval hot path of SURVEY §3.3 — MedFormer-AMOS, volume
160x256x256, window 128^3 (32 windows after edge clamping) — across
window_batch settings, to pick the config default.

Usage: python tools/bench_infer.py [--window-batch 1,2] [--iters 3]
Prints one JSON line per setting.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window-batch", default="1,2")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--vol", default="160,256,256")
    ap.add_argument("--window", default="128,128,128")
    ap.add_argument("--bf16", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cbim_tpu.config import config_from_dict
    from cbim_tpu.models import get_model
    from cbim_tpu.inference.engines import InferenceEngine

    vol = tuple(int(v) for v in args.vol.split(","))
    window = tuple(int(v) for v in args.window.split(","))

    cfg = config_from_dict(dict(
        dataset="synthetic", model="medformer", dimension="3d",
        classes=16, in_chan=1, base_chan=32, conv_block="BasicBlock",
        down_scale=[[2, 2, 2]] * 4, kernel_size=[[3, 3, 3]] * 5,
        norm="in", act="gelu", map_size=[4, 4, 4],
        conv_num=[2, 1, 0, 0, 0, 1, 2, 2], trans_num=[0, 1, 4, 6, 4, 1, 0, 0],
        num_heads=[1, 4, 8, 10, 8, 4, 1, 1], expansion=4, fusion_depth=2,
        fusion_dim=320, fusion_heads=5, attn_drop=0.0, proj_drop=0.0,
        proj_type="depthwise", aux_loss=False, aux_weight=[1.0],
        amp=bool(args.bf16)))
    model = get_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, *window, 1), jnp.float32),
                           train=False)

    def apply_fn(x):
        out = model.apply(variables, x, train=False)
        return out[0] if isinstance(out, (tuple, list)) else out

    img = jax.random.uniform(jax.random.PRNGKey(1), (1, *vol, 1), jnp.float32)
    img = jax.device_put(img)

    for wb in (w if w == "auto" else int(w)
               for w in args.window_batch.split(",")):
        eng = InferenceEngine(apply_fn, cfg.classes, window_size=window,
                              window_batch=wb)
        t0 = time.perf_counter()
        jax.block_until_ready(eng.sliding_window(img))   # compile + 1st run
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = eng.sliding_window(img)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "metric": "sliding_window_medformer3d_amos_vol",
            "window_batch": wb, "sec_per_volume": round(dt, 4),
            "volumes_per_sec": round(1.0 / dt, 4),
            "first_call_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
