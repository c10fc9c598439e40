#!/usr/bin/env python
"""Export a trained model as a self-contained serving artifact (StableHLO).

Freezes the inference program with ``jax.export`` so a serving host can run
it with jax alone — no model code, config YAMLs, or checkpoint files.
The reference has no analogue (its deployment path, prediction.py:204-224,
re-instantiates live torch modules per process).

    python tools/export_model.py --dataset acdc --model medformer \
        --dimension 3d --load exp/acdc/run/fold_0_best.ckpt \
        --out medformer_acdc.jaxexp [--volume_shape 16,256,256] \
        [--window_batch 1] [--platforms tpu] [--platform cpu]

With --volume_shape the artifact is the FULL sliding-window program for
that raw volume shape (pad -> masked batched sweep -> uniform fusion ->
unpad); without it, the artifact is one window forward (+softmax) at
training size and the serving host drives the sweep.

Run the artifact:

    import jax
    probs = jax.export.deserialize(open(p, 'rb').read()).call(img)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_parser():
    p = argparse.ArgumentParser(description="CBIM-TPU model export")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--dimension", type=str, default="3d")
    p.add_argument("--load", type=str, required=True,
                   help="checkpoint (.ckpt or reference .pth)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--volume_shape", type=str, default=None,
                   help="comma-separated raw volume shape; exports the full "
                        "sliding-window program for it")
    p.add_argument("--window_batch", type=int, default=1)
    p.add_argument("--batch", type=int, default=1,
                   help="window-forward batch dim (no --volume_shape)")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated lowering targets, e.g. tpu or "
                        "tpu,cpu (default: the exporting backend)")
    p.add_argument("--config_root", type=str, default=None)
    p.add_argument("--platform", type=str, default=None,
                   help="backend to trace/export on (e.g. cpu)")
    return p.parse_args()


def main():
    args = get_parser()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from cbim_tpu.config import load_config
    from cbim_tpu.inference.export import (export_sliding_window,
                                           export_window_forward)
    from cbim_tpu.models import get_model
    from cbim_tpu.training.checkpoint import load_params_for_eval

    cfg = load_config(args.dataset, args.model, args.dimension,
                      config_root=args.config_root)
    cfg.sliding_window = True
    cfg.window_size = cfg.training_size
    nd = 3 if cfg.dimension == "3d" else 2

    model = get_model(cfg)
    sample = jnp.zeros((1, *cfg.training_size[:nd], cfg.in_chan), jnp.float32)
    init_vars = jax.jit(lambda r: model.init({"params": r}, sample,
                                             train=False))(jax.random.PRNGKey(0))

    if args.load.endswith(".pth"):
        from cbim_tpu.utils.torch_import import (import_for_model,
                                                 load_torch_state_dict)
        variables = import_for_model(cfg, load_torch_state_dict(args.load),
                                     dict(init_vars))
    else:
        params = load_params_for_eval(args.load, init_vars["params"],
                                      prefer_ema=cfg.ema)
        variables = {"params": params}
        if "batch_stats" in init_vars:
            variables["batch_stats"] = init_vars["batch_stats"]

    platforms = args.platforms.split(",") if args.platforms else None
    if args.volume_shape:
        shape = tuple(int(s) for s in args.volume_shape.split(","))
        assert len(shape) == nd, (shape, nd)
        data = export_sliding_window(model, variables, cfg, shape,
                                     window_batch=args.window_batch,
                                     platforms=platforms)
        kind = f"sliding-window {shape}"
    else:
        data = export_window_forward(model, variables,
                                     tuple(cfg.window_size[:nd]),
                                     cfg.in_chan, batch=args.batch,
                                     platforms=platforms)
        kind = f"window-forward {tuple(cfg.window_size[:nd])} x{args.batch}"

    with open(args.out, "wb") as f:
        f.write(data)
    print(f"exported {kind} -> {args.out} ({len(data)} bytes, "
          f"platforms={platforms or 'ambient'})")


if __name__ == "__main__":
    main()
