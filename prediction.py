#!/usr/bin/env python
"""Prediction / deployment CLI (reference prediction.py).

Pipeline per image: read NIfTI -> resample to target spacing (cubic spline)
-> dataset-consistent normalization -> pad to training size -> ensemble of
checkpoints, each sliding-window softmax, summed -> argmax -> unpad ->
nearest-resample back to the original grid -> write NIfTI.

Usage:
    python prediction.py --dataset acdc --model medformer --dimension 3d \
        --load ckpt1.ckpt,ckpt2.ckpt --img_path in_dir --save_path out_dir \
        --target_spacing 1.5625,1.5625,5.0

``--normalize`` selects the training normalization (defaults to --dataset);
the reference requires hand-editing prediction.py:163-171 instead.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_spacing_list(string):
    return tuple(float(s) for s in string.split(","))


def parse_model_list(string):
    return string.split(",")


def get_parser():
    parser = argparse.ArgumentParser(description="CBIM-TPU prediction")
    parser.add_argument("--dataset", type=str, default="kits")
    parser.add_argument("--model", type=str, default="unet")
    parser.add_argument("--dimension", type=str, default="3d")
    parser.add_argument("--load", type=parse_model_list, default=False,
                        help="comma-separated checkpoints for ensembling")
    parser.add_argument("--img_path", type=str, required=True)
    parser.add_argument("--save_path", type=str, default="./result/")
    parser.add_argument("--target_spacing", type=parse_spacing_list,
                        default="1.0,1.0,1.0",
                        help="training spacing, x,y,z order (2d: x,y)")
    parser.add_argument("--normalize", type=str, default=None,
                        help="normalization preset (defaults to --dataset)")
    parser.add_argument("--config_root", type=str, default=None)
    parser.add_argument("--window_batch", default="auto",
                    help="windows per forward: an int, or 'auto' (default) = "
                         "largest wb <= 6 dividing the per-shape window count "
                         "(v5e measured: 6 is +16%% over 2 at the AMOS shape)")
    parser.add_argument("--platform", type=str, default=None)
    return parser.parse_args()


NORMALIZERS = {
    # exact training constants (SURVEY §2.2; cbim_tpu/data/datasets.py)
    "acdc": lambda x: _percentile_norm(x),
    "lits": lambda x: (np.clip(x, -17, 201) - 99.40) / 39.39,
    "kits": lambda x: (np.clip(x, -79, 304) - 100.93) / 76.90,
    "bcv": lambda x: (np.clip(x, -958, 327) - 82.92) / 136.97,
    "amos_ct": lambda x: (np.clip(x, -991, 362) - 50.0) / 141.0,
    "amos_mr": lambda x: _mr_norm(x),
    "synthetic": lambda x: x,
}


def _percentile_norm(x):
    m = np.percentile(x, 98)
    return np.clip(x, 0, m) / m


def _mr_norm(x):
    p2, p98 = np.percentile(x, 2), np.percentile(x, 98)
    x = np.clip(x, p2, p98)
    return (x - x.mean()) / x.std()


def pad_to_training_size(np_img, cfg):
    """reference prediction.py:65-122 (records unpad indices)."""
    ts = cfg.training_size
    if cfg.dimension == "3d":
        axes = [0, 1, 2]
    else:
        axes = [1, 2]
    idx = []
    pads = [(0, 0)] * 3
    for i, ax in enumerate(axes):
        size = np_img.shape[ax]
        if size < ts[i]:
            diff = (ts[i] + 2 - size) // 2
            pads[ax] = (diff, diff)
            idx += [diff, diff + size]
        else:
            idx += [0, size]
    if any(p != (0, 0) for p in pads):
        np_img = np.pad(np_img, pads)
    return np_img, idx


def unpad(np_pred, idx, cfg):
    if cfg.dimension == "3d":
        z0, z1, y0, y1, x0, x1 = idx
        return np_pred[z0:z1, y0:y1, x0:x1]
    y0, y1, x0, x1 = idx
    return np_pred[:, y0:y1, x0:x1]


def main():
    args = get_parser()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from cbim_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from cbim_tpu.config import load_config
    from cbim_tpu.data.conversion.utils import (resample_label_to_shape,
                                                resample_to_spacing)
    from cbim_tpu.data.nifti import read_nifti, write_nifti
    from cbim_tpu.inference.engines import InferenceEngine
    from cbim_tpu.models import get_model
    from cbim_tpu.training.checkpoint import load_params_for_eval

    cfg = load_config(args.dataset, args.model, args.dimension,
                      config_root=args.config_root)
    # force sliding window at training size (prediction.py:269-270)
    cfg.sliding_window = True
    cfg.window_size = cfg.training_size

    normalize = NORMALIZERS[args.normalize or args.dataset]

    model = get_model(cfg)
    sample = jnp.zeros((1, *cfg.training_size[:3 if cfg.dimension == "3d" else 2],
                        cfg.in_chan), jnp.float32)
    init_vars = jax.jit(lambda r: model.init({"params": r}, sample,
                                             train=False))(jax.random.PRNGKey(0))

    engines = []
    for ckpt in (args.load or []):
        if ckpt.endswith(".pth"):
            # a PyTorch-reference checkpoint: transplant it
            from cbim_tpu.utils.torch_import import (import_for_model,
                                                     load_torch_state_dict)
            variables = import_for_model(cfg, load_torch_state_dict(ckpt),
                                         dict(init_vars))
        else:
            params = load_params_for_eval(ckpt, init_vars["params"],
                                          prefer_ema=cfg.ema)
            variables = {"params": params}
            if "batch_stats" in init_vars:
                variables["batch_stats"] = init_vars["batch_stats"]

        def apply_fn(v, x):
            out = model.apply(v, x, train=False)
            if isinstance(out, (tuple, list)):
                out = out[0]
            return out

        # variables are traced arguments, so ensemble members with the same
        # architecture share ONE compiled program (engines after the first
        # reuse the persistent compile cache entry)
        engines.append(InferenceEngine(apply_fn, cfg.classes,
                                       window_size=cfg.window_size,
                                       window_batch=args.window_batch,
                                       variables=variables))
        print(f"Model loaded from {ckpt}")

    os.makedirs(args.save_path, exist_ok=True)
    target_spacing_zyx = tuple(reversed(args.target_spacing))

    for img_name in sorted(os.listdir(args.img_path)):
        if not (img_name.endswith(".nii") or img_name.endswith(".nii.gz")):
            continue
        nii = read_nifti(os.path.join(args.img_path, img_name))
        orig_shape = nii.data.shape
        data = nii.data.astype(np.float32)

        if cfg.dimension == "3d":
            tspc = target_spacing_zyx
        else:
            tspc = (nii.spacing[0],) + tuple(reversed(args.target_spacing))[-2:]
        if tuple(np.round(nii.spacing, 5)) != tuple(np.round(tspc, 5)):
            data = resample_to_spacing(data, nii.spacing, tspc, order=3)

        data = normalize(data)
        data, idx = pad_to_training_size(data, cfg)

        # ensemble softmax sum (prediction.py:35-62)
        if cfg.dimension == "2d":
            # slice-batch sliding window (reference forces sliding_window at
            # training size for prediction, prediction.py:269-270; 2D sweep
            # semantics per inference2d.py:27-71)
            inputs = jnp.asarray(data, jnp.float32)[..., None]
            prob_sum = sum(np.asarray(e.sliding_window_slices(inputs))
                           for e in engines)
        else:
            inputs = jnp.asarray(data, jnp.float32)[None, ..., None]
            prob_sum = sum(np.asarray(e.sliding_window(inputs))[0]
                           for e in engines)
        pred = prob_sum.argmax(-1).astype(np.uint8)

        pred = unpad(pred, idx, cfg)
        if pred.shape != orig_shape:
            pred = resample_label_to_shape(pred, orig_shape)

        out_path = os.path.join(args.save_path, img_name)
        write_nifti(out_path, pred.astype(np.uint8), spacing=nii.spacing,
                    affine=nii.affine)
        print(img_name, "done")


if __name__ == "__main__":
    main()
