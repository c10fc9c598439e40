#!/usr/bin/env python
"""Training CLI — the equivalent of reference train.py AND train_ddp.py.

There is deliberately ONE entry point: on a single chip it trains
single-device; on a multi-device host or TPU pod slice the same program
data-parallelizes over a jax.sharding.Mesh (GSPMD) — the TPU-native
replacement for the reference's mp.spawn + NCCL DDP launcher.

Usage (same flags as the reference):
    python train.py --model medformer --dimension 3d --dataset acdc \
        --batch_size 3 --unique_name medformer_acdc
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import sys

import numpy as np


def get_parser():
    parser = argparse.ArgumentParser(description="CBIM-TPU Medical Image Segmentation")
    parser.add_argument("--dataset", type=str, default="acdc", help="dataset name")
    parser.add_argument("--model", type=str, default="unet", help="model name")
    parser.add_argument("--dimension", type=str, default="2d", help="2d model or 3d model")
    parser.add_argument("--pretrain", action="store_true",
                        help="initialize from a pretrained checkpoint "
                             "(requires --init_model or config init_model)")
    parser.add_argument("--init_model", type=str, default=None,
                        help="pretrained checkpoint: a reference .pth, or the "
                             "official R50+ViT-B_16 .npz / swin-tiny .pth "
                             "backbones (torch->flax transplant)")
    parser.add_argument("--amp", action="store_true",
                        help="bf16 compute (TPU mixed precision; no GradScaler needed)")
    parser.add_argument("--batch_size", default=32, type=int, help="batch size")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--load", type=str, default=False, help="checkpoint to load")
    parser.add_argument("--cp_path", type=str, default="./exp/")
    parser.add_argument("--log_path", type=str, default="./log/")
    parser.add_argument("--unique_name", type=str, default="test")
    parser.add_argument("--config_root", type=str, default=None,
                        help="override the configs/ directory")
    parser.add_argument("--epochs", type=int, default=None,
                        help="override config epochs (smoke runs)")
    parser.add_argument("--folds", type=int, default=None,
                        help="train only the first N folds")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu)")
    return parser.parse_args()


def main():
    args = get_parser()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    from cbim_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from cbim_tpu.config import load_config, save_configure
    from cbim_tpu.parallel.mesh import initialize_distributed, make_mesh
    from cbim_tpu.training.trainer import train_net, write_cross_validation
    from cbim_tpu.utils.logging import configure_logger

    overrides = dict(
        pretrain=args.pretrain, amp=args.amp, batch_size=args.batch_size,
        resume=args.resume, load=args.load, cp_path=args.cp_path,
        log_path=args.log_path, unique_name=args.unique_name)
    cfg = load_config(args.dataset, args.model, args.dimension,
                      config_root=args.config_root, **overrides)
    if args.epochs is not None:
        cfg.epochs = args.epochs
    if args.init_model is not None:
        cfg.init_model = args.init_model
    if cfg.pretrain and not cfg.get("init_model"):
        logging.warning("--pretrain set but no --init_model/config init_model "
                        "checkpoint given; training from scratch")

    if cfg.reproduce_seed is not None:
        random.seed(cfg.reproduce_seed)
        np.random.seed(cfg.reproduce_seed)

    initialize_distributed(cfg)
    mesh = make_mesh(cfg) if len(jax.devices()) > 1 else None
    if mesh is not None:
        logging.info("Device mesh: %s", mesh)

    n_folds = args.folds if args.folds is not None else cfg.k_fold
    dice_list, hd_list, asd_list = [], [], []
    for fold_idx in range(n_folds):
        cp_dir = os.path.join(cfg.cp_path, cfg.dataset, cfg.unique_name)
        os.makedirs(cp_dir, exist_ok=True)
        configure_logger(os.path.join(cp_dir, f"fold_{fold_idx}.txt"))
        save_configure(cfg, cp_dir)
        logging.info("\nDataset: %s,\nModel: %s,\nDimension: %s",
                     cfg.dataset, cfg.model, cfg.dimension)

        best_dice, best_hd, best_asd = train_net(cfg, fold_idx, mesh=mesh)
        logging.info("Training and evaluation on Fold %d is done", fold_idx)
        dice_list.append(best_dice)
        hd_list.append(best_hd)
        asd_list.append(best_asd)

    write_cross_validation(cfg, dice_list, hd_list, asd_list)
    print(f"All {n_folds} folds done.")
    sys.exit(0)


if __name__ == "__main__":
    main()
