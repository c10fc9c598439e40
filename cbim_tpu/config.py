"""Config system: argparse-style base options merged with per-experiment YAML.

Mirrors the reference's two-tier config (reference train.py:240-272): the CLI
provides run identity (dataset/model/dimension/...) and the YAML file found at
``config/<dataset>/<model>_<dimension>.yaml`` provides everything else; YAML
keys are merged into one flat namespace (YAML wins on conflicts, same as the
reference's ``setattr`` loop).

The reference's DDP block (world_size/rank/dist_url/nccl) is replaced by a
mesh/topology block (``mesh_shape``, ``mesh_axes``) for GSPMD.
"""

from __future__ import annotations

import copy
import os
from typing import Any

import yaml


class Config:
    """A flat attribute namespace, like the reference's merged ``args``."""

    def __init__(self, **kwargs: Any):
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def get(self, key: str, default: Any = None) -> Any:
        return self.__dict__.get(key, default)

    def to_dict(self) -> dict:
        return dict(self.__dict__)

    def copy(self) -> "Config":
        return Config(**copy.deepcopy(self.__dict__))

    def __repr__(self) -> str:
        body = ",\n  ".join(f"{k}={v!r}" for k, v in sorted(self.__dict__.items()))
        return f"Config(\n  {body}\n)"


#: defaults for the CLI tier (reference train.py:240-257)
CLI_DEFAULTS = dict(
    dataset="acdc",
    model="unet",
    dimension="2d",
    pretrain=False,
    amp=False,                 # on TPU this selects bf16 compute (no GradScaler needed)
    batch_size=32,
    resume=False,
    load=False,
    cp_path="./exp/",
    log_path="./log/",
    unique_name="test",
)

#: defaults for keys that some reference YAMLs omit
YAML_DEFAULTS = dict(
    in_chan=1,
    base_chan=32,
    norm="bn",
    act="relu",
    block="ConvNormAct",
    aug_device="device",       # augmentation always runs on device in this framework
    aux_loss=False,
    aux_weight=[1.0],
    ema=False,
    ema_alpha=0.99,
    val_freq=10,
    sliding_window=False,
    window_size=None,
    iter_per_epoch=200,
    print_freq=10,
    num_workers=0,
    start_epoch=0,
    split_seed=0,
    k_fold=5,
    rlt=1,
    momentum=0.9,
    weight_decay=0.0,
    betas=[0.9, 0.999],
    reproduce_seed=None,
    affine_pad_size=[0, 0, 0],
    scale=0.0,
    rotate=0,
    translate=0.0,
    gaussian_noise_std=0.0,
    additive_brightness_std=0.0,
    gamma_range=[1.0, 1.0],
    torch_compile=False,       # accepted for config compatibility; jit is always on
    # --- TPU-native parallelism block (replaces the reference's DDP block) ---
    mesh_axes=["data"],
    mesh_shape=None,           # None -> all local devices on the 'data' axis
    spatial_axis=None,         # optional axis name for spatial (sequence-parallel) sharding
    compute_dtype="float32",   # 'bfloat16' when amp is requested
)


def find_config_path(dataset: str, model: str, dimension: str,
                     config_root: str | None = None) -> str:
    """``config/<dataset>/<model>_<dimension>.yaml`` (reference train.py:260)."""
    roots = []
    if config_root:
        roots.append(config_root)
    roots.append(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"))
    roots.append("configs")
    roots.append("config")
    for root in roots:
        path = os.path.join(root, dataset, f"{model}_{dimension}.yaml")
        if os.path.exists(path):
            return path
    raise ValueError(
        f"The specified configuration doesn't exist: {dataset}/{model}_{dimension}.yaml "
        f"(searched {roots})")


def load_config(dataset: str = "acdc", model: str = "unet", dimension: str = "2d",
                config_root: str | None = None, yaml_path: str | None = None,
                **overrides: Any) -> Config:
    """Build the merged flat config.

    Precedence (lowest to highest): YAML_DEFAULTS < CLI_DEFAULTS < YAML file
    < explicit ``overrides``.  The YAML-over-CLI ordering replicates the
    reference's merge loop (train.py:269-270).
    """
    merged: dict[str, Any] = dict(YAML_DEFAULTS)
    merged.update(CLI_DEFAULTS)
    merged.update(dataset=dataset, model=model, dimension=dimension)

    if yaml_path is None:
        yaml_path = find_config_path(dataset, model, dimension, config_root)
    with open(yaml_path, "r") as f:
        yaml_cfg = yaml.safe_load(f) or {}
    merged.update(yaml_cfg)
    merged.update(overrides)

    cfg = Config(**merged)
    if getattr(cfg, "amp", False):
        cfg.compute_dtype = "bfloat16"
    return cfg


def config_from_dict(d: dict, **overrides: Any) -> Config:
    merged = dict(YAML_DEFAULTS)
    merged.update(CLI_DEFAULTS)
    merged.update(d)
    merged.update(overrides)
    cfg = Config(**merged)
    if getattr(cfg, "amp", False):
        cfg.compute_dtype = "bfloat16"
    return cfg


def save_configure(cfg: Config, out_dir: str) -> None:
    """Snapshot the merged config to ``config.txt`` (reference utils.py:30-39)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.txt"), "w") as f:
        for name, value in sorted(cfg.to_dict().items()):
            f.write(f"{name}: {value}\n")
