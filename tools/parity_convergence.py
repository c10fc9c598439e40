#!/usr/bin/env python
"""End-to-end convergence parity: train the PyTorch reference and cbim_tpu on
the SAME on-disk dataset with the SAME recipe, compare cross-validation Dice.

This is the strongest behavioral-parity artifact available without the real
ACDC download (zero-egress environment): an ACDC-like phantom dataset (4
classes: background / RV / myocardium / LV-cavity, concentric ellipses with
per-case pose+intensity variation) written in the reference's on-disk layout
({name}_{0,1}.nii.gz + {name}_{0,1}_gt.nii.gz + list/dataset.yaml,
docs/tutorial.md:85-94), consumed by BOTH frameworks' unmodified ACDC-2D
pipelines and UNet-2D recipes.

Usage:
    python tools/parity_convergence.py gen  --workdir /tmp/parity
    python tools/parity_convergence.py ref  --workdir /tmp/parity   # torch CPU
    python tools/parity_convergence.py ours --workdir /tmp/parity   # jax CPU
    python tools/parity_convergence.py report --workdir /tmp/parity

The `ref` mode runs the reference's own train.py (read-only, via runpy) with
three environment shims, none of which change its math:
  - SimpleITK -> a reader backed by cbim_tpu's pure-numpy NIfTI parser;
  - .cuda() -> no-op (torch CPU build);
  - DataLoader workers -> 0 (worker processes can't see the shims).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

N_CASES = 6
CLASSES = 4
EPOCHS = 30
K_FOLD = 2
BATCH = 16
TRAINING_SIZE = [160, 160]

CONFIG = {
    "classes": CLASSES,
    "modality": "mri",
    "arch": "unet",
    "in_chan": 1,
    "base_chan": 32,
    "block": "SingleConv",
    "epochs": EPOCHS,
    "training_size": TRAINING_SIZE,
    "start_epoch": 0,
    "num_workers": 0,
    "aug_device": "cpu",
    "split_seed": 0,
    "k_fold": K_FOLD,
    "optimizer": "adamw",
    "base_lr": 0.0005,
    "betas": [0.9, 0.999],
    "weight_decay": 0.05,
    "weight": [0.5, 1, 1, 1],
    "rlt": 1,
    "scale": 0.2,
    "rotate": 30,
    "translate": 0,
    "gaussian_noise_std": 0.02,
    "additive_brightness_std": 0.3,
    "gamma_range": [0.7, 1.4],
    "print_freq": 5,
    "ema": True,
    "ema_alpha": 0.99,
    "val_freq": 10,
    "sliding_window": False,
    # reference DDP block (ignored by single-GPU train.py except these reads)
    "world_size": 1,
    "proc_idx": 0,
    "rank": 0,
    "port": 10000,
    "dist_url": "tcp://localhost:10000",
    "dist_backend": "nccl",
    "multiprocessing_distributed": False,
    "reproduce_seed": 2023,
}

# 3D flagship recipe (MedFormer, reference config/acdc/medformer_3d.yaml
# scaled to CPU-runnable geometry; chan_num stays the reference ctor default)
EPOCHS_3D = 24
K_FOLD_3D = 2
BATCH_3D = 2
TRAINING_SIZE_3D = [16, 48, 48]
CONFIG3D = {
    "classes": CLASSES,
    "modality": "mri",
    "arch": "medformer",
    "in_chan": 1,
    "base_chan": 32,
    "conv_block": "BasicBlock",
    "down_scale": [[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
    "kernel_size": [[1, 3, 3], [1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]],
    "norm": "in",
    "act": "relu",
    "map_size": [2, 6, 6],
    "conv_num": [2, 0, 0, 0, 0, 0, 2, 2],
    "trans_num": [0, 2, 2, 2, 2, 2, 0, 0],
    "num_heads": [1, 4, 4, 4, 4, 4, 1, 1],
    "expansion": 4,
    "fusion_depth": 2,
    "fusion_dim": 256,
    "fusion_heads": 4,
    "attn_drop": 0.0,
    "proj_drop": 0.0,
    "proj_type": "depthwise",
    "rel_pos": False,
    "se": True,
    "epochs": EPOCHS_3D,
    "training_size": TRAINING_SIZE_3D,
    "start_epoch": 0,
    "num_workers": 0,
    "aug_device": "cpu",
    "aux_loss": True,
    "aux_weight": [0.5, 0.5],
    "split_seed": 0,
    "k_fold": K_FOLD_3D,
    "optimizer": "adamw",
    "base_lr": 0.001,
    "betas": [0.9, 0.999],
    "weight_decay": 0.05,
    "weight": [0.5, 1, 1, 1],
    "rlt": 1,
    "print_freq": 5,
    "iter_per_epoch": 8,
    "scale": [0.1, 0.3, 0.3],
    "rotate": [30, 0, 0],
    "translate": [0, 0, 0],
    "affine_pad_size": [4, 16, 16],
    "gaussian_noise_std": 0.02,
    "additive_brightness_std": 0.7,
    "gamma_range": [0.5, 1.6],
    "ema": True,
    "ema_alpha": 0.99,
    "val_freq": 24,
    "sliding_window": True,
    "window_size": TRAINING_SIZE_3D,
    "world_size": 1,
    "proc_idx": 0,
    "rank": 0,
    "port": 10000,
    "dist_url": "tcp://localhost:10000",
    "dist_backend": "nccl",
    "multiprocessing_distributed": False,
    "reproduce_seed": 2023,
}


# nnFormer recipe (reference config/kits/nnformer_3d.yaml scaled to
# CPU-runnable geometry; the reference factory model/utils.py:118-120 exposes
# only crop size = window_size, so both sides run the paper defaults:
# embed 192, patch [2,4,4], windows [4,4,8,4], heads [6,12,24,48]).
# At crop [16,32,32] the swin stages see [8,8,8]->[4,4,4]->[2,2,2]->[1,1,1];
# stages with min(res) <= window clamp window=min(res), shift=0 on BOTH sides
# (reference nnformer.py:75-78, ours models/nnformer.py _effective).
# Geometry sized to the torch-CPU budget of this 1-core box: the reference
# step at crop [16,64,64] measured 73 s; [16,32,32] is ~4x fewer voxels and
# the sliding-window eval grid over the (20,~128,~128) phantoms stays the
# dominant reference-side cost (~100 windows/vol).
CONFIG3D_NNFORMER = dict(
    CONFIG3D,
    arch="nnformer",
    training_size=[16, 32, 32],
    window_size=[16, 32, 32],
    # round-4 artifact was degenerate at 40 epochs on the SPARSE 6-case
    # phantom (both sides Dice 0: [16,32,32] crops almost always
    # all-background); round 5 uses the dense 12-case phantom (gen --arch
    # nnformer) plus a longer budget so the reference actually learns.
    epochs=100,
    val_freq=100,
    iter_per_epoch=16,
    aux_loss=True,
    aux_weight=[0.2, 0.3, 0.5],      # kits/nnformer_3d.yaml:21
    # 0.25x the kits recipe's 4e-4 (kits/nnformer_3d.yaml:27).  The kits
    # recipe trains on [64,128,128]-voxel crops (~2M voxels/step at batch 2);
    # this phantom recipe sees 32k voxels/step, so the per-step gradient is
    # ~60x noisier and 4e-4 never descends (measured: fresh-batch loss flat
    # at ~2.1 for 4800 steps at 4e-4 AND 1e-3, while lr<=1e-4 descends
    # steadily; a fixed-batch overfit probe descends 2.2 -> 0.29 at 1e-3, so
    # gradients/machinery are fine — batch gradient SNR was the blocker).
    # The recipe stays IDENTICAL on both sides, which is what the artifact
    # compares.
    base_lr=0.0001,
    # softened intensity aug (the 2D recipe's values): at the medformer-3d
    # values (brightness std 0.7, gamma [0.5,1.6]) the per-sample brightness
    # shift swamps the phantom's ~0.2 class contrast and nnFormer never
    # descends across batches (fixed-batch overfit probe DOES descend
    # 2.2 -> 0.29, so gradients are fine — the task SNR was the blocker)
    additive_brightness_std=0.3,
    gamma_range=[0.7, 1.4],
    # metric-only run: a per-epoch 149M-param state snapshot is ~2.4 GB
    # device->host, minutes per epoch over the tunneled TPU backend
    save_ckpt=False,                 # (cbim_tpu-only key; reference ignores it)
)

CONFIGS_3D = {"medformer": CONFIG3D, "nnformer": CONFIG3D_NNFORMER}


def _cfg_for(dim: str, arch: str | None, epochs: int | None = None):
    cfg = CONFIG if dim != "3d" else CONFIGS_3D[arch or "medformer"]
    if epochs:
        # identical-budget override for both sides; eval only at the end
        # (mid-run sliding-window evals cost ~5 min/fold on this 1-core box)
        cfg = dict(cfg, epochs=epochs, val_freq=epochs)
    return cfg


# ---------------------------------------------------------------- phantom data
def _phantom_frame(rng: np.random.Generator, shape, phase: float,
                   dense: bool = False):
    """One cardiac-like frame: LV cavity (3) inside myocardium ring (2), with
    an RV crescent (1); intensity contrast + texture noise.

    ``dense=True`` scales the structures up (~60% foreground instead of
    ~15%) so small training crops mostly contain anatomy — needed for the
    nnFormer recipe, whose [16,32,32] crops of the sparse phantom are
    usually all-background and collapse training to Dice 0 in BOTH
    frameworks (round-4 degenerate artifact)."""
    z, y, x = shape
    lab = np.zeros(shape, np.uint8)
    yy, xx = np.mgrid[0:y, 0:x].astype(np.float32)
    cy = y / 2 + rng.uniform(-8, 8)
    cx = x / 2 + rng.uniform(-8, 8)
    if dense:
        r_lv = rng.uniform(26, 34) * (1.0 - 0.25 * phase)
        r_myo = r_lv + rng.uniform(12, 18)
    else:
        r_lv = rng.uniform(14, 20) * (1.0 - 0.25 * phase)
        r_myo = r_lv + rng.uniform(8, 12)
    th = rng.uniform(0, np.pi)
    for k in range(z):
        sc = 1.0 - 0.35 * abs(k - z / 2) / (z / 2)      # apex-to-base taper
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        lab_k = np.zeros((y, x), np.uint8)
        lab_k[d < r_myo * sc] = 2
        lab_k[d < r_lv * sc] = 3
        # RV crescent: ellipse offset along th, minus the LV+myo disk
        ry = (yy - cy) * np.cos(th) + (xx - cx) * np.sin(th)
        rx = -(yy - cy) * np.sin(th) + (xx - cx) * np.cos(th)
        rv = ((ry - r_myo * sc * 1.1) / (r_myo * sc * 1.1)) ** 2 + \
             (rx / (r_myo * sc * 0.8)) ** 2 < 1.0
        lab_k[rv & (lab_k == 0)] = 1
        lab[k] = lab_k

    base = np.array([0.15, 0.55, 0.35, 0.75], np.float32)   # per-class signal
    img = base[lab]
    img += rng.normal(0, 0.05, size=shape).astype(np.float32)
    # smooth background gradient (bias field)
    gy = rng.uniform(-0.1, 0.1)
    img += (gy * (yy - y / 2) / y)[None]
    img = np.clip(img * rng.uniform(200, 400), 0, None)      # CT-ish range
    return img.astype(np.float32), lab


def generate(workdir: str, dim: str = "2d", arch: str | None = None):
    sys.path.insert(0, REPO)
    from cbim_tpu.data.nifti import write_nifti
    import yaml

    data_root = os.path.join(workdir, "data")
    os.makedirs(os.path.join(data_root, "list"), exist_ok=True)
    rng = np.random.default_rng(42)
    names = []
    # nnFormer (149M params) needs foreground-dense crops AND more distinct
    # cases to get past background collapse (see _phantom_frame dense=...)
    dense = arch == "nnformer"
    n_cases = 12 if dense else N_CASES
    for i in range(n_cases):
        name = f"phantom{i:03d}"
        names.append(name)
        # volume must exceed one 64^3 dice-split block: the reference's
        # calculate_dice_split (metric/utils.py:41-46) crashes
        # (UnboundLocalError on `i`) when num_voxels < block_size
        if dim == "3d":
            shape = (20, int(rng.integers(120, 136)),
                     int(rng.integers(120, 136)))
        else:
            shape = (12, int(rng.integers(168, 200)), int(rng.integers(168, 200)))
        for idx, phase in [(0, 0.0), (1, 1.0)]:            # ED / ES frames
            img, lab = _phantom_frame(rng, shape, phase, dense=dense)
            sp = (5.0, 1.5625, 1.5625)
            write_nifti(os.path.join(data_root, f"{name}_{idx}.nii.gz"), img, sp)
            write_nifti(os.path.join(data_root, f"{name}_{idx}_gt.nii.gz"),
                        lab, sp)
    with open(os.path.join(data_root, "list", "dataset.yaml"), "w") as f:
        yaml.safe_dump(names, f)
    print(f"wrote {n_cases} cases (2 frames each, dense={dense}) to {data_root}")


def _write_config(workdir: str, data_root: str, dim: str = "2d",
                  arch: str | None = None, epochs: int | None = None):
    import yaml
    cfg = dict(_cfg_for(dim, arch, epochs))
    cfg["data_root"] = data_root
    cdir = os.path.join(workdir, "config", "acdc")
    os.makedirs(cdir, exist_ok=True)
    model = cfg["arch"]
    with open(os.path.join(cdir, f"{model}_{dim}.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    return os.path.join(workdir, "config")


# ---------------------------------------------------------------- ref harness
def run_reference(workdir: str, dim: str = "2d", arch: str | None = None,
                  epochs: int | None = None):
    """Run /root/reference/train.py on torch-CPU against the phantom data."""
    import types

    data_root = os.path.join(workdir, "data")
    _write_config(workdir, data_root, dim, arch, epochs)
    model = _cfg_for(dim, arch)["arch"]
    batch = BATCH_3D if dim == "3d" else BATCH

    # --- shim 1: SimpleITK backed by our pure-numpy NIfTI reader
    sys.path.insert(0, REPO)
    from cbim_tpu.data.nifti import read_nifti

    class _Img:
        def __init__(self, n):
            self._n = n

        def GetSize(self):
            return tuple(int(s) for s in self._n.data.shape[::-1])

        def GetSpacing(self):                      # sitk (x, y, z) order
            return tuple(float(s) for s in self._n.spacing[::-1])

    sitk = types.ModuleType("SimpleITK")
    sitk.ReadImage = lambda path: _Img(read_nifti(path))
    sitk.GetArrayFromImage = lambda im: np.array(im._n.data)
    sys.modules["SimpleITK"] = sitk

    # --- shim 1b: stub the reference's unavailable deps (timm/monai/...)
    # exactly as the parity tests do
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import conftest
    conftest._stub_reference_deps()
    if "torchvision" not in sys.modules:   # augmentation.py imports it unused
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms

    # --- shim 1c: numpy<2 aliases the reference relies on (np.Inf)
    if not hasattr(np, "Inf"):
        np.Inf = np.inf

    # --- shim 2: .cuda() no-ops (torch CPU build)
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # --- shim 3: in-process DataLoader (worker procs can't see the shims)
    import torch.utils.data as tud
    _DL = tud.DataLoader

    class _InlineDL(_DL):
        def __init__(self, *a, **k):
            k["num_workers"] = 0
            k["persistent_workers"] = False
            k.pop("pin_memory", None)
            super().__init__(*a, **k)

    tud.DataLoader = _InlineDL

    os.chdir(workdir)
    sys.path.insert(0, REFERENCE)
    sys.argv = ["train.py", "--dataset", "acdc", "--model", model,
                "--dimension", dim, "--batch_size", str(batch),
                "--unique_name", "parity_ref",
                "--cp_path", os.path.join(workdir, "exp_ref/"),
                "--log_path", os.path.join(workdir, "log_ref/")]
    import runpy
    runpy.run_path(os.path.join(REFERENCE, "train.py"), run_name="__main__")


# ---------------------------------------------------------------- ours
def run_ours(workdir: str, dim: str = "2d", arch: str | None = None,
             epochs: int | None = None):
    data_root = os.path.join(workdir, "data")
    config_root = _write_config(workdir, data_root, dim, arch, epochs)
    model = _cfg_for(dim, arch)["arch"]
    batch = BATCH_3D if dim == "3d" else BATCH
    # PARITY_PLATFORM=tpu runs our side on the ambient TPU backend (the
    # convergence comparison needs same data+recipe, not same hardware;
    # this box has one CPU core, shared with the torch reference run)
    plat = os.environ.get("PARITY_PLATFORM", "cpu")
    if plat == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)
    sys.argv = ["train.py", "--dataset", "acdc", "--model", model,
                "--dimension", dim, "--batch_size", str(batch),
                "--unique_name", "parity_ours",
                "--config_root", config_root,
                "--cp_path", os.path.join(workdir, "exp_ours/"),
                "--log_path", os.path.join(workdir, "log_ours/")] + \
        (["--platform", "cpu"] if plat == "cpu" else [])
    import runpy
    runpy.run_path(os.path.join(REPO, "train.py"), run_name="__main__")


# ---------------------------------------------------------------- report
def _parse_cv(path: str):
    """Mean Dice per fold from a cross_validation.txt."""
    import re
    with open(path) as f:
        text = f.read()
    # both frameworks write a "Dice" section header followed by
    # "Fold k: [v v v]" lines (then HD / ASD sections in the same shape)
    folds = []
    section = None
    for line in text.splitlines():
        stripped = line.strip()
        if stripped in ("Dice", "HD", "ASD"):
            section = stripped
            continue
        m = re.match(r"Fold\s+\d+\s*:\s*\[(.*)\]", stripped)
        if m and section == "Dice":
            vals = [float(v) for v in re.findall(r"[\d.]+(?:e-?\d+)?", m.group(1))]
            if vals:
                folds.append(float(np.mean(vals)))
    return folds, text


def report(workdir: str, dim: str = "2d", arch: str | None = None):
    out = {}
    for tag, sub in [("reference", "exp_ref"), ("ours", "exp_ours")]:
        path = os.path.join(workdir, sub, "acdc",
                            f"parity_{'ref' if tag == 'reference' else 'ours'}",
                            "cross_validation.txt")
        if not os.path.exists(path):
            out[tag] = None
            continue
        folds, text = _parse_cv(path)
        out[tag] = {"per_fold_mean_dice": folds,
                    "mean_dice": float(np.mean(folds)) if folds else None}
    if out.get("reference") and out.get("ours") and \
            out["reference"]["mean_dice"] and out["ours"]["mean_dice"]:
        out["dice_gap_pts"] = round(
            100 * (out["ours"]["mean_dice"] - out["reference"]["mean_dice"]), 2)
    print(json.dumps(out, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["gen", "ref", "ours", "report"])
    ap.add_argument("--workdir", default="/tmp/parity")
    ap.add_argument("--dim", default="2d", choices=["2d", "3d"])
    ap.add_argument("--arch", default=None, choices=[None, "medformer", "nnformer"],
                    help="3d recipe to run (default: medformer)")
    ap.add_argument("--epochs", type=int, default=None,
                    help="identical-budget epoch override for ref/ours runs "
                         "(eval only at the end)")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    if args.mode in ("ref", "ours"):
        fn = run_reference if args.mode == "ref" else run_ours
        fn(args.workdir, args.dim, args.arch, args.epochs)
    else:
        {"gen": generate, "report": report}[args.mode](
            args.workdir, args.dim, args.arch)


if __name__ == "__main__":
    main()
