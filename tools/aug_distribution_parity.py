#!/usr/bin/env python
"""Quantify augmentation-distribution parity vs the reference (VERDICT r1 #7).

Same phantom volume, same nominal ACDC-style recipe (noise -> additive
brightness -> gamma -> affine -> random crop, reference
dataset_acdc.py:141-149), run N times through BOTH implementations:

- reference: training/augmentation.py on torch CPU tensors, ops applied to
  the FULL volume, affine grid spans the full volume, then random crop;
- ours: the jitted batched pipeline with full-volume semantics (round 5):
  intensity ops masked-applied to the whole padded cache row, the affine
  grid normalized over the true volume extent, the random crop fused as the
  affine's out_offset (data/pipeline.py full_volume path,
  ops/resample.affine_sample_3d_fullvol_batch) — the reference's exact
  op order and grid span.

Per-draw summary statistics (crop intensity mean/std/p05/p95, per-class
voxel fractions) are compared as DISTRIBUTIONS (mean/std of each statistic +
two-sample KS).  Writes docs/aug_parity.md + JSON next to it.

Usage: python tools/aug_distribution_parity.py [N]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"

TRAIN_SIZE = (12, 96, 96)
PAD = (4, 24, 24)
VOL_SHAPE = (20, 144, 144)
SCALE = (0.3, 0.3, 0.3)
ROTATE = (30.0, 0.0, 0.0)
TRANSLATE = (0.0, 0.0, 0.0)
NOISE_STD = 0.02
BRIGHT_STD = 0.7
GAMMA_RANGE = (0.5, 1.6)


def make_phantom(seed=0):
    """ACDC-like normalized phantom: background noise + two nested
    ellipsoids (classes 1..3), intensities in [0, ~1]."""
    rng = np.random.default_rng(seed)
    D, H, W = VOL_SHAPE
    img = rng.uniform(0.05, 0.15, VOL_SHAPE).astype(np.float32)
    lab = np.zeros(VOL_SHAPE, np.int64)
    zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                             indexing="ij")
    c = (D / 2, H / 2 + 6, W / 2 - 8)
    r1 = (((zz - c[0]) / (D * 0.35)) ** 2 + ((yy - c[1]) / (H * 0.22)) ** 2 +
          ((xx - c[2]) / (W * 0.22)) ** 2)
    r2 = (((zz - c[0]) / (D * 0.22)) ** 2 + ((yy - c[1]) / (H * 0.12)) ** 2 +
          ((xx - c[2]) / (W * 0.12)) ** 2)
    r3 = (((zz - c[0]) / (D * 0.12)) ** 2 + ((yy - c[1]) / (H * 0.05)) ** 2 +
          ((xx - c[2]) / (W * 0.05)) ** 2)
    lab[r1 < 1] = 1
    img[r1 < 1] = 0.55
    lab[r2 < 1] = 2
    img[r2 < 1] = 0.8
    lab[r3 < 1] = 3
    img[r3 < 1] = 0.35
    img += rng.normal(0, 0.01, VOL_SHAPE).astype(np.float32)
    return img.astype(np.float32), lab


def stats_of(img_crop, lab_crop, n_classes=4):
    s = [float(img_crop.mean()), float(img_crop.std()),
         float(np.percentile(img_crop, 5)), float(np.percentile(img_crop, 95))]
    total = lab_crop.size
    fracs = [float((lab_crop == c).sum()) / total for c in range(n_classes)]
    return s + fracs


STAT_NAMES = ["mean", "std", "p05", "p95",
              "frac_bg", "frac_c1", "frac_c2", "frac_c3"]


def run_reference(img, lab, n_iter, seed=0):
    sys.path.insert(0, REFERENCE)
    import types
    import torch
    if "torchvision" not in sys.modules:
        # augmentation.py imports torchvision.transforms but never uses it
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    from training import augmentation as RA

    torch.manual_seed(seed)
    np.random.seed(seed)
    ti = torch.from_numpy(img)[None, None]
    tl = torch.from_numpy(lab.astype(np.float32))[None, None]
    out = []
    for _ in range(n_iter):
        x = RA.gaussian_noise(ti.clone(), std=NOISE_STD)
        x = RA.brightness_additive(x, std=BRIGHT_STD)
        x = RA.gamma(x, gamma_range=GAMMA_RANGE, retain_stats=True)
        x, y = RA.random_scale_rotate_translate_3d(
            x, tl.clone(), list(SCALE), list(ROTATE), list(TRANSLATE))
        x, y = RA.crop_3d(x, y, list(TRAIN_SIZE), mode="random")
        out.append(stats_of(x.numpy()[0, 0], y.numpy()[0, 0].round()))
    return np.asarray(out)


def run_ours(img, lab, n_iter, seed=0, batch=8):
    import jax
    if jax.default_backend() not in ("cpu",):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp
    from cbim_tpu.data.pipeline import AugRecipe, TrainPipeline

    class _DS:
        images = [img]
        labels = [lab.astype(np.int8)]

        def recipe(self):
            return AugRecipe(
                affine_prob=1.0, affine_pad=PAD,
                scale=SCALE, rotate=ROTATE, translate=TRANSLATE,
                shear=(0.0, 0.0, 0.0),
                # round 5: exact reference semantics — pre_ops + affine grid
                # over the FULL volume via the device-cache path
                full_volume=True,
                pre_ops=(
                    ("gaussian_noise", 1.0, {"std": NOISE_STD}),
                    ("brightness_additive", 1.0, {"std": BRIGHT_STD}),
                    ("gamma", 1.0, {"range": GAMMA_RANGE,
                                    "retain_stats": True}),
                ),
                num_classes=4)

    class _Cfg(dict):
        __getattr__ = dict.get

        def get(self, k, d=None):
            return dict.get(self, k, d)

    # device_cache=True: the full-volume path lives in the cache program
    # (works on the CPU backend too); float32 cache so the comparison
    # isolates SEMANTIC parity from the production bf16 cache quantization
    cfg = _Cfg(dimension="3d", training_size=list(TRAIN_SIZE), classes=4,
               device_cache=True, cache_dtype="float32")
    pipe = TrainPipeline(_DS(), cfg, seed=seed)
    out = []
    done = 0
    while done < n_iter:
        n = min(batch, n_iter - done)
        im, lb = pipe.next_batch(batch)
        im = np.asarray(im)[..., 0]
        lb = np.asarray(lb)
        for i in range(n):
            out.append(stats_of(im[i], lb[i]))
        done += n
    return np.asarray(out)


def ks_stat(a, b):
    """Two-sample KS statistic (no scipy dependency needed, but use it if
    present for the p-value)."""
    try:
        from scipy.stats import ks_2samp
        r = ks_2samp(a, b)
        return float(r.statistic), float(r.pvalue)
    except Exception:
        allv = np.sort(np.concatenate([a, b]))
        ca = np.searchsorted(np.sort(a), allv, side="right") / len(a)
        cb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
        return float(np.max(np.abs(ca - cb))), float("nan")


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    img, lab = make_phantom()
    ref = run_reference(img, lab, n_iter)
    ours = run_ours(img, lab, n_iter)

    rows = []
    for j, name in enumerate(STAT_NAMES):
        a, b = ref[:, j], ours[:, j]
        ks, pv = ks_stat(a, b)
        rows.append(dict(stat=name,
                         ref_mean=float(a.mean()), ref_std=float(a.std()),
                         ours_mean=float(b.mean()), ours_std=float(b.std()),
                         abs_diff=float(abs(a.mean() - b.mean())),
                         ks=ks, ks_p=pv))

    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    with open(os.path.join(REPO, "docs", "aug_parity.json"), "w") as f:
        json.dump(dict(n_iter=n_iter, vol_shape=VOL_SHAPE,
                       training_size=TRAIN_SIZE, rows=rows), f, indent=1)

    md = ["# Augmentation distribution parity (reference torch vs cbim_tpu)",
          "",
          f"Phantom {VOL_SHAPE}, crop {TRAIN_SIZE}, N={n_iter} draws each;",
          "identical nominal ACDC recipe (noise 0.02 / brightness 0.7 /",
          "gamma [0.5,1.6] retain-stats / affine scale 0.3 rot 30deg /",
          "random crop).  Ours runs the round-5 full-volume path: intensity",
          "ops + affine grid over the whole volume, crop fused as the",
          "affine out_offset (data/pipeline.py full_volume,",
          "resample.affine_sample_3d_fullvol_batch) — the reference's exact",
          "op order and grid span.",
          "",
          f"Two-sample KS 5% critical value at N={n_iter}/side:",
          f"{1.358 * (2 * n_iter / (n_iter * n_iter)) ** 0.5:.4f}.",
          "",
          "| stat | ref mean±std | ours mean±std | |Δmean| | KS |",
          "|---|---|---|---|---|"]
    for r in rows:
        md.append(f"| {r['stat']} | {r['ref_mean']:.4f}±{r['ref_std']:.4f} "
                  f"| {r['ours_mean']:.4f}±{r['ours_std']:.4f} "
                  f"| {r['abs_diff']:.4f} | {r['ks']:.3f} |")
    crit = 1.358 * (2.0 / n_iter) ** 0.5
    worst = max(rows, key=lambda r: r["ks"])
    n_fail = sum(1 for r in rows if r["ks"] > crit)
    md += ["",
           f"Verdict: {len(rows) - n_fail}/{len(rows)} statistics under the "
           f"critical value (worst: {worst['stat']} KS {worst['ks']:.3f} "
           f"vs crit {crit:.4f})."]
    with open(os.path.join(REPO, "docs", "aug_parity.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
