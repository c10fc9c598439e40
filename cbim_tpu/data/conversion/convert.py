"""Offline dataset conversion (reference dataset_conversion/*_3d.py).

Converts raw downloads into the on-disk layout the datasets consume:
``{name}.nii.gz`` / ``{name}_gt.nii.gz`` + ``list/dataset.yaml``.

Replicates the reference's two-stage resampling: XY to target spacing with
cubic spline, then Z with *nearest* (sic — acdc_3d.py:28, lits_3d.py:35),
labels nearest throughout, then (CT datasets) foreground crop with a context
margin.  Per-dataset target spacings and crops are the reference's hardcoded
values.

Run:  python -m cbim_tpu.data.conversion.convert <dataset> <src> <dst>
"""

from __future__ import annotations

import os
import sys

import numpy as np
import yaml

from ..nifti import read_nifti, write_nifti
from .utils import CropForeground, resample_label_to_shape, resample_to_spacing

#: (xy_spacing_x, xy_spacing_y, z_spacing), crop context (z, y, x) or None
SPECS = {
    "acdc": dict(spacing=(1.5625, 1.5625, 5.0), crop=None),
    "lits": dict(spacing=(0.767578125, 0.767578125, 1.0), crop=(10, 30, 30)),
    "kits": dict(spacing=(0.781625, 0.781625, 0.781625), crop=(30, 30, 30)),
    "bcv": dict(spacing=(0.75, 0.75, 3.0), crop=(5, 20, 20)),
    "amos_ct": dict(spacing=(0.68825, 0.68825, 2.0), crop=(30, 30, 30)),
    "amos_mr": dict(spacing=(1.1875, 1.1875, 2.0), crop=(30, 30, 30)),
}


def convert_case(img: np.ndarray, lab: np.ndarray, spacing_zyx,
                 target_spacing_xyz, crop_context=None):
    """Two-stage resample + optional foreground crop; returns (img, lab)."""
    tx, ty, tz = target_spacing_xyz
    sz, sy, sx = spacing_zyx

    # stage 1: resample XY with cubic spline, Z unchanged
    img = resample_to_spacing(img, (sz, sy, sx), (sz, ty, tx), order=3)
    lab = resample_label_to_shape(lab, img.shape)
    # stage 2: resample Z with nearest (reference quirk)
    img2 = resample_to_spacing(img, (sz, ty, tx), (tz, ty, tx), order=0)
    lab = resample_label_to_shape(lab, img2.shape)
    img = img2

    if crop_context is not None:
        img, lab = CropForeground(img, lab, crop_context)
    return img, lab


def convert_acdc(src: str, dst: str, two_d: bool = False):
    """acdc_3d.py / acdc_2d.py: per-patient ED+ES frames, names patientXXX."""
    spec = SPECS["acdc"]
    os.makedirs(os.path.join(dst, "list"), exist_ok=True)
    names = []
    for patient in sorted(os.listdir(src)):
        pdir = os.path.join(src, patient)
        if not os.path.isdir(pdir):
            continue
        count = 0
        for f in sorted(os.listdir(pdir)):
            if "_gt" not in f or not f.endswith(".nii.gz"):
                continue
            frame = f.replace("_gt.nii.gz", "")
            img = read_nifti(os.path.join(pdir, frame + ".nii.gz"))
            lab = read_nifti(os.path.join(pdir, f))
            ts = spec["spacing"]
            if two_d:
                # 2D keeps z spacing (acdc_2d.py)
                ts = (ts[0], ts[1], img.spacing[0])
            ci, cl = convert_case(img.data.astype(np.float32),
                                  lab.data.astype(np.uint8),
                                  img.spacing, ts, spec["crop"])
            new_spacing = (ts[2], ts[1], ts[0])
            write_nifti(os.path.join(dst, f"{patient}_{count}.nii.gz"), ci,
                        new_spacing)
            write_nifti(os.path.join(dst, f"{patient}_{count}_gt.nii.gz"),
                        cl.astype(np.uint8), new_spacing)
            count += 1
        if count:
            names.append(patient)
            print(patient, "done")
    with open(os.path.join(dst, "list", "dataset.yaml"), "w") as f:
        yaml.dump(names, f)


def convert_ct(dataset: str, src_img: str, src_lab: str, dst: str,
               name_fn=None):
    """lits/kits/bcv/amos-style: integer-named cases."""
    spec = SPECS[dataset]
    os.makedirs(os.path.join(dst, "list"), exist_ok=True)
    names = []
    files = sorted(f for f in os.listdir(src_img) if f.endswith(".nii.gz"))
    for i, f in enumerate(files):
        name = name_fn(f) if name_fn else i
        img = read_nifti(os.path.join(src_img, f))
        lab = read_nifti(os.path.join(src_lab, f))
        ci, cl = convert_case(img.data.astype(np.float32),
                              lab.data.astype(np.uint8),
                              img.spacing, spec["spacing"], spec["crop"])
        ts = spec["spacing"]
        new_spacing = (ts[2], ts[1], ts[0])
        write_nifti(os.path.join(dst, f"{name}.nii.gz"), ci, new_spacing)
        write_nifti(os.path.join(dst, f"{name}_gt.nii.gz"),
                    cl.astype(np.uint8), new_spacing)
        names.append(int(name))
        print(name, "done")
    with open(os.path.join(dst, "list", "dataset.yaml"), "w") as f:
        yaml.dump(names, f)


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        raise SystemExit(1)
    dataset, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    if dataset in ("acdc", "acdc_2d"):
        convert_acdc(src, dst, two_d=dataset.endswith("2d"))
    elif dataset in ("lits", "kits", "bcv"):
        convert_ct(dataset, os.path.join(src, "images"),
                   os.path.join(src, "labels"), dst,
                   name_fn=lambda f: int("".join(c for c in f.split(".")[0]
                                                 if c.isdigit())))
    elif dataset in ("amos_ct", "amos_mr"):
        # amos_3d.py: CT ids < 500, MR ids >= 500
        want_ct = dataset == "amos_ct"
        img_dir = os.path.join(src, "imagesTr")
        lab_dir = os.path.join(src, "labelsTr")
        spec = SPECS[dataset]
        os.makedirs(os.path.join(dst, "list"), exist_ok=True)
        names = []
        for f in sorted(os.listdir(img_dir)):
            if not f.endswith(".nii.gz"):
                continue
            idx = int(f.split(".")[0].split("_")[1])
            if (idx < 500) != want_ct:
                continue
            img = read_nifti(os.path.join(img_dir, f))
            lab = read_nifti(os.path.join(lab_dir, f))
            ci, cl = convert_case(img.data.astype(np.float32),
                                  lab.data.astype(np.uint8),
                                  img.spacing, spec["spacing"], spec["crop"])
            ts = spec["spacing"]
            write_nifti(os.path.join(dst, f"{idx}.nii.gz"), ci,
                        (ts[2], ts[1], ts[0]))
            write_nifti(os.path.join(dst, f"{idx}_gt.nii.gz"),
                        cl.astype(np.uint8), (ts[2], ts[1], ts[0]))
            names.append(idx)
            print(idx, "done")
        with open(os.path.join(dst, "list", "dataset.yaml"), "w") as f:
            yaml.dump(names, f)
    else:
        raise SystemExit(f"unknown dataset {dataset}")


if __name__ == "__main__":
    main()
