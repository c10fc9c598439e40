"""Dataset base machinery: name lists, k-fold splits, host RAM cache.

Mirrors the per-dataset classes under reference training/dataset/: each
dataset loads its entire (already converted) corpus into host RAM as numpy
arrays at construction (dataset_acdc.py:49-66), splits train/test by a seeded
shuffle + contiguous test slice (dataset_acdc.py:29-38), and exposes:

- train mode: a list of preprocessed volumes (or slices, 2D) to sample from;
  the actual augmentation happens on device (see pipeline.py), not here.
- test mode: (img, lab, spacing) full volumes.
"""

from __future__ import annotations

import logging
import os
import random

import numpy as np
import yaml

from .nifti import read_nifti


def kfold_split(names: list, k_fold: int, k: int, seed: int, mode: str) -> list:
    """Seeded-shuffle k-fold split (reference dataset_acdc.py:29-38).

    test = contiguous slice k of the shuffled list; train = the rest.
    (The reference materializes train as list(set(all) - set(test)) whose
    order is hash-dependent; order is irrelevant since training samples
    randomly, so we keep a deterministic order.)
    """
    names = list(names)
    random.Random(seed).shuffle(names)
    n = len(names)
    test = names[k * (n // k_fold):(k + 1) * (n // k_fold)]
    if mode == "train":
        test_set = set(test)
        return [x for x in names if x not in test_set]
    return test


class VolumeDataset:
    """Base for 3D datasets (in-RAM cache of preprocessed volumes)."""

    dimension = "3d"

    def __init__(self, cfg, mode: str = "train", k_fold: int = 5, k: int = 0,
                 seed: int = 0):
        assert mode in ("train", "test")
        self.cfg = cfg
        self.mode = mode
        names = self.name_list(cfg, mode, k_fold, k, seed)

        logging.info("Start loading %s data (%d cases)", mode, len(names))
        self.images: list[np.ndarray] = []
        self.labels: list[np.ndarray] = []
        self.spacings: list[np.ndarray] = []
        for name in names:
            for img, lab, spacing in self.load_case(cfg, name):
                img, lab = self.preprocess(img, lab)
                self.images.append(np.ascontiguousarray(img, dtype=np.float32))
                self.labels.append(np.ascontiguousarray(lab, dtype=np.int8))
                self.spacings.append(np.asarray(spacing, dtype=np.float64))
        logging.info("Load done, length of dataset: %d", len(self.images))

    # -- per-dataset hooks -------------------------------------------------
    def name_list(self, cfg, mode, k_fold, k, seed):
        with open(os.path.join(cfg.data_root, "list", "dataset.yaml")) as f:
            names = yaml.safe_load(f)
        return kfold_split(names, k_fold, k, seed, mode)

    def load_case(self, cfg, name):
        """Yield (img_zyx, lab_zyx, spacing_zyx) tuples for one case name."""
        img = read_nifti(os.path.join(cfg.data_root, f"{name}.nii.gz"))
        lab = read_nifti(os.path.join(cfg.data_root, f"{name}_gt.nii.gz"))
        assert img.data.shape == lab.data.shape, name
        yield img.data.astype(np.float32), lab.data.astype(np.uint8), img.spacing

    def preprocess(self, img, lab):
        raise NotImplementedError

    def recipe(self):
        """Return the AugRecipe describing this dataset's training recipe."""
        raise NotImplementedError

    # -- common helpers ----------------------------------------------------
    def pad_to_training_size(self, img, lab, plus2: tuple = (0, 2, 2)):
        """Reference per-axis pad when smaller than training_size.

        The reference pads y/x to training_size+2 but z to training_size
        (ceil-half per side) — the ``plus2`` quirk (dataset_lits.py:81-93,
        dataset_amos_ct.py:85-96); ACDC 3D uses +2 on all axes with floor
        division (dataset_acdc.py:88-99).
        """
        import math
        ts = self.cfg.training_size
        pads = []
        for ax in range(3):
            if img.shape[ax] < ts[ax]:
                diff = int(math.ceil((ts[ax] + plus2[ax] - img.shape[ax]) / 2))
                pads.append((diff, diff))
            else:
                pads.append((0, 0))
        if any(p != (0, 0) for p in pads):
            img = np.pad(img, pads)
            lab = np.pad(lab, pads)
        return img, lab

    def __len__(self):
        return len(self.images)

    def test_item(self, idx):
        return self.images[idx], self.labels[idx], self.spacings[idx]


class SliceDataset(VolumeDataset):
    """Base for 2D datasets: train on slices, evaluate on whole volumes
    (reference training/dataset/dim2/dataset_acdc.py:66-90)."""

    dimension = "2d"

    def __init__(self, cfg, mode="train", k_fold=5, k=0, seed=0):
        super().__init__(cfg, mode, k_fold, k, seed)
        if mode == "train":
            slices_img, slices_lab = [], []
            for img, lab in zip(self.images, self.labels):
                for z in range(img.shape[0]):
                    slices_img.append(np.ascontiguousarray(img[z]))
                    slices_lab.append(np.ascontiguousarray(lab[z]))
            self.images, self.labels = slices_img, slices_lab

    def test_item(self, idx):
        """Whole volume, center-cropped to training size (dim2 dataset_acdc.py:154-166)."""
        img, lab = self.images[idx], self.labels[idx]
        th, tw = self.cfg.training_size[:2]
        H, W = img.shape[1], img.shape[2]
        y = (H - th) // 2
        x = (W - tw) // 2
        if y >= 0 and x >= 0:
            img = img[:, y:y + th, x:x + tw]
            lab = lab[:, y:y + th, x:x + tw]
        return img, lab, self.spacings[idx]
