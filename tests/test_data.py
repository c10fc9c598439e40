"""Data layer tests: NIfTI I/O, k-fold split, synthetic datasets, pipeline."""
import os

import numpy as np
import pytest

import conftest as cf

from cbim_tpu.config import config_from_dict


def _synth_cfg(**kw):
    base = dict(dataset="synthetic", model="unet", dimension="3d", classes=3,
                in_chan=1, base_chan=8, block="SingleConv", norm="in",
                training_size=[8, 32, 32], affine_pad_size=[2, 8, 8],
                scale=[0.1, 0.2, 0.2], rotate=[10, 0, 0], translate=[0, 0, 0],
                gaussian_noise_std=0.02, additive_brightness_std=0.5,
                gamma_range=[0.7, 1.4], synthetic_cases=5, k_fold=5)
    base.update(kw)
    return config_from_dict(base)


def test_nifti_roundtrip(tmp_path):
    from cbim_tpu.data.nifti import read_nifti, write_nifti

    rng = np.random.RandomState(0)
    vol = rng.randn(7, 11, 13).astype(np.float32)
    path = str(tmp_path / "vol.nii.gz")
    write_nifti(path, vol, spacing=(5.0, 1.5, 1.25))
    img = read_nifti(path)
    np.testing.assert_allclose(img.data, vol, rtol=1e-6)
    np.testing.assert_allclose(img.spacing, (5.0, 1.5, 1.25), rtol=1e-6)

    # uint8 labels, plain .nii
    lab = rng.randint(0, 4, size=(7, 11, 13)).astype(np.uint8)
    path2 = str(tmp_path / "lab.nii")
    write_nifti(path2, lab, spacing=(1, 1, 1))
    img2 = read_nifti(path2)
    assert img2.data.dtype == np.uint8
    np.testing.assert_array_equal(img2.data, lab)


def test_kfold_split_matches_reference_semantics():
    """Same seeded shuffle + contiguous test slice as the reference."""
    import random
    from cbim_tpu.data.base import kfold_split

    names = [f"case{i}" for i in range(23)]
    for seed in (0, 7):
        for k in range(5):
            ref = list(names)
            random.Random(seed).shuffle(ref)
            n = len(ref)
            ref_test = ref[k * (n // 5):(k + 1) * (n // 5)]
            assert kfold_split(names, 5, k, seed, "test") == ref_test
            train = kfold_split(names, 5, k, seed, "train")
            assert sorted(train + ref_test) == sorted(names)


def test_synthetic_dataset_and_pipeline():
    from cbim_tpu.data import get_dataset
    from cbim_tpu.data.pipeline import TrainPipeline

    cfg = _synth_cfg()
    ds = get_dataset(cfg, mode="train", fold_idx=0)
    assert len(ds.images) == 4          # 5 cases, 1/5 test

    pipe = TrainPipeline(ds, cfg, seed=0)
    img, lab = pipe.next_batch(2)
    assert img.shape == (2, 8, 32, 32, 1)
    assert lab.shape == (2, 8, 32, 32)
    assert np.isfinite(np.asarray(img)).all()
    assert set(np.unique(np.asarray(lab))).issubset({0, 1, 2})

    # two batches differ (randomness advances)
    img2, _ = pipe.next_batch(2)
    assert not np.allclose(np.asarray(img), np.asarray(img2))

    # test split exposes volumes + spacing
    ds_test = get_dataset(cfg, mode="test", fold_idx=0)
    vol, lab_t, spacing = ds_test.test_item(0)
    assert vol.ndim == 3 and lab_t.shape == vol.shape and len(spacing) == 3


def test_pipeline_2d():
    from cbim_tpu.data import get_dataset
    from cbim_tpu.data.pipeline import TrainPipeline

    cfg = _synth_cfg(dimension="2d", training_size=[32, 32],
                     affine_pad_size=[8, 8], scale=0.2, rotate=30, translate=0)
    ds = get_dataset(cfg, mode="train", fold_idx=0)
    pipe = TrainPipeline(ds, cfg, seed=0)
    img, lab = pipe.next_batch(4)
    assert img.shape == (4, 32, 32, 1)
    assert lab.shape == (4, 32, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_2d_epoch_sampling_without_replacement():
    """2D draws cover every slice exactly once per epoch (reference
    DataLoader shuffle semantics, train.py:57-64); 3D stays i.i.d."""
    from cbim_tpu.data import get_dataset
    from cbim_tpu.data.pipeline import TrainPipeline

    cfg = _synth_cfg(dimension="2d", training_size=[32, 32],
                     affine_pad_size=[8, 8], scale=0.2, rotate=30, translate=0)
    ds = get_dataset(cfg, mode="train", fold_idx=0)
    pipe = TrainPipeline(ds, cfg, seed=0)
    n = len(ds.images)
    assert pipe._without_replacement
    # one full epoch of draws is a permutation of range(n)
    drawn = np.concatenate([pipe._draw_indices(4) for _ in range(-(-n // 4))])
    counts = np.bincount(drawn[:n], minlength=n)
    assert (counts == 1).all()
    # second epoch re-permutes (overwhelmingly unlikely to repeat the order)
    drawn2 = np.concatenate([pipe._draw_indices(4) for _ in range(-(-n // 4))])
    assert sorted(drawn2[:n]) == list(range(n))

    cfg3 = _synth_cfg()
    ds3 = get_dataset(cfg3, mode="train", fold_idx=0)
    assert not TrainPipeline(ds3, cfg3, seed=0)._without_replacement


def test_recipe_constants_match_reference():
    """Normalization constants ported exactly (SURVEY §2.2)."""
    from cbim_tpu.data import datasets as D
    assert D.LiTS.CLIP == (-17, 201) and D.LiTS.MEAN == 99.40 and D.LiTS.STD == 39.39
    assert D.KiTS.CLIP == (-79, 304) and D.KiTS.MEAN == 100.93 and D.KiTS.STD == 76.90
    assert D.BCV.CLIP == (-958, 327) and D.BCV.MEAN == 82.92 and D.BCV.STD == 136.97
    assert D.AMOSCT.CLIP == (-991, 362) and D.AMOSCT.MEAN == 50.0 and D.AMOSCT.STD == 141.0
    assert len(D.AMOSCT.TEST_SPLIT) == 100
    assert len(D.AMOSMR.TEST_SPLIT) == 20
