"""Parity tests for Dice metric and sanity tests for surface distances."""
import numpy as np
import pytest

import conftest  # noqa: F401


def test_dice_matches_reference():
    torch = pytest.importorskip("torch")
    import conftest as cf
    cf.add_reference_to_path()
    from metric.utils import calculate_dice as ref_dice  # reference metric/utils.py:62

    from cbim_tpu.ops.metrics import dice_per_class

    rng = np.random.RandomState(0)
    C = 5
    pred = rng.randint(0, C, size=(4000, 1))
    target = rng.randint(0, C, size=(4000, 1))

    ref, ref_i, ref_s = ref_dice(torch.from_numpy(pred), torch.from_numpy(target), C)
    ours, ours_i, ours_s = dice_per_class(pred, target, C)

    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours_i), ref_i.numpy(), rtol=1e-6)


def test_dice_split_equals_full():
    from cbim_tpu.ops.metrics import dice_per_class, dice_per_class_split
    rng = np.random.RandomState(1)
    C = 4
    pred = rng.randint(0, C, size=(70000,))
    target = rng.randint(0, C, size=(70000,))
    d1, i1, s1 = dice_per_class(pred, target, C)
    d2, i2, s2 = dice_per_class_split(pred, target, C, block_size=4096)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), rtol=1e-6)


def test_surface_distance_simple_cubes():
    """Two cubes offset by 2 voxels along z with unit spacing -> ASD/HD ~ 2."""
    from cbim_tpu.ops.metrics import (average_surface_distance,
                                      robust_hausdorff, surface_distances)

    a = np.zeros((20, 20, 20), bool)
    b = np.zeros((20, 20, 20), bool)
    a[5:10, 5:15, 5:15] = True
    b[7:12, 5:15, 5:15] = True

    d_ab, d_ba = surface_distances(a, b, (1.0, 1.0, 1.0))
    asd = np.mean(average_surface_distance(d_ab, d_ba))
    hd = robust_hausdorff(d_ab, d_ba, 95)
    assert 0.5 < asd < 2.0
    assert 1.0 <= hd <= 2.0 + 1e-6

    # identical masks -> zero distances
    d_aa, d_aa2 = surface_distances(a, a, (1.0, 1.0, 1.0))
    assert np.max(d_aa) == 0.0 and np.max(d_aa2) == 0.0


def test_surface_distance_empty_masks():
    from cbim_tpu.ops.metrics import calculate_distance
    a = np.zeros((8, 8, 8), np.int32)
    b = np.zeros((8, 8, 8), np.int32)
    b[2:4, 2:4, 2:4] = 1
    asd, hd = calculate_distance(a, b, (1, 1, 1), num_classes=2)
    assert np.isinf(asd[0]) and np.isinf(hd[0])

    # matches the reference's NaN->500 clip at the callsite
    asd = np.clip(np.nan_to_num(asd, nan=500, posinf=500), 0, 500)
    assert asd[0] == 500


def test_calculate_distance_spacing():
    from cbim_tpu.ops.metrics import calculate_distance
    a = np.zeros((16, 16, 16), np.int32)
    b = np.zeros((16, 16, 16), np.int32)
    a[4:8, 4:8, 4:8] = 1
    b[4:8, 4:8, 4:8] = 1
    asd, hd = calculate_distance(a, b, (2.0, 1.0, 1.0), num_classes=2)
    assert asd[0] == 0.0 and hd[0] == 0.0
