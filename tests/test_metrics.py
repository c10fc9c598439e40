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

    d_ab, d_ba, a_ab, a_ba = surface_distances(a, b, (1.0, 1.0, 1.0))
    asd = np.mean(average_surface_distance(d_ab, d_ba, a_ab, a_ba))
    hd = robust_hausdorff(d_ab, d_ba, 95, a_ab, a_ba)
    assert 0.5 < asd < 2.0
    assert 1.0 <= hd <= 2.0 + 1e-6

    # identical masks -> zero distances
    d_aa, d_aa2, _, _ = surface_distances(a, a, (1.0, 1.0, 1.0))
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


def test_surfel_area_table_matches_reference_exactly():
    """Our first-principles marching-cubes table == the vendored DeepMind
    table (metric/lookup_tables.py), all 256 codes, isotropic + anisotropic."""
    import conftest as cf
    cf.add_reference_to_path()
    from metric.lookup_tables import (
        ENCODE_NEIGHBOURHOOD_3D_KERNEL,
        create_table_neighbour_code_to_surface_area as ref_table)

    from cbim_tpu.ops._surfel_tables import (
        create_table_neighbour_code_to_surface_area, encode_kernel_3d)

    assert np.array_equal(encode_kernel_3d(), ENCODE_NEIGHBOURHOOD_3D_KERNEL)
    for sp in [(1.0, 1.0, 1.0), (1.5, 0.7, 2.0), (5.0, 1.5625, 1.5625)]:
        np.testing.assert_allclose(
            create_table_neighbour_code_to_surface_area(sp), ref_table(sp),
            rtol=0, atol=1e-12)


def test_calculate_distance_matches_reference_exactly():
    """End-to-end ASD/HD95 == reference metric/utils.py calculate_distance
    on random blobs with anisotropic spacing."""
    torch = pytest.importorskip("torch")
    import conftest as cf
    cf.add_reference_to_path()
    from metric.utils import calculate_distance as ref_distance

    from cbim_tpu.ops.metrics import calculate_distance

    rng = np.random.RandomState(7)
    from scipy import ndimage as ndi
    shape = (24, 32, 32)
    vol_t = np.zeros(shape, np.int64)
    vol_p = np.zeros(shape, np.int64)
    for c in (1, 2):
        # threshold at a high percentile so every class is non-empty in both
        # volumes (the reference errors on missing classes under numpy 2)
        f_t = ndi.gaussian_filter(rng.rand(*shape), 3)
        f_p = ndi.gaussian_filter(rng.rand(*shape), 3)
        blob_t = f_t > np.percentile(f_t, 85)
        blob_p = f_p > np.percentile(f_p, 85)
        vol_t[blob_t & (vol_t == 0)] = c
        vol_p[blob_p & (vol_p == 0)] = c
    assert all((vol_t == c).any() and (vol_p == c).any() for c in (1, 2))
    spacing = np.array([2.0, 0.75, 0.75])

    asd, hd = calculate_distance(vol_p, vol_t, spacing, num_classes=3)
    ref_asd, ref_hd = ref_distance(torch.from_numpy(vol_p),
                                   torch.from_numpy(vol_t),
                                   torch.from_numpy(spacing), 3)
    np.testing.assert_allclose(asd, ref_asd, rtol=1e-12)
    np.testing.assert_allclose(hd, ref_hd, rtol=1e-12)


def test_surface_distance_2d_matches_reference_exactly():
    """2D masks route through the contour-length table; compare end-to-end
    against the reference's compute_surface_distances on 2D blobs."""
    import conftest as cf
    cf.add_reference_to_path()
    from metric import metrics as ref_metrics

    from cbim_tpu.ops.metrics import (average_surface_distance,
                                      robust_hausdorff, surface_distances)

    rng = np.random.RandomState(11)
    from scipy import ndimage as ndi
    f1 = ndi.gaussian_filter(rng.rand(48, 64), 4)
    f2 = ndi.gaussian_filter(rng.rand(48, 64), 4)
    a = f1 > np.percentile(f1, 75)
    b = f2 > np.percentile(f2, 75)
    spacing = (1.25, 0.8)

    d_ab, d_ba, a_ab, a_ba = surface_distances(a, b, spacing)
    ref = ref_metrics.compute_surface_distances(a, b, spacing)
    np.testing.assert_allclose(d_ab, ref["distances_gt_to_pred"], rtol=1e-12)
    np.testing.assert_allclose(a_ab, ref["surfel_areas_gt"], rtol=1e-12)
    asd = average_surface_distance(d_ab, d_ba, a_ab, a_ba)
    ref_asd = ref_metrics.compute_average_surface_distance(ref)
    np.testing.assert_allclose(asd, ref_asd, rtol=1e-12)
    hd = robust_hausdorff(d_ab, d_ba, 95, a_ab, a_ba)
    np.testing.assert_allclose(hd,
                               ref_metrics.compute_robust_hausdorff(ref, 95),
                               rtol=1e-12)
