"""Fused crop-into-resample equals resample-then-crop exactly."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from cbim_tpu.ops.augment import center_crop_2d, center_crop_3d
from cbim_tpu.ops.resample import affine_sample_2d, affine_sample_3d


@pytest.mark.slow
def test_fused_center_crop_3d_exact():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(14, 20, 18, 1).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 4, (14, 20, 18)).astype(np.int32))
    theta = jnp.asarray((np.eye(3, 4) + 0.1 * rng.randn(3, 4)).astype(np.float32))
    crop = (8, 12, 10)

    full_i, full_l = affine_sample_3d(img, lab, theta)
    ref_i, ref_l = center_crop_3d(full_i, full_l, crop)

    out_i, out_l = affine_sample_3d(img, lab, theta, out_shape=crop)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(ref_l))


def test_fused_center_crop_2d_exact():
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(20, 18, 1).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 4, (20, 18)).astype(np.int32))
    theta = jnp.asarray((np.eye(2, 3) + 0.1 * rng.randn(2, 3)).astype(np.float32))
    crop = (12, 10)

    full_i, full_l = affine_sample_2d(img, lab, theta)
    ref_i, ref_l = center_crop_2d(full_i, full_l, crop)
    out_i, out_l = affine_sample_2d(img, lab, theta, out_shape=crop)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(ref_l))
