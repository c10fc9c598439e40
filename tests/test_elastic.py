"""Elastic deformation op (opt-in extra; the reference has no elastic op —
/root/reference/training/augmentation.py is affine-only — so these tests are
self-consistency checks, not a torch oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbim_tpu.ops.augment import elastic_deform_2d, elastic_deform_3d


def _pair_3d(rng, shape=(8, 12, 12), C=1):
    img = jnp.asarray(rng.standard_normal((*shape, C)), jnp.float32)
    lab = jnp.asarray(rng.integers(0, 4, shape), jnp.int32)
    return img, lab


def test_zero_magnitude_is_identity_3d():
    rng = np.random.default_rng(0)
    img, lab = _pair_3d(rng)
    out_img, out_lab = elastic_deform_3d(img, lab, jax.random.PRNGKey(1),
                                         magnitude=(0.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(lab))


def test_zero_magnitude_is_identity_2d():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((16, 16, 1)), jnp.float32)
    lab = jnp.asarray(rng.integers(0, 4, (16, 16)), jnp.int32)
    out_img, out_lab = elastic_deform_2d(img, lab, jax.random.PRNGKey(1),
                                         magnitude=(0.0, 0.0))
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(lab))


def test_label_values_preserved_and_deterministic():
    rng = np.random.default_rng(1)
    img, lab = _pair_3d(rng, shape=(6, 16, 16))
    key = jax.random.PRNGKey(7)
    out_img_a, out_lab_a = elastic_deform_3d(img, lab, key,
                                             magnitude=(0.2, 0.2, 0.2))
    out_img_b, out_lab_b = elastic_deform_3d(img, lab, key,
                                             magnitude=(0.2, 0.2, 0.2))
    # nearest labels stay in the original label set (plus 0 for padding)
    assert set(np.unique(np.asarray(out_lab_a))) <= set(
        np.unique(np.asarray(lab))) | {0}
    np.testing.assert_array_equal(np.asarray(out_lab_a), np.asarray(out_lab_b))
    np.testing.assert_array_equal(np.asarray(out_img_a), np.asarray(out_img_b))
    # a different key gives a different deformation
    out_img_c, _ = elastic_deform_3d(img, lab, jax.random.PRNGKey(8),
                                     magnitude=(0.2, 0.2, 0.2))
    assert not np.allclose(np.asarray(out_img_a), np.asarray(out_img_c))


def test_displacement_bounded():
    """A point label displaced by at most magnitude*(size-1)/2 (+0.5 rounding)
    voxels per axis."""
    shape = (16, 16, 16)
    lab = np.zeros(shape, np.int32)
    lab[8, 8, 8] = 1
    img = jnp.zeros((*shape, 1), jnp.float32)
    mag = 0.1
    _, out_lab = elastic_deform_3d(img, jnp.asarray(lab),
                                   jax.random.PRNGKey(3),
                                   magnitude=(mag,) * 3)
    pos = np.argwhere(np.asarray(out_lab) == 1)
    bound = mag * (shape[0] - 1) / 2.0 + 0.5 + 1e-6
    if len(pos):  # the point can vanish only by rounding at the bound
        assert np.abs(pos - np.array([8, 8, 8])).max() <= np.ceil(bound)


def test_pipeline_dispatch():
    """("elastic", p, params) resolves through the pipeline op table."""
    from cbim_tpu.data.pipeline import _apply_op
    rng = np.random.default_rng(2)
    img, lab = _pair_3d(rng, shape=(6, 12, 12))
    out_img, out_lab = jax.jit(
        lambda i, l, k: _apply_op("elastic", {"magnitude": (0.1,) * 3},
                                  i, l, k))(img, lab, jax.random.PRNGKey(0))
    assert out_img.shape == img.shape and out_lab.shape == lab.shape
    img2 = jnp.asarray(rng.standard_normal((16, 16, 1)), jnp.float32)
    lab2 = jnp.asarray(rng.integers(0, 3, (16, 16)), jnp.int32)
    out2_img, out2_lab = _apply_op("elastic", {}, img2, lab2,
                                   jax.random.PRNGKey(0))
    assert out2_img.shape == img2.shape and out2_lab.shape == lab2.shape


@pytest.mark.parametrize("nd", [2, 3])
def test_soft_label_branch(nd):
    rng = np.random.default_rng(4)
    if nd == 3:
        img, lab = _pair_3d(rng, shape=(6, 12, 12))
        out_img, out_lab = elastic_deform_3d(img, lab, jax.random.PRNGKey(5),
                                             magnitude=(0.1,) * 3,
                                             label_nearest=False)
    else:
        img = jnp.asarray(rng.standard_normal((12, 12, 1)), jnp.float32)
        lab = jnp.asarray(rng.integers(0, 4, (12, 12)), jnp.int32)
        out_img, out_lab = elastic_deform_2d(img, lab, jax.random.PRNGKey(5),
                                             magnitude=(0.1,) * 2,
                                             label_nearest=False)
    assert out_lab.dtype == img.dtype  # interpolated (soft) labels
    assert out_lab.shape == lab.shape
