"""Parity tests: affine resampler vs torch F.affine_grid/F.grid_sample."""
import numpy as np
import pytest

import conftest  # noqa: F401

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_sample_3d(img_np, lab_np, theta_np):
    img = torch.from_numpy(img_np)[None, None]          # 1,1,D,H,W
    lab = torch.from_numpy(lab_np.astype(np.float32))[None, None]
    theta = torch.from_numpy(theta_np)[None]            # 1,3,4
    grid = F.affine_grid(theta, img.size(), align_corners=True)
    img_o = F.grid_sample(img, grid, mode="bilinear", padding_mode="zeros",
                          align_corners=True)
    lab_o = F.grid_sample(lab, grid, mode="nearest", padding_mode="zeros",
                          align_corners=True)
    return img_o[0, 0].numpy(), lab_o[0, 0].numpy().astype(np.int32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_affine_sample_3d_matches_grid_sample(seed):
    from cbim_tpu.ops.resample import affine_sample_3d

    rng = np.random.RandomState(seed)
    D, H, W = 7, 12, 10
    img = rng.randn(D, H, W).astype(np.float32)
    lab = rng.randint(0, 4, size=(D, H, W)).astype(np.int32)
    # a generic affine: rotation-ish + scale + translation
    theta = (np.eye(3, 4) + 0.15 * rng.randn(3, 4)).astype(np.float32)

    ref_img, ref_lab = _torch_sample_3d(img, lab, theta)
    out_img, out_lab = affine_sample_3d(img[..., None], lab, theta)
    out_img = np.asarray(out_img)[..., 0]
    out_lab = np.asarray(out_lab)

    np.testing.assert_allclose(out_img, ref_img, rtol=1e-4, atol=1e-4)
    # nearest sampling can differ on exact .5 boundaries; allow a tiny count
    mismatch = (out_lab != ref_lab).mean()
    assert mismatch < 0.005, f"nearest mismatch fraction {mismatch}"


@pytest.mark.parametrize("seed", [0, 3])
def test_affine_sample_2d_matches_grid_sample(seed):
    from cbim_tpu.ops.resample import affine_sample_2d

    rng = np.random.RandomState(seed)
    H, W = 17, 13
    img = rng.randn(H, W).astype(np.float32)
    lab = rng.randint(0, 4, size=(H, W)).astype(np.int32)
    theta = (np.eye(2, 3) + 0.2 * rng.randn(2, 3)).astype(np.float32)

    timg = torch.from_numpy(img)[None, None]
    tlab = torch.from_numpy(lab.astype(np.float32))[None, None]
    grid = F.affine_grid(torch.from_numpy(theta)[None], timg.size(), align_corners=True)
    ref_img = F.grid_sample(timg, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=True)[0, 0].numpy()
    ref_lab = F.grid_sample(tlab, grid, mode="nearest", padding_mode="zeros",
                            align_corners=True)[0, 0].numpy().astype(np.int32)

    out_img, out_lab = affine_sample_2d(img[..., None], lab, theta)
    np.testing.assert_allclose(np.asarray(out_img)[..., 0], ref_img, rtol=1e-4, atol=1e-4)
    assert (np.asarray(out_lab) != ref_lab).mean() < 0.005


def test_random_theta_3d_identity_when_disabled():
    """scale=0, rotate=0, translate=0, shear=0 -> identity transform."""
    import jax
    from cbim_tpu.ops.augment import random_theta_3d

    theta = np.asarray(random_theta_3d(jax.random.PRNGKey(0), scale=0.0,
                                       rotate=0, translate=0.0, shear=0.0))
    np.testing.assert_allclose(theta, np.eye(3, 4), atol=1e-6)


def test_blur_matches_reference_dense_kernel():
    """Separable masked-support blur == reference dense-kernel conv."""
    import math
    import jax.numpy as jnp
    from cbim_tpu.ops.augment import _conv1d_along

    rng = np.random.RandomState(0)
    img = rng.randn(9, 11, 11).astype(np.float32)
    sigma = 0.9
    ks = 2 * math.ceil(3 * sigma) + 1

    # reference dense 3D kernel (augmentation.py:32-44)
    ax = np.arange(-(ks // 2), ks // 2 + 1, dtype=np.float32)
    xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
    k3 = np.exp(-(xx**2 + yy**2 + zz**2) / (2 * sigma**2))
    k3 /= k3.sum()
    ref = F.conv3d(torch.from_numpy(img)[None, None],
                   torch.from_numpy(k3)[None, None],
                   padding=ks // 2)[0, 0].numpy()

    w1 = np.exp(-(ax**2) / (2 * sigma**2))
    w1 /= w1.sum()
    out = jnp.asarray(img)[..., None]
    for axis in range(3):
        out = _conv1d_along(out, jnp.asarray(w1), axis)
    np.testing.assert_allclose(np.asarray(out)[..., 0], ref, rtol=1e-4, atol=1e-5)


def test_trilinear_rows_lowering_matches_gather_path():
    """The TPU row-gather lowering is the same arithmetic as the 8-gather
    path (identical weights/masks; only fp summation order differs)."""
    import jax
    import jax.numpy as jnp

    from cbim_tpu.ops.resample import (_trilinear_gather,
                                       _trilinear_gather_rows)

    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(19, 23, 17, 2).astype(np.float32))
    fz = jnp.asarray(rng.uniform(-2, 20, (11, 13, 7)).astype(np.float32))
    fy = jnp.asarray(rng.uniform(-2, 24, (11, 13, 7)).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-2, 18, (11, 13, 7)).astype(np.float32))
    a = _trilinear_gather(src, fz, fy, fx)
    b = _trilinear_gather_rows(src, fz, fy, fx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    sb = src.astype(jnp.bfloat16)
    a2 = _trilinear_gather(sb, fz, fy, fx).astype(jnp.float32)
    b2 = _trilinear_gather_rows(sb, fz, fy, fx).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))


def test_tiled_batch_lowering_matches_per_sample_path():
    """The TPU tile-pair single-gather lowering computes the identical
    interpolation (weights, masks, half-even nearest) as the per-sample
    gather paths — checked on CPU over random thetas including far
    out-of-range coordinates and a non-tile-multiple W."""
    import jax
    import jax.numpy as jnp
    from cbim_tpu.ops.resample import (_affine_sample_3d_tiled,
                                       affine_sample_3d)

    rng = np.random.RandomState(0)
    B, D, H, W, C = 3, 9, 14, 11, 2     # W=11: not a multiple of the tile
    img = jnp.asarray(rng.randn(B, D, H, W, C).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 5, size=(B, D, H, W)).astype(np.int32))
    thetas = np.stack([np.eye(3, 4) + 0.25 * rng.randn(3, 4)
                       for _ in range(B - 1)]
                      + [np.eye(3, 4) * 3.0])            # last: mostly OOB
    thetas = jnp.asarray(thetas.astype(np.float32))

    out_shape = (6, 10, 7)
    ti, tl = _affine_sample_3d_tiled(img, lab, thetas, out_shape=out_shape)
    for b in range(B):
        ri, rl = affine_sample_3d(img[b], lab[b], thetas[b],
                                  out_shape=out_shape)
        np.testing.assert_allclose(np.asarray(ti[b]), np.asarray(ri),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(tl[b]), np.asarray(rl))


@pytest.mark.slow
def test_batch_aug_matches_vmapped_sample_aug():
    """build_batch_aug == vmap(build_sample_aug) (same key consumption)."""
    import jax
    import jax.numpy as jnp
    from cbim_tpu.data.pipeline import (AugRecipe, build_batch_aug,
                                        build_sample_aug)

    recipe = AugRecipe(
        affine_prob=0.7, affine_pad=(4, 4, 4),
        scale=(0.2,)*3, rotate=(20,)*3, translate=(0.1,)*3,
        pre_ops=(("gaussian_noise", 1.0, {"std": 0.02}),
                 ("gamma", 0.5, {"range": (0.7, 1.5)})),
        post_ops=(("mirror", 0.5, {"axis": 2}),))
    crop = (8, 10, 12)
    buf = tuple(c + p for c, p in zip(crop, recipe.affine_pad))
    rng = np.random.RandomState(1)
    B = 2
    imgs = jnp.asarray(rng.rand(B, *buf, 1).astype(np.float32))
    labs = jnp.asarray(rng.randint(0, 4, size=(B, *buf)).astype(np.int32))
    keys = jax.random.split(jax.random.PRNGKey(7), B)

    bi, bl = build_batch_aug(recipe, crop, 3)(imgs, labs, keys)
    si, sl = jax.vmap(build_sample_aug(recipe, crop, 3))(imgs, labs, keys)
    np.testing.assert_allclose(np.asarray(bi), np.asarray(si),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bl), np.asarray(sl))
