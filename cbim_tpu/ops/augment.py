"""On-device, batched data augmentation (the framework's headline TPU path).

The reference runs these per-sample on CPU dataloader workers or per-sample on
GPU inside ``__getitem__`` (training/augmentation.py; 5-6 s/volume on CPU,
0.1-0.3 s/volume on GPU per reference docs/change.md:6-7).  Here every op is a
pure jnp function on channels-last arrays with explicit PRNG keys, vmapped
over the batch and jit-compiled into the input pipeline, so a whole batch is
augmented in one fused XLA program on the accelerator.

Single-sample signatures (vmap over batch in data/pipeline.py):
  img: (D, H, W, C) float32  (3D)  or (H, W, C) (2D);  lab: (D, H, W) int.

Randomness parity: each op consumes an explicit key and draws from the same
distributions as the reference (uniform ranges, integer-degree rotations via
randint, unbiased std), so the *distribution* of augmented samples matches
even though the RNG streams differ.
"""

from __future__ import annotations

import math


import jax
import jax.numpy as jnp
from jax import lax

from .resample import affine_sample_2d, affine_sample_3d

# ---------------------------------------------------------------------------
# intensity ops  (reference training/augmentation.py:15-167)
# ---------------------------------------------------------------------------


def gaussian_noise(img, key, std: float, mean: float = 0.0):
    """augmentation.py:15 — iid gaussian noise."""
    return img + jax.random.normal(key, img.shape, img.dtype) * std + mean


def brightness_additive(img, key, std: float, mean: float = 0.0):
    """augmentation.py:67 — one additive scalar per sample (per_channel=False)."""
    shift = jax.random.normal(key, (), img.dtype) * std + mean
    return img + shift


def brightness_multiply(img, key, multiply_range=(0.7, 1.3)):
    """augmentation.py:84 — one multiplicative scalar per sample."""
    lo, hi = multiply_range
    factor = jax.random.uniform(key, (), img.dtype, lo, hi)
    return img * factor


def _std_unbiased(x):
    n = x.size
    mu = jnp.mean(x)
    return jnp.sqrt(jnp.sum((x - mu) ** 2) / (n - 1))


def _masked_stats(x, mask, count):
    """(min, max, mean, unbiased std) over ``mask``-selected voxels."""
    big = jnp.float32(3.4e38)
    minm = jnp.min(jnp.where(mask, x, big))
    maxm = jnp.max(jnp.where(mask, x, -big))
    xm = jnp.where(mask, x, 0.0)
    mean = jnp.sum(xm) / count
    var = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0)) / (count - 1)
    return minm, maxm, mean, jnp.sqrt(var)


def gamma(img, key, gamma_range=(0.5, 2.0), retain_stats: bool = True,
          mask=None, count=None):
    """augmentation.py:104-136 — min-max renorm, pow, optional stat retention.

    per_channel=False semantics: stats and the drawn gamma are shared across
    the whole tensor (all reference datasets call it this way).

    ``mask``/``count`` restrict the stats to the true-volume voxels of a
    zero-padded cache row (the full-volume pipeline path): the reference
    computes them over the whole variable-shape volume, which the padded
    cache represents as mask-selected voxels.  Output outside the mask is
    zeroed (pow of a negative padding residue would be NaN otherwise).
    """
    lo, hi = gamma_range
    g = jax.random.uniform(key, (), jnp.float32, lo, hi)
    x = img.astype(jnp.float32)
    if mask is not None:
        minm, maxm, mean, std = _masked_stats(x, mask, count)
    else:
        minm = jnp.min(x)
        maxm = jnp.max(x)
        mean = jnp.mean(x)
        std = _std_unbiased(x)
    rng = maxm - minm
    safe_rng = jnp.where(rng > 0, rng, 1.0)   # constant image -> no-op (the
    base = (x - minm) / safe_rng              # reference NaNs here)
    if mask is not None:
        base = jnp.where(mask, base, 0.0)     # padding: pow(neg, frac) = NaN
    # NaN-proof pow: base is mathematically >= 0, but pow lowers to
    # exp(g*log(base)) on TPU where a 0 (or any fp-edge negative) base makes
    # log produce -inf/NaN inside fused HLO; guard the log's argument and
    # select the exact limit value 0^g = 0 explicitly.  For base > 0 this
    # matches jnp.power's own exp/log formulation.
    powed = jnp.where(base > 0,
                      jnp.exp(g * jnp.log(jnp.maximum(base, 1e-38))), 0.0)
    y = powed * rng + minm
    if retain_stats:
        if mask is not None:
            _, _, y_mean, new_std = _masked_stats(y, mask, count)
        else:
            y_mean = jnp.mean(y)
            new_std = _std_unbiased(y)
        y = y - y_mean
        y = y / jnp.where(new_std > 0, new_std, 1.0) * std + mean
    if mask is not None:
        y = jnp.where(mask, y, 0.0)
    return y.astype(img.dtype)


def contrast(img, key, contrast_range=(0.65, 1.5), preserve_range: bool = True):
    """augmentation.py:138-167 — scale around the mean, clip to original range."""
    lo, hi = contrast_range
    f = jax.random.uniform(key, (), jnp.float32, lo, hi)
    x = img.astype(jnp.float32)
    minm = jnp.min(x)
    maxm = jnp.max(x)
    mean = jnp.mean(x)
    y = (x - mean) * f + mean
    if preserve_range:
        y = jnp.clip(y, minm, maxm)
    return y.astype(img.dtype)


def mirror(img, lab, axis: int):
    """augmentation.py:169-189 — flip spatial axis (0-based spatial index)."""
    return jnp.flip(img, axis=axis), jnp.flip(lab, axis=axis)


def gaussian_blur(img, key, sigma_range=(0.5, 1.0)):
    """augmentation.py:19-64 — gaussian blur with a dynamically-sized kernel.

    The reference picks sigma ~ U(range) and a kernel of size 2*ceil(3s)+1.
    Under jit we use a *fixed* max support sized for sigma_range[1] and mask
    taps beyond the dynamic radius ceil(3*sigma) before normalizing, which is
    numerically identical to the dynamic-size kernel (zero-padded conv).
    Separable 1D passes replace the reference's dense 2D/3D kernel (the dense
    gaussian is exactly the product of its normalized 1D factors).
    """
    lo, hi = sigma_range
    sigma = jax.random.uniform(key, (), jnp.float32, lo, hi)
    m_max = int(math.ceil(3 * hi))
    offsets = jnp.arange(-m_max, m_max + 1, dtype=jnp.float32)
    m_dyn = jnp.ceil(3.0 * sigma)
    w = jnp.exp(-(offsets ** 2) / (2.0 * sigma ** 2))
    w = jnp.where(jnp.abs(offsets) <= m_dyn, w, 0.0)
    w = w / jnp.sum(w)

    ndim_spatial = img.ndim - 1
    out = img.astype(jnp.float32)
    for axis in range(ndim_spatial):
        out = _conv1d_along(out, w, axis)
    return out.astype(img.dtype)


def _conv1d_along(x, w, axis: int):
    """Depthwise 1D convolution along spatial ``axis`` of (..., C) array."""
    k = w.shape[0]
    C = x.shape[-1]
    moved = jnp.moveaxis(x, axis, -2)              # (..., L, C)
    lead = moved.shape[:-2]
    L = moved.shape[-2]
    flat = moved.reshape(-1, L, C)                  # treat rest as batch
    kernel = jnp.tile(w.reshape(k, 1, 1), (1, 1, C))  # (k, in/groups=1, C)
    y = lax.conv_general_dilated(
        flat, kernel,
        window_strides=(1,), padding=[(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
        precision=lax.Precision.HIGHEST)  # fp32 even on TPU (default convs are bf16)
    return jnp.moveaxis(y.reshape(*lead, L, C), -2, axis)


# ---------------------------------------------------------------------------
# affine theta builders  (reference augmentation.py:192-291)
# ---------------------------------------------------------------------------

def _aslist(v, n):
    if isinstance(v, (int, float)):
        return [float(v)] * n
    return [float(t) for t in v]


def random_theta_3d(key, scale=0.3, rotate=45, translate=0.1, shear=0.05):
    """Random 3D affine matrix, matching random_scale_rotate_translate_3d.

    Returns a (3, 4) theta for :func:`affine_sample_3d`.  The reference
    composes theta = Rx @ Ry @ Rz @ S with S holding scale/shear/translate,
    using integer-degree rotations drawn from randint(-r, max(r, 1)) and
    scales drawn from U(1-s, 1/(1-s)).
    """
    scale = _aslist(scale, 3)
    translate = _aslist(translate, 3)
    rotate = _aslist(rotate, 3)
    shear = _aslist(shear, 3)

    ks = jax.random.split(key, 13)

    def u(k, lo, hi):
        return jax.random.uniform(k, (), jnp.float32, lo, hi)

    sx = u(ks[0], 1 - scale[0], 1.0 / (1 - scale[0])) if scale[0] > 0 else jnp.float32(1)
    sy = u(ks[1], 1 - scale[1], 1.0 / (1 - scale[1])) if scale[1] > 0 else jnp.float32(1)
    sz = u(ks[2], 1 - scale[2], 1.0 / (1 - scale[2])) if scale[2] > 0 else jnp.float32(1)

    sh_xy = u(ks[3], -shear[0], shear[0])
    sh_xz = u(ks[4], -shear[0], shear[0])
    sh_yx = u(ks[5], -shear[1], shear[1])
    sh_yz = u(ks[6], -shear[1], shear[1])
    sh_zx = u(ks[7], -shear[2], shear[2])
    sh_zy = u(ks[8], -shear[2], shear[2])

    tx = u(ks[9], -translate[0], translate[0]) if translate[0] > 0 else jnp.float32(0)
    ty = u(ks[10], -translate[1], translate[1]) if translate[1] > 0 else jnp.float32(0)
    tz = u(ks[11], -translate[2], translate[2]) if translate[2] > 0 else jnp.float32(0)

    theta_scale = jnp.array([[1., 0., 0., 0.],
                             [0., 1., 0., 0.],
                             [0., 0., 1., 0.],
                             [0., 0., 0., 1.]], jnp.float32)
    theta_scale = theta_scale.at[0, 0].set(sx).at[0, 1].set(sh_xy).at[0, 2].set(sh_xz).at[0, 3].set(tx)
    theta_scale = theta_scale.at[1, 0].set(sh_yx).at[1, 1].set(sy).at[1, 2].set(sh_yz).at[1, 3].set(ty)
    theta_scale = theta_scale.at[2, 0].set(sh_zx).at[2, 1].set(sh_zy).at[2, 2].set(sz).at[2, 3].set(tz)

    kx, ky, kz = jax.random.split(ks[12], 3)

    def angle(k, r):
        deg = jax.random.randint(k, (), -int(r), max(int(r), 1)).astype(jnp.float32)
        return deg / 180.0 * jnp.pi

    ax = angle(kx, rotate[0])
    ay = angle(ky, rotate[1])
    az = angle(kz, rotate[2])

    cx, sx_ = jnp.cos(ax), jnp.sin(ax)
    cy, sy_ = jnp.cos(ay), jnp.sin(ay)
    cz, sz_ = jnp.cos(az), jnp.sin(az)

    rx = jnp.array([[1, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]], jnp.float32)
    rx = rx.at[1, 1].set(cx).at[1, 2].set(-sx_).at[2, 1].set(sx_).at[2, 2].set(cx)
    ry = jnp.array([[0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]], jnp.float32)
    ry = ry.at[0, 0].set(cy).at[0, 2].set(-sy_).at[2, 0].set(sy_).at[2, 2].set(cy)
    rz = jnp.array([[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32)
    rz = rz.at[0, 0].set(cz).at[0, 1].set(-sz_).at[1, 0].set(sz_).at[1, 1].set(cz)

    theta = rx @ ry @ rz @ theta_scale
    return theta[0:3, :]


def random_theta_2d(key, scale=0.3, rotate=180, translate=0.0):
    """Random 2D affine matrix matching random_scale_rotate_translate_2d.

    Note the 2D reference differs from 3D: scale ~ U(1-s, 1+s), shear is drawn
    from the *scale* ranges, and theta = S @ R (scale then rotate).
    Returns (2, 3).
    """
    scale = _aslist(scale, 2)
    translate = _aslist(translate, 2)

    ks = jax.random.split(key, 7)

    def u(k, lo, hi):
        return jax.random.uniform(k, (), jnp.float32, lo, hi)

    sx = 1 - scale[0] + u(ks[0], 0.0, 1.0) * 2 * scale[0]
    sy = 1 - scale[1] + u(ks[1], 0.0, 1.0) * 2 * scale[1]
    shx = u(ks[2], 0.0, 1.0) * 2 * scale[0] - scale[0]
    shy = u(ks[3], 0.0, 1.0) * 2 * scale[1] - scale[1]
    tx = u(ks[4], 0.0, 1.0) * 2 * translate[0] - translate[0]
    ty = u(ks[5], 0.0, 1.0) * 2 * translate[1] - translate[1]

    theta_scale = jnp.array([[1., 0., 0.], [0., 1., 0.], [0., 0., 1.]], jnp.float32)
    theta_scale = theta_scale.at[0, 0].set(sx).at[0, 1].set(shx).at[0, 2].set(tx)
    theta_scale = theta_scale.at[1, 0].set(shy).at[1, 1].set(sy).at[1, 2].set(ty)

    deg = jax.random.randint(ks[6], (), -int(rotate), max(int(rotate), 1)).astype(jnp.float32)
    a = deg / 180.0 * jnp.pi
    c, s = jnp.cos(a), jnp.sin(a)
    theta_rot = jnp.array([[0., 0., 0.], [0., 0., 0.], [0., 0., 1.]], jnp.float32)
    theta_rot = theta_rot.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)

    theta = theta_scale @ theta_rot
    return theta[0:2, :]


def random_scale_rotate_translate_3d(img, lab, key, scale=0.3, rotate=45,
                                     translate=0.1, shear=0.05):
    theta = random_theta_3d(key, scale, rotate, translate, shear)
    return affine_sample_3d(img, lab, theta)


def random_scale_rotate_translate_2d(img, lab, key, scale=0.3, rotate=180,
                                     translate=0.0):
    theta = random_theta_2d(key, scale, rotate, translate)
    return affine_sample_2d(img, lab, theta)


# ---------------------------------------------------------------------------
# elastic deformation (opt-in extra; the reference augmentation library is
# affine-only — training/augmentation.py has no elastic op — so NO dataset
# recipe enables this by default.  Offered for users who want nnU-Net-style
# elastic aug: enable via a ("elastic", p, {...}) entry in a custom recipe's
# pre_ops/post_ops.)
# ---------------------------------------------------------------------------


def _elastic_field(key, vol_shape, grid, magnitude):
    """Smooth per-axis displacement field in NORMALIZED units.

    Control points: uniform in [-magnitude, magnitude] on a coarse
    ``grid``-shaped lattice, trilinearly upsampled to ``vol_shape`` — the
    coarse-to-fine interpolation IS the smoothing (band-limited by
    construction), so no separable gaussian pass over the full volume is
    needed.  Returns (ndim, *vol_shape) float32."""
    ndim = len(vol_shape)
    disp = jax.random.uniform(key, (ndim, *grid), jnp.float32, -1.0, 1.0)
    mag = jnp.asarray(magnitude, jnp.float32).reshape(ndim, *([1] * ndim))
    return jax.image.resize(disp * mag, (ndim, *vol_shape), method="linear")


def elastic_deform_3d(img, lab, key, grid=(4, 4, 4),
                      magnitude=(0.05, 0.05, 0.05), label_nearest=True):
    """Random smooth elastic deformation of one (img, lab) pair.

    img: (D, H, W, C) float; lab: (D, H, W) int.  ``magnitude`` is the max
    control-point displacement per axis in normalized half-extent units
    (0.05 -> up to 2.5% of the axis extent, i.e. ``0.05*(size-1)/2`` voxels),
    matching the normalized-coordinate convention of the affine ops.
    Sampling follows grid_sample conventions (zeros padding; img trilinear,
    lab nearest) via the same gather lowering as :mod:`..ops.resample`."""
    from .resample import _nearest_gather, _trilinear_gather
    D, H, W = lab.shape
    dz, dy, dx = _elastic_field(key, (D, H, W), grid, magnitude)
    fz = (jnp.arange(D, dtype=jnp.float32)[:, None, None]
          + dz * ((D - 1) / 2.0))
    fy = (jnp.arange(H, dtype=jnp.float32)[None, :, None]
          + dy * ((H - 1) / 2.0))
    fx = (jnp.arange(W, dtype=jnp.float32)[None, None, :]
          + dx * ((W - 1) / 2.0))
    img_out = _trilinear_gather(img, fz, fy, fx)
    if label_nearest:
        lab_out = _nearest_gather(lab, fz, fy, fx)
    else:
        lab_out = _trilinear_gather(lab[..., None].astype(img.dtype),
                                    fz, fy, fx)[..., 0]
    return img_out, lab_out


def elastic_deform_2d(img, lab, key, grid=(4, 4), magnitude=(0.05, 0.05),
                      label_nearest=True):
    """2D twin of :func:`elastic_deform_3d`.  img: (H, W, C); lab: (H, W)."""
    from .resample import _bilinear_gather_2d, _nearest_gather_2d
    H, W = lab.shape
    dy, dx = _elastic_field(key, (H, W), grid, magnitude)
    fy = jnp.arange(H, dtype=jnp.float32)[:, None] + dy * ((H - 1) / 2.0)
    fx = jnp.arange(W, dtype=jnp.float32)[None, :] + dx * ((W - 1) / 2.0)
    img_out = _bilinear_gather_2d(img, fy, fx)
    if label_nearest:
        lab_out = _nearest_gather_2d(lab, fy, fx)
    else:
        lab_out = _bilinear_gather_2d(lab[..., None].astype(img.dtype),
                                      fy, fx)[..., 0]
    return img_out, lab_out


# ---------------------------------------------------------------------------
# crops  (reference augmentation.py:297-343)
# ---------------------------------------------------------------------------

def center_crop_3d(img, lab, crop_size):
    D, H, W = img.shape[0], img.shape[1], img.shape[2]
    cd, ch, cw = crop_size
    z = (D - cd) // 2
    y = (H - ch) // 2
    x = (W - cw) // 2
    return (lax.dynamic_slice(img, (z, y, x, 0), (cd, ch, cw, img.shape[3])),
            lax.dynamic_slice(lab, (z, y, x), (cd, ch, cw)))


def random_crop_3d(img, lab, key, crop_size):
    """Uniform random crop; start ~ randint(0, max(size-crop, 1))."""
    D, H, W = img.shape[0], img.shape[1], img.shape[2]
    cd, ch, cw = crop_size
    kz, ky, kx = jax.random.split(key, 3)
    z = jax.random.randint(kz, (), 0, max(D - cd, 1))
    y = jax.random.randint(ky, (), 0, max(H - ch, 1))
    x = jax.random.randint(kx, (), 0, max(W - cw, 1))
    return (lax.dynamic_slice(img, (z, y, x, 0), (cd, ch, cw, img.shape[3])),
            lax.dynamic_slice(lab, (z, y, x), (cd, ch, cw)))


def center_crop_2d(img, lab, crop_size):
    H, W = img.shape[0], img.shape[1]
    ch, cw = crop_size
    y = (H - ch) // 2
    x = (W - cw) // 2
    return (lax.dynamic_slice(img, (y, x, 0), (ch, cw, img.shape[2])),
            lax.dynamic_slice(lab, (y, x), (ch, cw)))


def random_crop_2d(img, lab, key, crop_size):
    H, W = img.shape[0], img.shape[1]
    ch, cw = crop_size
    ky, kx = jax.random.split(key)
    y = jax.random.randint(ky, (), 0, max(H - ch, 1))
    x = jax.random.randint(kx, (), 0, max(W - cw, 1))
    return (lax.dynamic_slice(img, (y, x, 0), (ch, cw, img.shape[2])),
            lax.dynamic_slice(lab, (y, x), (ch, cw)))


def crop_around_coordinate_3d(img, lab, key, crop_size, coordinate,
                              mode: str = "random"):
    """augmentation.py:346-382 — crop containing/near a given (z, y, x) point.

    'random': start ~ randint over the clamped neighbourhood of the point;
    'center': start places the point at the crop center (clamped in-bounds).
    ``coordinate`` may be traced (e.g. a sampled foreground voxel).
    """
    D, H, W = img.shape[0], img.shape[1], img.shape[2]
    cd, ch, cw = crop_size
    z, y, x = coordinate
    ks = jax.random.split(key, 3)
    starts = []
    for i, (p, c, s, k) in enumerate(zip((z, y, x), (cd, ch, cw),
                                         (D, H, W), ks)):
        if mode == "random":
            lo = jnp.maximum(0, p - c)
            hi = jnp.minimum(s - c, p + c)
            hi = jnp.maximum(hi, lo + 1)
            u = jax.random.randint(k, (), 0, 1 << 30)
            starts.append(lo + u % (hi - lo))
        else:
            lo = jnp.maximum(0, p - (c + 1) // 2)
            starts.append(jnp.minimum(lo, s - c))
    return (lax.dynamic_slice(img, (*starts, 0), (cd, ch, cw, img.shape[3])),
            lax.dynamic_slice(lab, tuple(starts), (cd, ch, cw)))


def maybe(op, prob: float):
    """Per-sample Bernoulli gate around an image-only op (AMOS-style gates,
    reference dataset_amos_ct.py:141-153).  Returns fn(img, key)."""
    def gated(img, key):
        kgate, kop = jax.random.split(key)
        apply = jax.random.bernoulli(kgate, prob)
        return jnp.where(apply, op(img, kop), img)
    return gated
