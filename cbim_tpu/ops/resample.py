"""Affine grid resampling with exact ``F.affine_grid`` / ``F.grid_sample``
semantics (align_corners=True, padding_mode='zeros'), as used by the
reference's affine augmentation (training/augmentation.py:287-289, 219-222).

Design: instead of materialising a grid tensor and calling a sampler op (the
CUDA path), we compute the sample coordinates analytically from the affine
matrix and do one gather per interpolation corner.  XLA fuses the coordinate
math and the corner-weight blending into the gathers, so the whole resample is
a handful of fused HBM passes — the TPU-native equivalent of grid_sample.

Coordinate convention (torch): for a 3D volume the normalized coordinate
vector is (x, y, z) = (W-axis, H-axis, D-axis); ``theta`` is a (3, 4) matrix
mapping *output* normalized coords to *input* normalized coords:
``[x_in, y_in, z_in] = theta @ [x_out, y_out, z_out, 1]``.
With align_corners=True, pixel i maps to -1 + 2*i/(size-1).

The reference constructs theta with rows it labels (z, y, x) but feeds it to
affine_grid, whose rows are (x, y, z) — we reproduce the reference's *actual*
behavior, so thetas built by :mod:`cbim_tpu.ops.augment` drop in unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _normalized_coords(size: int) -> jax.Array:
    """align_corners=True: pixel i -> -1 + 2i/(size-1) (or 0 if size==1)."""
    if size == 1:
        return jnp.zeros((1,), dtype=jnp.float32)
    return jnp.linspace(-1.0, 1.0, size, dtype=jnp.float32)


def _unnormalize(coord: jax.Array, size: int) -> jax.Array:
    """Normalized [-1, 1] -> pixel index in [0, size-1] (align_corners=True)."""
    return (coord + 1.0) * (size - 1) / 2.0


def affine_sample_3d(img: jax.Array, lab: jax.Array, theta: jax.Array,
                     label_nearest: bool = True, out_shape=None,
                     out_offset=None):
    """Resample one volume pair through an affine map.

    img: (D, H, W, C) float; lab: (D, H, W) int; theta: (3, 4) float32.
    Returns (img_out, lab_out); out-of-range samples are 0.

    ``out_shape``/``out_offset`` restrict the computed output to a sub-box of
    the full output grid (coordinates still normalized over the FULL input
    extent) — exactly equivalent to resampling everything and then slicing
    ``out[off:off+shape]``, at a fraction of the gather work.  This is how
    the training pipeline fuses its center crop into the resample.
    """
    D, H, W = img.shape[0], img.shape[1], img.shape[2]
    if out_shape is None:
        out_shape = (D, H, W)
    if out_offset is None:
        out_offset = tuple((full - o) // 2 for full, o in
                           zip((D, H, W), out_shape))

    def coords(size, out_size, off):
        full = _normalized_coords(size)
        return jax.lax.dynamic_slice_in_dim(full, off, out_size)

    zs = coords(D, out_shape[0], out_offset[0])
    ys = coords(H, out_shape[1], out_offset[1])
    xs = coords(W, out_shape[2], out_offset[2])

    # output grid, broadcast to out_shape
    z = zs[:, None, None]
    y = ys[None, :, None]
    x = xs[None, None, :]

    theta = theta.astype(jnp.float32)
    sx = theta[0, 0] * x + theta[0, 1] * y + theta[0, 2] * z + theta[0, 3]
    sy = theta[1, 0] * x + theta[1, 1] * y + theta[1, 2] * z + theta[1, 3]
    sz = theta[2, 0] * x + theta[2, 1] * y + theta[2, 2] * z + theta[2, 3]

    fx = _unnormalize(sx, W)
    fy = _unnormalize(sy, H)
    fz = _unnormalize(sz, D)

    img_out = _trilinear_gather(img, fz, fy, fx)
    if label_nearest:
        lab_out = _nearest_gather(lab, fz, fy, fx)
    else:
        lab_out = _trilinear_gather(lab[..., None].astype(img.dtype), fz, fy, fx)[..., 0]
    return img_out, lab_out


def _flat_gather(flat_src: jax.Array, iz, iy, ix, D, H, W):
    """Gather (..., C) values at integer voxel coords, clipped for safety."""
    izc = jnp.clip(iz, 0, D - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    ixc = jnp.clip(ix, 0, W - 1)
    lin = (izc * H + iyc) * W + ixc
    return jnp.take(flat_src, lin.reshape(-1), axis=0).reshape(*iz.shape, -1)


def _trilinear_gather(src: jax.Array, fz, fy, fx) -> jax.Array:
    """Trilinear interpolation with zero padding outside [0, size-1].

    Two lowerings of the same arithmetic (identical corner weights and
    validity masks; results differ only in fp summation order):

    - CPU/GPU: 8 element-gathers (one per interpolation corner).
    - TPU: XLA's gather costs ~tens of ns per INDEX regardless of slice
      width, so 8 scalar gathers waste 2x the index budget.  Instead gather
      the 4 (z, y) corner ROWS along the contiguous minor axis with
      ``jnp.take`` and contract each row against a 2-hot lane-weight vector
      ((1-wx) at ix, wx at ix+1) on the VPU — 4 gathers instead of 8 and
      every fetch is lane-contiguous (measured 1.5x faster end-to-end on
      v5e; lax.gather with explicit slice_sizes is 50x SLOWER there, do not
      "simplify" to it).
    """
    from ._backend import is_tpu_backend
    if is_tpu_backend():
        return _trilinear_gather_rows(src, fz, fy, fx)
    D, H, W = src.shape[0], src.shape[1], src.shape[2]
    C = src.shape[3]
    flat = src.reshape(D * H * W, C)

    z0 = jnp.floor(fz).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    wz = (fz - z0.astype(fz.dtype))
    wy = (fy - y0.astype(fy.dtype))
    wx = (fx - x0.astype(fx.dtype))

    out = jnp.zeros((*fz.shape, C), dtype=jnp.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                iz, iy, ix = z0 + dz, y0 + dy, x0 + dx
                w = (jnp.where(dz, wz, 1.0 - wz)
                     * jnp.where(dy, wy, 1.0 - wy)
                     * jnp.where(dx, wx, 1.0 - wx))
                valid = ((iz >= 0) & (iz < D) & (iy >= 0) & (iy < H)
                         & (ix >= 0) & (ix < W))
                vals = _flat_gather(flat, iz, iy, ix, D, H, W)
                out = out + (w * valid)[..., None].astype(jnp.float32) * vals.astype(jnp.float32)
    return out.astype(src.dtype)


def _trilinear_gather_rows(src: jax.Array, fz, fy, fx) -> jax.Array:
    """TPU lowering of :func:`_trilinear_gather` (see its docstring)."""
    D, H, W = src.shape[0], src.shape[1], src.shape[2]
    C = src.shape[3]
    rows_src = src.reshape(D * H, W * C)

    z0 = jnp.floor(fz).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    wz = (fz - z0.astype(fz.dtype)).astype(jnp.float32)
    wy = (fy - y0.astype(fy.dtype)).astype(jnp.float32)
    wx = (fx - x0.astype(fx.dtype)).astype(jnp.float32)

    shp = fz.shape
    n = int(np.prod(shp)) if shp else 1
    z0f = z0.reshape(n)
    y0f = y0.reshape(n)
    x0f = x0.reshape(n)
    wzf = wz.reshape(n)
    wyf = wy.reshape(n)
    wxf = wx.reshape(n)

    lanes = jnp.arange(W)[None, :]
    # 2-hot x weights; lanes outside [0, W-1] simply never match (zeros pad)
    wvec = (jnp.where(lanes == x0f[:, None], 1.0 - wxf[:, None], 0.0)
            + jnp.where(lanes == x0f[:, None] + 1, wxf[:, None], 0.0))

    out = jnp.zeros((n, C), jnp.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            iz, iy = z0f + dz, y0f + dy
            valid = ((iz >= 0) & (iz < D) & (iy >= 0) & (iy < H))
            r = jnp.clip(iz, 0, D - 1) * H + jnp.clip(iy, 0, H - 1)
            rows = jnp.take(rows_src, r, axis=0).reshape(n, W, C)
            w_zy = (jnp.where(dz, wzf, 1.0 - wzf)
                    * jnp.where(dy, wyf, 1.0 - wyf) * valid)
            vals = jnp.einsum("nwc,nw->nc", rows.astype(jnp.float32), wvec,
                              preferred_element_type=jnp.float32)
            out = out + w_zy[:, None] * vals
    return out.reshape(*shp, C).astype(src.dtype)


def _affine_coords_3d(theta, D, H, W, out_shape, out_offset):
    """Sample coordinates (fz, fy, fx) of the affine output sub-box."""
    def coords(size, out_size, off):
        return jax.lax.dynamic_slice_in_dim(_normalized_coords(size), off,
                                            out_size)
    zs = coords(D, out_shape[0], out_offset[0])
    ys = coords(H, out_shape[1], out_offset[1])
    xs = coords(W, out_shape[2], out_offset[2])
    z = zs[:, None, None]
    y = ys[None, :, None]
    x = xs[None, None, :]
    theta = theta.astype(jnp.float32)
    sx = theta[0, 0] * x + theta[0, 1] * y + theta[0, 2] * z + theta[0, 3]
    sy = theta[1, 0] * x + theta[1, 1] * y + theta[1, 2] * z + theta[1, 3]
    sz = theta[2, 0] * x + theta[2, 1] * y + theta[2, 2] * z + theta[2, 3]
    return _unnormalize(sz, D), _unnormalize(sy, H), _unnormalize(sx, W)


def _affine_coords_3d_fullvol(theta, extent, place, out_offset, out_shape):
    """Coords with the grid normalized over a traced per-sample TRUE extent
    (the reference's full-volume ``F.affine_grid`` semantics,
    augmentation.py:287-289) for a volume placed at ``place`` inside a
    zero-padded cache array.

    extent: (3,) true (D, H, W) of this sample; place: (3,) placement offset
    of the volume inside the cache; out_offset: (3,) crop start in VOLUME
    coords (the reference's post-affine ``crop_3d`` start).  Returned coords
    are in CACHE voxel space: the caller gathers from the padded cache, and
    any sample outside the true extent lands on cache zeros — exactly
    ``grid_sample(padding_mode='zeros')``.
    """
    extent = extent.astype(jnp.float32)
    off = out_offset.astype(jnp.float32)
    place = place.astype(jnp.float32)

    def axis(i, out_size):
        s = extent[i]
        o = off[i] + jnp.arange(out_size, dtype=jnp.float32)
        # align_corners=True; size==1 -> normalized coordinate 0
        return jnp.where(s > 1, -1.0 + 2.0 * o / jnp.maximum(s - 1.0, 1.0),
                         0.0)

    z = axis(0, out_shape[0])[:, None, None]
    y = axis(1, out_shape[1])[None, :, None]
    x = axis(2, out_shape[2])[None, None, :]
    theta = theta.astype(jnp.float32)
    sx = theta[0, 0] * x + theta[0, 1] * y + theta[0, 2] * z + theta[0, 3]
    sy = theta[1, 0] * x + theta[1, 1] * y + theta[1, 2] * z + theta[1, 3]
    sz = theta[2, 0] * x + theta[2, 1] * y + theta[2, 2] * z + theta[2, 3]
    fz = (sz + 1.0) * (extent[0] - 1.0) / 2.0 + place[0]
    fy = (sy + 1.0) * (extent[1] - 1.0) / 2.0 + place[1]
    fx = (sx + 1.0) * (extent[2] - 1.0) / 2.0 + place[2]
    return fz, fy, fx


def affine_sample_3d_fullvol_batch(img, lab, theta, extents, out_offsets,
                                   place, out_shape,
                                   num_classes: int | None = None):
    """Batched affine resample with FULL-VOLUME grid semantics from a padded
    cache: img (B, Dc, Hc, Wc, C) zero-padded cache rows, lab (B, Dc, Hc, Wc),
    theta (B, 3, 4), extents (B, 3) true per-sample shapes, out_offsets
    (B, 3) per-sample crop starts in volume coords, place (3,) static
    placement offset (the cache margins) -> (img (B, *out_shape, C), lab).

    Exactly the reference's affine-full-volume-then-random-crop
    (dataset_acdc.py:141-149 + crop_3d), evaluated only on the cropped
    sub-box.  Requires at least one zero voxel of margin OR zero padding on
    the high side of every axis in the cache (the pipeline's cache builder
    guarantees this) so that out-of-volume interpolation reads zeros.
    """
    place = jnp.asarray(place)
    fz, fy, fx = jax.vmap(
        lambda t, e, o: _affine_coords_3d_fullvol(t, e, place, o, out_shape)
    )(theta, extents, out_offsets)

    from ._backend import is_tpu_backend
    if is_tpu_backend():
        bound = _exact_int_bound(img.dtype)
        ok = (num_classes is not None and num_classes - 1 <= bound) or \
            (num_classes is None and bound >= 2 ** 23)
        if ok:
            return _tiled_gather_3d(img, lab, fz, fy, fx, out_shape)

    def one(im, lb, z, y, x):
        return (_trilinear_gather(im, z, y, x), _nearest_gather(lb, z, y, x))

    return jax.vmap(one)(img, lab, fz, fy, fx)


import os as _os

# x-tile width of the tiled lowering (gather row = 4*2*_TILE*(C+1) lanes).
# Smaller tiles fetch fewer wasted lanes per output voxel (the interpolation
# uses 2 x-lanes of the 2*_TILE fetched) at the cost of a denser pair table;
# env-tunable (tools/probe_aug_tile.py).  Measured on v5e, B=4 158^3->128^3,
# bit-identical outputs: T=8 165 ms, T=4 139 ms -> default 4.
try:
    _TILE = int(_os.environ.get("CBIM_AUG_TILE", "4"))
except ValueError:  # malformed env value must not break import
    import warnings as _warnings
    _warnings.warn("CBIM_AUG_TILE=%r is not an int; using 4"
                   % _os.environ.get("CBIM_AUG_TILE"))
    _TILE = 4


def _exact_int_bound(dtype) -> int:
    """Largest n such that all ints in [0, n] are exact in ``dtype``."""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.integer):
        return int(jnp.iinfo(dtype).max)
    return 2 ** jnp.finfo(dtype).nmant


def affine_sample_3d_batch(img, lab, theta, label_nearest: bool = True,
                           out_shape=None, out_offset=None,
                           num_classes: int | None = None):
    """Batched :func:`affine_sample_3d`: img (B,D,H,W,C), lab (B,D,H,W),
    theta (B,3,4) -> (img_out (B,*out,C), lab_out (B,*out)).

    On TPU (with nearest labels) this dispatches to the tile-pair quad-row
    lowering (:func:`_affine_sample_3d_tiled`), which computes the identical
    interpolation ~4x faster than per-sample gathers; elsewhere it vmaps the
    per-sample path.

    The tiled lowering rides the label plane in the image dtype, which is
    exact only while every class id is representable (<=256 for bf16).
    Callers with a narrow image dtype must pass ``num_classes`` so the
    precondition is enforced at trace time; with no hint and a narrow dtype
    the safe vmapped path is used instead.
    """
    from ._backend import is_tpu_backend
    if is_tpu_backend() and label_nearest:
        bound = _exact_int_bound(img.dtype)
        if num_classes is not None:
            if num_classes - 1 > bound:
                raise ValueError(
                    f"label ids up to {num_classes - 1} are not exactly "
                    f"representable in image dtype {img.dtype}; use a wider "
                    "image dtype for the augmentation pipeline")
            ok = True
        else:
            # no hint: only trust genuinely wide dtypes (f32 mantissa covers
            # any realistic class count)
            ok = bound >= 2 ** 23
        if ok:
            return _affine_sample_3d_tiled(img, lab, theta, out_shape,
                                           out_offset)
    from functools import partial
    f = partial(affine_sample_3d, label_nearest=label_nearest,
                out_shape=out_shape, out_offset=out_offset)
    return jax.vmap(f)(img, lab, theta)


def _affine_sample_3d_tiled(img, lab, theta, out_shape=None, out_offset=None):
    """Single-gather TPU lowering of the batched affine resample.

    The per-sample lowerings above spend their time in gather *bytes*: each
    of the 8 interpolation corners (or 4 corner rows) re-fetches a full
    W-lane row to use 1-2 lanes of it.  Here the source is re-laid-out once
    per call so that ONE flat gather fetches exactly the data every output
    voxel needs:

    - x axis split into tiles of ``_TILE`` lanes; consecutive-tile PAIRS are
      materialised (sentinel zero tiles at both ends), so the two x corners
      ``x0, x0+1`` always live in one row segment — and every x out-of-range
      case lands on a zero sentinel lane, needing no mask;
    - the label plane rides in the same tile (cast to the image dtype —
      exact for <=256 classes), so the nearest-neighbour label sample comes
      from the same gather via a one-hot contraction (round-half-to-even,
      matching ``jnp.rint`` / torch nearest);
    - the 4 (z,y) corner rows are materialised as 4 concatenated slabs of a
      (H+1)-padded row table, so ``r, r+1, r+H, r+H+1`` collapse into a
      single row index (out-of-range z/y corners are zeroed by the corner
      weights, exactly as in the gather paths above);
    - the batch dim is folded into the row index: one flat gather for the
      whole batch (XLA's batched gather lowers much worse than a flat one).

    The relaid table is ~(8*(C+1)/C)x the source volume in bytes — built in
    one cheap bandwidth pass, dwarfed by the gather traffic it saves.  The
    gathered rows are 4*2*_TILE*(C+1) lanes (=256 B for C=1 in bf16), i.e.
    only the needed corner data moves through HBM.  Measured on v5e at
    128^3 out / 158^3 src / B=2: 60 ms vs 228 ms for the row-gather path,
    bit-identical outputs.
    """
    B, D, H, W = img.shape[0], img.shape[1], img.shape[2], img.shape[3]
    if out_shape is None:
        out_shape = (D, H, W)
    if out_offset is None:
        out_offset = tuple((full - o) // 2 for full, o in
                           zip((D, H, W), out_shape))

    fz, fy, fx = jax.vmap(
        lambda t: _affine_coords_3d(t, D, H, W, out_shape, out_offset))(theta)
    return _tiled_gather_3d(img, lab, fz, fy, fx, out_shape)


def _tiled_gather_3d(img, lab, fz, fy, fx, out_shape):
    """The gather half of :func:`_affine_sample_3d_tiled`: interpolate
    img/lab at per-sample fractional source coords (fz, fy, fx), each
    (B, *out_shape), via the tile-pair quad-row table."""
    B, D, H, W = img.shape[0], img.shape[1], img.shape[2], img.shape[3]
    C = img.shape[4]
    T = _TILE
    n = int(np.prod(out_shape))
    fz = fz.reshape(B, n)
    fy = fy.reshape(B, n)
    fx = fx.reshape(B, n)

    # ---- build the tile-pair quad-row table --------------------------------
    Wp = -(-W // T) * T
    ntx = Wp // T
    src = jnp.concatenate([img, lab[..., None].astype(img.dtype)], axis=-1)
    if Wp != W:
        src = jnp.pad(src, ((0, 0),) * 3 + ((0, Wp - W), (0, 0)))
    P = T * (C + 1)
    tiles = src.reshape(B, D * H, ntx, P)
    tiles = jnp.pad(tiles, ((0, 0), (0, 0), (1, 1), (0, 0)))   # x sentinels
    pairs = jnp.concatenate([tiles[:, :, :-1], tiles[:, :, 1:]], axis=3)
    pairs = jnp.pad(pairs, ((0, 0), (H + 1, H + 1), (0, 0), (0, 0)))
    L = D * H + H + 1
    quad = jnp.concatenate([pairs[:, 0:L], pairs[:, 1:L + 1],
                            pairs[:, H:L + H], pairs[:, H + 1:L + H + 1]],
                           axis=3)                       # (B, L, ntx+1, 8P)
    quad = quad.reshape(B * L * (ntx + 1), 8 * P)

    # ---- indices & weights --------------------------------------------------
    z0 = jnp.floor(fz).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    wz = (fz - z0).astype(jnp.float32)
    wy = (fy - y0).astype(jnp.float32)
    wx = (fx - x0).astype(jnp.float32)

    zc = jnp.clip(z0, -1, D - 1)
    yc = jnp.clip(y0, -1, H - 1)
    tx = jnp.clip(jnp.floor_divide(x0, T), -1, ntx - 1)
    q = zc * H + yc + (H + 1)
    r = ((jnp.arange(B) * L)[:, None] + q) * (ntx + 1) + (tx + 1)

    vz0 = (z0 >= 0) & (z0 < D)
    vz1 = (z0 + 1 >= 0) & (z0 + 1 < D)
    vy0 = (y0 >= 0) & (y0 < H)
    vy1 = (y0 + 1 >= 0) & (y0 + 1 < H)
    wk = jnp.stack([(1 - wz) * (1 - wy) * (vz0 & vy0),
                    (1 - wz) * wy * (vz0 & vy1),
                    wz * (1 - wy) * (vz1 & vy0),
                    wz * wy * (vz1 & vy1)], axis=2)      # (B, n, 4)

    def half_even_up(w, base):
        # matches jnp.rint / torch nearest (round half to even)
        return (w > 0.5) | ((w == 0.5) & (base % 2 != 0))
    szu = half_even_up(wz, z0)
    syu = half_even_up(wy, y0)
    sxu = half_even_up(wx, x0)
    zn = z0 + szu
    yn = y0 + syu
    xn = x0 + sxu
    vn = ((zn >= 0) & (zn < D) & (yn >= 0) & (yn < H)
          & (xn >= 0) & (xn < W)).astype(jnp.float32)
    k_oh = jnp.stack([(~szu & ~syu), (~szu & syu), (szu & ~syu), (szu & syu)],
                     axis=2).astype(jnp.float32) * vn[..., None]

    # ---- one flat gather + fused weighted reduce ---------------------------
    m = B * n
    g = jnp.take(quad, r.reshape(m), axis=0).reshape(m, 4, 2 * P)
    gi = g[:, :, :].reshape(m, 4, 2, T, C + 1)
    glab = gi[..., C]                                    # (m, 4, 2, T)
    gimg = gi[..., :C]
    xi = (x0 - tx * T).reshape(m)                        # lane in the pair
    lanes = jnp.arange(2 * T)[None, :]
    wv = (jnp.where(lanes == xi[:, None], 1.0 - wx.reshape(m)[:, None], 0.0)
          + jnp.where(lanes == xi[:, None] + 1, wx.reshape(m)[:, None], 0.0))
    xin = xi + sxu.reshape(m)
    x_oh = (lanes == xin[:, None]).astype(jnp.float32)

    wkf = wk.reshape(m, 4)
    img_out = (gimg.reshape(m, 4, 2 * T, C).astype(jnp.float32)
               * wkf[:, :, None, None] * wv[:, None, :, None]).sum((1, 2))
    lab_out = (glab.reshape(m, 4, 2 * T).astype(jnp.float32)
               * k_oh.reshape(m, 4)[:, :, None] * x_oh[:, None, :]).sum((1, 2))
    return (img_out.reshape(B, *out_shape, C).astype(img.dtype),
            jnp.rint(lab_out).reshape(B, *out_shape).astype(lab.dtype))


def _nearest_gather(lab: jax.Array, fz, fy, fx) -> jax.Array:
    """Nearest-neighbour sampling; out-of-range -> 0 (zeros padding).

    torch grid_sample 'nearest' uses round-half-to-even (std::nearbyint);
    jnp.rint matches.
    """
    D, H, W = lab.shape
    iz = jnp.rint(fz).astype(jnp.int32)
    iy = jnp.rint(fy).astype(jnp.int32)
    ix = jnp.rint(fx).astype(jnp.int32)
    valid = ((iz >= 0) & (iz < D) & (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W))
    vals = _flat_gather(lab.reshape(D * H * W, 1), iz, iy, ix, D, H, W)[..., 0]
    return jnp.where(valid, vals, 0).astype(lab.dtype)


def affine_sample_2d(img: jax.Array, lab: jax.Array, theta: jax.Array,
                     label_nearest: bool = True, out_shape=None,
                     out_offset=None):
    """2D twin of :func:`affine_sample_3d`.

    img: (H, W, C); lab: (H, W); theta: (2, 3), rows (x, y) = (W, H axes).
    """
    H, W = img.shape[0], img.shape[1]
    if out_shape is None:
        out_shape = (H, W)
    if out_offset is None:
        out_offset = tuple((full - o) // 2 for full, o in
                           zip((H, W), out_shape))
    ys = jax.lax.dynamic_slice_in_dim(_normalized_coords(H), out_offset[0],
                                      out_shape[0])
    xs = jax.lax.dynamic_slice_in_dim(_normalized_coords(W), out_offset[1],
                                      out_shape[1])
    y = ys[:, None]
    x = xs[None, :]

    theta = theta.astype(jnp.float32)
    sx = theta[0, 0] * x + theta[0, 1] * y + theta[0, 2]
    sy = theta[1, 0] * x + theta[1, 1] * y + theta[1, 2]
    fx = _unnormalize(sx, W)
    fy = _unnormalize(sy, H)

    img_out = _bilinear_gather_2d(img, fy, fx)
    if label_nearest:
        lab_out = _nearest_gather_2d(lab, fy, fx)
    else:
        lab_out = _bilinear_gather_2d(lab[..., None].astype(img.dtype), fy, fx)[..., 0]
    return img_out, lab_out


def _nearest_gather_2d(lab: jax.Array, fy, fx) -> jax.Array:
    """Nearest-neighbour label gather at fractional coords; out-of-range -> 0
    (torch grid_sample padding_mode='zeros' semantics for labels)."""
    H, W = lab.shape
    iy = jnp.rint(fy).astype(jnp.int32)
    ix = jnp.rint(fx).astype(jnp.int32)
    valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    lin = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    vals = jnp.take(lab.reshape(-1), lin.reshape(-1)).reshape(iy.shape)
    return jnp.where(valid, vals, 0).astype(lab.dtype)


def _bilinear_gather_2d(src: jax.Array, fy, fx) -> jax.Array:
    H, W, C = src.shape
    flat = src.reshape(H * W, C)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    wy = fy - y0.astype(fy.dtype)
    wx = fx - x0.astype(fx.dtype)
    out = jnp.zeros((*fy.shape, C), dtype=jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            iy, ix = y0 + dy, x0 + dx
            w = jnp.where(dy, wy, 1.0 - wy) * jnp.where(dx, wx, 1.0 - wx)
            valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
            lin = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
            vals = jnp.take(flat, lin.reshape(-1), axis=0).reshape(*iy.shape, C)
            out = out + (w * valid)[..., None].astype(jnp.float32) * vals.astype(jnp.float32)
    return out.astype(src.dtype)
