"""Offline conversion ops (reference dataset_conversion/utils.py).

The reference uses SimpleITK: ``ResampleXYZAxis`` (two-stage XY-then-Z
resample, BSpline for images / NN for labels), ``ResampleLabelToRef``,
``ITKReDirection`` and ``CropForeground``.  SimpleITK isn't available in this
image, so the equivalents are scipy-based and operate on (z, y, x) numpy
arrays + spacings.  Cubic-spline interpolation (scipy order=3, prefiltered)
matches sitkBSpline's interpolation family; nearest (order=0) for labels.

These run on host, offline — not a TPU concern (SURVEY §2.2).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def resample_to_spacing(img: np.ndarray, spacing, target_spacing,
                        order: int = 3) -> np.ndarray:
    """Resample (z, y, x) volume from ``spacing`` to ``target_spacing``.

    Output size per axis: round(size * spacing / target) like ITK's
    ceil-based size computation in the reference (ResampleXYZAxis computes
    size * spacing / target, cast to int via rounding behavior of .GetSize).
    """
    spacing = np.asarray(spacing, np.float64)
    target = np.asarray(target_spacing, np.float64)
    out_shape = tuple(int(round(s * sp / tp))
                      for s, sp, tp in zip(img.shape, spacing, target))
    return resample_to_shape(img, out_shape, order=order)


def resample_to_shape(img: np.ndarray, out_shape, order: int = 3) -> np.ndarray:
    """Resample a volume to an exact output shape."""
    if tuple(img.shape) == tuple(out_shape):
        return np.ascontiguousarray(img)
    zoom = [o / s for o, s in zip(out_shape, img.shape)]
    dtype = img.dtype
    out = ndimage.zoom(img.astype(np.float32), zoom, order=order,
                       mode="nearest", grid_mode=False)
    # zoom can be off by one voxel on some axes; pad/crop to exact shape
    slices = tuple(slice(0, min(a, b)) for a, b in zip(out.shape, out_shape))
    result = np.zeros(out_shape, np.float32)
    result[slices] = out[slices]
    if order == 0:
        return result.astype(dtype)
    return result.astype(np.float32)


def resample_label_to_shape(lab: np.ndarray, out_shape) -> np.ndarray:
    """Nearest-neighbour label resample (ResampleLabelToRef equivalent)."""
    return resample_to_shape(lab, out_shape, order=0)


def reorient_to_ras(data: np.ndarray, affine: np.ndarray):
    """Flip/permute axes so the affine's rotation part is axis-aligned with
    positive diagonal — the equivalent of ITKReDirection
    (dataset_conversion/utils.py:37-64) which normalizes image direction.

    Returns (data, new_affine).
    """
    rot = affine[:3, :3]
    # dominant axis per world dim
    perm = np.argmax(np.abs(rot), axis=1)
    if len(set(perm.tolist())) != 3:
        return data, affine           # degenerate; leave unchanged
    # data is (z, y, x) = reversed world order; work in (x, y, z) index space
    data_xyz = np.transpose(data, (2, 1, 0))
    data_xyz = np.transpose(data_xyz, perm)
    new_rot = rot[:, perm]
    flips = []
    for i in range(3):
        if new_rot[i, i] < 0:
            flips.append(i)
    if flips:
        data_xyz = np.flip(data_xyz, axis=tuple(flips))
    new_affine = affine.copy()
    new_affine[:3, :3] = np.abs(np.diag(np.diag(new_rot)))
    return np.ascontiguousarray(np.transpose(data_xyz, (2, 1, 0))), new_affine


def CropForeground(img: np.ndarray, lab: np.ndarray, context_size=(10, 30, 30)):
    """Crop to the label bounding box + context margin
    (dataset_conversion/utils.py:67-108)."""
    assert img.shape == lab.shape
    fg = lab > 0
    if not fg.any():
        return img, lab
    idx = np.where(fg)
    starts, ends = [], []
    for ax in range(3):
        lo = max(0, int(idx[ax].min()) - context_size[ax])
        hi = min(img.shape[ax], int(idx[ax].max()) + 1 + context_size[ax])
        starts.append(lo)
        ends.append(hi)
    sl = tuple(slice(lo, hi) for lo, hi in zip(starts, ends))
    return np.ascontiguousarray(img[sl]), np.ascontiguousarray(lab[sl])
