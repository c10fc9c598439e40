"""Evaluation metrics: on-device Dice, host-side surface distances (ASD/HD95).

- ``dice_per_class`` / ``dice_per_class_split`` mirror the reference's
  metric/utils.py:62-82 (``calculate_dice``) and :33-52
  (``calculate_dice_split``): one-hot scatter over flattened voxels,
  2*intersection / (sum + 1e-5) per class.  On TPU a single fused one_hot +
  segment-sum runs fully on device; the ``_split`` variant exists for API
  parity and for bounding memory on very large volumes.

- ``calculate_distance`` mirrors metric/utils.py:8-29: per-class average
  symmetric surface distance and robust (percentile) Hausdorff.  The EDT has
  no XLA primitive, so this runs on host (the reference also runs it on CPU).
  Surfaces are extracted as ``mask ^ binary_erosion(mask)`` and distances are
  read from the EDT of the opposite surface.  This is the standard voxel-based
  formulation (as used by MedPy/nnU-Net); the reference vendors DeepMind's
  surfel-area-weighted variant (metric/metrics.py:265-717) which weights each
  surface element by its marching-cubes area — values agree to sub-voxel
  scale.  Empty masks yield ``inf`` (callers clip, see validation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage


# ---------------------------------------------------------------------------
# Dice (device)
# ---------------------------------------------------------------------------

def dice_per_class(pred: jax.Array, target: jax.Array, num_classes: int):
    """Returns (dice, intersection, summ), each (C,). Matches calculate_dice."""
    pred = pred.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    pred_mask = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    target_mask = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    intersection = jnp.sum(pred_mask * target_mask, axis=0)
    summ = jnp.sum(pred_mask + target_mask, axis=0) + 1e-5
    dice = 2.0 * intersection / summ
    return dice, intersection, summ


def dice_per_class_split(pred: jax.Array, target: jax.Array, num_classes: int,
                         block_size: int = 64 * 64 * 64):
    """Chunked variant (calculate_dice_split): bit-equal totals, bounded memory."""
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    n = pred.shape[0]
    pad = (-n) % block_size
    # pad with an ignore value pair that contributes equally to both masks:
    # class 0 for both pred and target, then subtract its contribution.
    pred_p = jnp.pad(pred, (0, pad))
    target_p = jnp.pad(target, (0, pad))
    num_blocks = pred_p.shape[0] // block_size

    def body(carry, blk):
        inter_acc, sum_acc = carry
        p, t = blk
        pm = jax.nn.one_hot(p.astype(jnp.int32), num_classes, dtype=jnp.float32)
        tm = jax.nn.one_hot(t.astype(jnp.int32), num_classes, dtype=jnp.float32)
        inter_acc = inter_acc + jnp.sum(pm * tm, axis=0)
        sum_acc = sum_acc + jnp.sum(pm + tm, axis=0)
        return (inter_acc, sum_acc), None

    init = (jnp.zeros(num_classes, jnp.float32), jnp.zeros(num_classes, jnp.float32))
    (inter, summ), _ = jax.lax.scan(
        body, init,
        (pred_p.reshape(num_blocks, block_size), target_p.reshape(num_blocks, block_size)))
    # remove padding contribution (pad voxels: pred=target=0 -> inter[0]+=pad, summ[0]+=2*pad)
    inter = inter.at[0].add(-float(pad))
    summ = summ.at[0].add(-2.0 * float(pad))
    dice = 2.0 * inter / (summ + 1e-5)
    return dice, inter, summ


# ---------------------------------------------------------------------------
# Surface distances (host)
# ---------------------------------------------------------------------------

def _surface(mask: np.ndarray) -> np.ndarray:
    """Surface voxels: mask minus its erosion (6-connectivity structure)."""
    if not mask.any():
        return np.zeros_like(mask, dtype=bool)
    struct = ndimage.generate_binary_structure(mask.ndim, 1)
    eroded = ndimage.binary_erosion(mask, structure=struct, border_value=0)
    return mask & ~eroded


def surface_distances(mask_gt: np.ndarray, mask_pred: np.ndarray,
                      spacing) -> tuple[np.ndarray, np.ndarray]:
    """Distances from each GT surface voxel to the pred surface and vice versa.

    Returns (dist_gt_to_pred, dist_pred_to_gt) as 1-D arrays (possibly empty).
    """
    mask_gt = np.asarray(mask_gt, dtype=bool)
    mask_pred = np.asarray(mask_pred, dtype=bool)
    spacing = np.asarray(spacing, dtype=np.float64)

    surf_gt = _surface(mask_gt)
    surf_pred = _surface(mask_pred)

    if not surf_gt.any() or not surf_pred.any():
        empty = np.array([], dtype=np.float64)
        if not surf_gt.any() and not surf_pred.any():
            return empty, empty
        if not surf_pred.any():
            return np.full(int(surf_gt.sum()), np.inf), empty
        return empty, np.full(int(surf_pred.sum()), np.inf)

    # crop to the joint bounding box (+1 voxel margin) for speed, like the
    # reference's bbox crop (metric/metrics.py:433-461)
    union = surf_gt | surf_pred
    slices = ndimage.find_objects(union.astype(np.int8), max_label=1)[0]
    slices = tuple(slice(max(s.start - 1, 0), min(s.stop + 1, dim))
                   for s, dim in zip(slices, union.shape))
    surf_gt = surf_gt[slices]
    surf_pred = surf_pred[slices]

    dt_pred = ndimage.distance_transform_edt(~surf_pred, sampling=spacing)
    dt_gt = ndimage.distance_transform_edt(~surf_gt, sampling=spacing)

    return dt_pred[surf_gt], dt_gt[surf_pred]


def average_surface_distance(dist_gt_to_pred: np.ndarray,
                             dist_pred_to_gt: np.ndarray) -> tuple[float, float]:
    d1 = float(np.mean(dist_gt_to_pred)) if dist_gt_to_pred.size else np.inf
    d2 = float(np.mean(dist_pred_to_gt)) if dist_pred_to_gt.size else np.inf
    return d1, d2


def robust_hausdorff(dist_gt_to_pred: np.ndarray, dist_pred_to_gt: np.ndarray,
                     percent: float = 95.0) -> float:
    if dist_gt_to_pred.size == 0 or dist_pred_to_gt.size == 0:
        return np.inf
    return float(max(np.percentile(dist_gt_to_pred, percent),
                     np.percentile(dist_pred_to_gt, percent)))


def calculate_distance(label_pred, label_true, spacing, num_classes: int,
                       percentage: float = 95.0):
    """Per-class ASD and HD95 (reference metric/utils.py:8-29).

    ``label_pred`` / ``label_true`` are integer volumes (any array type);
    ``spacing`` is the (z, y, x) voxel spacing.  Returns two numpy arrays of
    length C-1 (background excluded).  NaN/inf handling (clip to 500) is done
    by the caller, matching reference training/validation.py:59-60.
    """
    label_pred = np.asarray(label_pred)
    label_true = np.asarray(label_true)
    spacing = np.asarray(spacing, dtype=np.float64)

    asd = np.zeros(num_classes - 1)
    hd = np.zeros(num_classes - 1)
    for i in range(num_classes - 1):
        d_gt, d_pred = surface_distances(label_true == (i + 1),
                                         label_pred == (i + 1), spacing)
        a1, a2 = average_surface_distance(d_gt, d_pred)
        asd[i] = (a1 + a2) / 2.0
        hd[i] = robust_hausdorff(d_gt, d_pred, percentage)
    return asd, hd
