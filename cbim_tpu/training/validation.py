"""Validation loop (reference training/validation.py:16-87).

Per test volume: inference (whole-image or sliding-window), argmax, per-class
Dice on the full volume, ASD/HD95 on host, missing-class filtering, NaN->500
clipping.  2D models evaluate a volume by batching its slices
(validation.py:39-40).

Dice here is computed with a host-side confusion bincount — bit-exact w.r.t.
the reference's one-hot formulation and immune to XLA recompiles across the
many distinct test-volume shapes.
"""

from __future__ import annotations

import logging

import numpy as np

from ..inference.engines import make_engine
from ..ops.metrics import calculate_distance


def dice_from_confusion(pred: np.ndarray, target: np.ndarray, num_classes: int):
    """2*|P∩T| / (|P|+|T| + 1e-5) per class (reference metric/utils.py:62-82)."""
    pred = pred.reshape(-1).astype(np.int64)
    target = target.reshape(-1).astype(np.int64)
    inter = np.bincount(pred[pred == target], minlength=num_classes)[:num_classes]
    p_count = np.bincount(pred, minlength=num_classes)[:num_classes]
    t_count = np.bincount(target, minlength=num_classes)[:num_classes]
    return 2.0 * inter / (p_count + t_count + 1e-5)


def filter_validation_results(dice, asd, hd, cfg):
    """amos_mr's validation set lacks the last two organs (training/utils.py:43-48)."""
    if cfg.dataset == "amos_mr":
        return dice[:-2], asd[:-2], hd[:-2]
    return dice, asd, hd


def validate(model, variables, testset, cfg, compute_distance: bool = True,
             mesh=None, engine=None):
    """Returns (dice, asd, hd) arrays of length classes-1 (background excluded).

    Multi-host: each process evaluates a strided subset of the test volumes
    and per-class sums are reduced with a host allgather — the GSPMD
    equivalent of the reference's DistributedSampler + concat_all_gather +
    padding-pop machinery (training/utils.py:110-145, validation.py:173-185),
    without the padding bookkeeping (missing-class filtering already makes
    per-class counts explicit).

    ``mesh``: when given (and it has >1 device on its 'data' axis), 3D
    sliding-window inference shards the window sweep across the mesh —
    per-VOLUME multi-chip parallelism, instead of (or in addition to) the
    per-volume process striding above.
    """
    # variables ride the engine's compiled programs as traced arguments, so a
    # caller-held engine (trainer.py keeps one per fold) swaps weights each
    # eval epoch without re-tracing or recompiling
    if engine is None:
        engine = make_engine(model, variables, cfg)
    else:
        engine.set_variables(variables)
    C = cfg.classes
    shard_windows = (mesh is not None and "data" in getattr(mesh, "shape", {})
                     and mesh.shape["data"] > 1)

    dice_acc = [[] for _ in range(C - 1)]
    asd_acc = [[] for _ in range(C - 1)]
    hd_acc = [[] for _ in range(C - 1)]

    import jax
    n_proc = jax.process_count()
    proc = jax.process_index()

    logging.info("Evaluating (%d volumes)", len(testset))
    for idx in range(len(testset)):
        if n_proc > 1 and idx % n_proc != proc:
            continue
        img, lab, spacing = testset.test_item(idx)

        if cfg.dimension == "2d":
            # slices become the batch dim (validation.py:39-40)
            inputs = np.asarray(img, np.float32)[..., None]       # (D, H, W, 1)
            if cfg.sliding_window and shard_windows:
                probs = engine.sliding_window_slices_sharded(inputs, mesh)
            elif cfg.sliding_window:
                # 2D window sweep (reference inference2d.py:27-71)
                probs = engine.sliding_window_slices(inputs)
            elif shard_windows:
                probs = engine.whole_image_sharded(inputs, mesh)  # (D, H, W, C)
            else:
                probs = engine.whole_image(inputs)
            pred = np.asarray(probs).argmax(-1)                   # (D, H, W)
        else:
            inputs = np.asarray(img, np.float32)[None, ..., None]  # (1,D,H,W,1)
            if cfg.sliding_window and shard_windows:
                probs = engine.sliding_window_sharded(inputs, mesh)
            elif cfg.sliding_window:
                probs = engine.sliding_window(inputs)
            else:
                probs = engine.whole_image(inputs)
            pred = np.asarray(probs)[0].argmax(-1)

        lab = np.asarray(lab)
        if compute_distance:
            tmp_asd, tmp_hd = calculate_distance(pred, lab, spacing, C)
        else:
            tmp_asd = np.zeros(C - 1)
            tmp_hd = np.zeros(C - 1)
        # NaN/inf -> 500 clip (validation.py:59-60)
        tmp_asd = np.clip(np.nan_to_num(tmp_asd, nan=500, posinf=500), 0, 500)
        tmp_hd = np.clip(np.nan_to_num(tmp_hd, nan=500, posinf=500), 0, 500)

        dice = dice_from_confusion(pred, lab, C)[1:]

        present = set(np.unique(lab).tolist())
        for cls in range(C - 1):
            if (cls + 1) in present:       # only GT-present classes count
                dice_acc[cls].append(dice[cls])
                asd_acc[cls].append(tmp_asd[cls])
                hd_acc[cls].append(tmp_hd[cls])

    if n_proc > 1:
        # reduce per-class sums and counts across hosts
        from jax.experimental import multihost_utils

        def row(acc):
            return np.array([[np.sum(d), len(d)] for d in acc], np.float64)

        sums = np.stack([row(dice_acc), row(asd_acc), row(hd_acc)])
        gathered = np.asarray(multihost_utils.process_allgather(sums))
        total = gathered.sum(axis=0)      # (3, C-1, 2)
        with np.errstate(invalid="ignore"):
            out = total[..., 0] / total[..., 1]
        return out[0], out[1], out[2]

    out_dice = np.array([np.mean(d) if d else np.nan for d in dice_acc])
    out_asd = np.array([np.mean(d) if d else np.nan for d in asd_acc])
    out_hd = np.array([np.mean(d) if d else np.nan for d in hd_acc])
    return out_dice, out_asd, out_hd
