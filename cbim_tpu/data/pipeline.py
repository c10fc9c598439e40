"""The batched on-device augmentation pipeline (the framework's hot input path).

The reference augments per-sample inside ``Dataset.__getitem__`` on CPU
workers or the GPU (5-6 s/volume CPU, 0.1-0.3 s/volume GPU for 160^3 —
reference docs/change.md:6-7).  Here the host only *slices windows* out of
the RAM cache (a memcpy); everything stochastic runs as ONE jit-compiled,
vmapped XLA program per batch on the accelerator:

    host:   pick volume -> random (training_size + affine_pad) window
            -> place centered in a fixed zero buffer -> stack batch
    device: [pre-intensity ops] -> affine resample -> center crop
            -> [post-intensity/mirror ops]     (all per-sample keyed)

Branching parity: the reference's "crop trick" (dataset_amos_ct.py:121-137)
takes the affine branch with probability p and a plain random crop otherwise.
Here the no-affine branch uses an identity theta, so one static program
serves both branches; the plain-branch crop distribution differs from the
reference only in that crop centers sit >= pad/2 voxels from the volume edge
(the affine branch has the same property in the reference itself).

For the ACDC-style recipes the reference affines the *full* volume; a jitted
program needs static shapes, so the affine window is the padded precrop
instead — same transform family, slightly different normalized-coordinate
scaling per sample.  Quality impact is within augmentation noise; see
tests/test_aug_distribution.py and tools/aug_distribution_parity.py
(results in docs/aug_parity.md) for the distribution checks.
"""

from __future__ import annotations

from dataclasses import dataclass, replace, field
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import augment as A
from ..ops.resample import (affine_sample_2d, affine_sample_3d,
                            affine_sample_3d_batch)


@dataclass(frozen=True)
class AugRecipe:
    """Declarative training-augmentation recipe for one dataset.

    ops are (name, prob, params) triples; prob 1.0 means unconditional.
    pre_ops run before the affine (ACDC style, dataset_acdc.py:141-149) —
    on the FULL volume when ``full_volume`` is set and the device cache is
    active (the reference's exact semantics), else on the precrop window;
    post_ops run after the crop (AMOS style, dataset_amos_ct.py:141-153).
    """
    affine_prob: float = 1.0
    affine_pad: Sequence[int] = (0, 0, 0)
    scale: Sequence = (0.3, 0.3, 0.3)
    rotate: Sequence = (30, 30, 30)
    translate: Sequence = (0.0, 0.0, 0.0)
    shear: Sequence = (0.05, 0.05, 0.05)
    pre_ops: tuple = ()
    post_ops: tuple = ()
    # ACDC-style recipes: the reference runs pre_ops on the FULL volume and
    # spans the affine grid over its full extent (augmentation.py:287-289)
    # before the random crop.  With the device cache (full volumes in HBM)
    # the pipeline reproduces that exactly; the host-window path approximates
    # it on the (training_size+pad) precrop (docs/aug_parity.md).  Crop-trick
    # recipes (AMOS/LiTS/KiTS) precrop in the reference itself, so their
    # window semantics are already exact and this stays False.
    full_volume: bool = False
    # class-count hint for the tiled TPU affine lowering (labels ride in the
    # image dtype there; the hint enforces exact representability)
    num_classes: int | None = None


# pre_ops that stay exact on a zero-padded full-volume cache row: pointwise
# ops whose padding residue the final re-zero removes, plus gamma (which
# takes the mask for its stats).  Ops with neighborhood or unmasked-stat
# semantics (blur, contrast, multiply's preserve_range) would silently
# diverge, so full_volume recipes are restricted to this set at build time.
_FULLVOL_SAFE_PRE = {"gaussian_noise", "brightness_additive", "gamma"}


def _apply_op(name: str, params: dict, img, lab, key, mask=None, count=None):
    """Dispatch one augmentation op; returns (img, lab)."""
    if name == "gamma" and mask is not None:
        return A.gamma(img, key, params["range"],
                       params.get("retain_stats", True),
                       mask=mask, count=count), lab
    if name == "gaussian_noise":
        if "std_range" in params:
            k1, k2 = jax.random.split(key)
            lo, hi = params["std_range"]
            std = jax.random.uniform(k1, (), jnp.float32, lo, hi)
            return A.gaussian_noise(img, k2, std), lab
        return A.gaussian_noise(img, key, params["std"]), lab
    if name == "brightness_additive":
        return A.brightness_additive(img, key, params["std"]), lab
    if name == "brightness_multiply":
        return A.brightness_multiply(img, key, params["range"]), lab
    if name == "gamma":
        return A.gamma(img, key, params["range"],
                       params.get("retain_stats", True)), lab
    if name == "contrast":
        return A.contrast(img, key, params["range"]), lab
    if name == "gaussian_blur":
        return A.gaussian_blur(img, key, params["range"]), lab
    if name == "mirror":
        return A.mirror(img, lab, params["axis"])
    if name == "elastic":
        # opt-in extra (no reference counterpart — augmentation.py is
        # affine-only); see ops/augment.py elastic_deform_{2d,3d}
        if lab.ndim == 3:
            return A.elastic_deform_3d(
                img, lab, key, grid=tuple(params.get("grid", (4, 4, 4))),
                magnitude=tuple(params.get("magnitude", (0.05,) * 3)))
        return A.elastic_deform_2d(
            img, lab, key, grid=tuple(params.get("grid", (4, 4))),
            magnitude=tuple(params.get("magnitude", (0.05,) * 2)))
    raise ValueError(f"unknown aug op {name!r}")


def _gated(name, prob, params, img, lab, key, mask=None, count=None):
    if prob >= 1.0:
        return _apply_op(name, params, img, lab, key, mask, count)
    kg, ko = jax.random.split(key)
    gate = jax.random.bernoulli(kg, prob)
    img2, lab2 = _apply_op(name, params, img, lab, ko, mask, count)
    return (jnp.where(gate, img2, img),
            lab if lab2 is lab else jnp.where(gate, lab2, lab))


def build_sample_aug(recipe: AugRecipe, crop_size, ndim: int):
    """Per-sample augmentation fn(img_buf, lab_buf, key) -> (img, lab).

    img_buf: (*buffer_spatial, C) float32; lab_buf: (*buffer_spatial) int.
    """
    crop_size = tuple(int(t) for t in crop_size)

    def fn(img, lab, key):
        k_ops = jax.random.split(key, len(recipe.pre_ops) + len(recipe.post_ops) + 2)
        ki = 0
        for (name, prob, params) in recipe.pre_ops:
            img, lab = _gated(name, prob, params, img, lab, k_ops[ki])
            ki += 1

        k_branch, k_theta = jax.random.split(k_ops[ki]); ki += 1
        if ndim == 3:
            theta = A.random_theta_3d(k_theta, recipe.scale, recipe.rotate,
                                      recipe.translate, recipe.shear)
            eye = jnp.eye(3, 4, dtype=jnp.float32)
        else:
            theta = A.random_theta_2d(k_theta, recipe.scale, recipe.rotate,
                                      recipe.translate)
            eye = jnp.eye(2, 3, dtype=jnp.float32)
        if recipe.affine_prob < 1.0:
            take = jax.random.bernoulli(k_branch, recipe.affine_prob)
            theta = jnp.where(take, theta, eye)

        # the center crop is fused into the resample: only the central
        # crop_size output region is computed (exactly equivalent to
        # resample-then-crop, ~((ts+pad)/ts)^3 x less gather work)
        if ndim == 3:
            img, lab = affine_sample_3d(img, lab, theta, out_shape=crop_size)
        else:
            img, lab = affine_sample_2d(img, lab, theta, out_shape=crop_size)

        for (name, prob, params) in recipe.post_ops:
            img, lab = _gated(name, prob, params, img, lab, k_ops[ki])
            ki += 1
        return img, lab

    return fn


def build_batch_aug(recipe: AugRecipe, crop_size, ndim: int):
    """Batched augmentation fn(imgs, labs, keys) -> (imgs, labs).

    Same math as ``vmap(build_sample_aug(...))`` but the affine resample runs
    as ONE batch-flat program (:func:`affine_sample_3d_batch`), which on TPU
    takes the tile-pair single-gather lowering — ~4x faster than the vmapped
    per-sample gathers.  Intensity ops stay vmapped around it (elementwise;
    vmap is free for those).
    """
    crop_size = tuple(int(t) for t in crop_size)
    if ndim != 3:
        return jax.vmap(build_sample_aug(recipe, crop_size, ndim))

    n_pre = len(recipe.pre_ops)

    def pre(img, lab, key):
        k_ops = jax.random.split(key, n_pre + len(recipe.post_ops) + 2)
        for ki, (name, prob, params) in enumerate(recipe.pre_ops):
            img, lab = _gated(name, prob, params, img, lab, k_ops[ki])
        k_branch, k_theta = jax.random.split(k_ops[n_pre])
        theta = A.random_theta_3d(k_theta, recipe.scale, recipe.rotate,
                                  recipe.translate, recipe.shear)
        if recipe.affine_prob < 1.0:
            take = jax.random.bernoulli(k_branch, recipe.affine_prob)
            theta = jnp.where(take, theta, jnp.eye(3, 4, dtype=jnp.float32))
        return img, lab, theta, k_ops[n_pre + 1:]

    def post(img, lab, k_ops):
        for ki, (name, prob, params) in enumerate(recipe.post_ops):
            img, lab = _gated(name, prob, params, img, lab, k_ops[ki])
        return img, lab

    def fn(imgs, labs, keys):
        imgs, labs, thetas, k_post = jax.vmap(pre)(imgs, labs, keys)
        imgs, labs = affine_sample_3d_batch(imgs, labs, thetas,
                                            out_shape=crop_size,
                                            num_classes=recipe.num_classes)
        if recipe.post_ops:
            imgs, labs = jax.vmap(post)(imgs, labs, k_post)
        return imgs, labs

    return fn


class TrainPipeline:
    """Host window sampler + jitted batched device augmentation.

    Two cache modes:
    - host cache (default when large): volumes stay in host RAM; each step
      copies the batch's precrop windows (native threaded assembler) and
      transfers them to the device.
    - device cache (auto when the padded corpus fits ``device_cache_bytes``,
      default 4 GB): ALL volumes are padded to a common shape and parked in
      HBM once; each step transfers only window offsets + PRNG keys (~KB) and
      the crop happens on device with dynamic slices.  On remote/tunneled
      devices this removes the per-step H2D serialization entirely (measured
      0.6 s/step for 128^3 batches on the tunneled v5e).
    """

    def __init__(self, dataset, cfg, seed: int = 0, batch_shard_fn=None,
                 mesh=None):
        self.ds = dataset
        self.cfg = cfg
        self.ndim = 3 if cfg.dimension == "3d" else 2
        self.crop_size = tuple(cfg.training_size[:self.ndim])
        recipe = dataset.recipe()
        if recipe.num_classes is None:
            recipe = replace(recipe, num_classes=int(cfg.classes))
        self.recipe = recipe
        self.buffer_shape = tuple(
            t + p for t, p in zip(self.crop_size, recipe.affine_pad))
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        # 2D epoch semantics: the reference DataLoader shuffles the slice
        # pool WITHOUT replacement per epoch (reference train.py:57-64,
        # shuffle=True over the finite 2D __len__); a host-side permutation
        # feeds the same static-shape batcher.  3D keeps i.i.d. draws — the
        # reference 3D datasets expose a ~infinite virtual __len__
        # (dataset_acdc.py:71-75), so its shuffle is i.i.d. there too.
        self._without_replacement = self.ndim == 2
        self._epoch_perm = None
        self._perm_pos = 0
        self._fullvol = False      # set by _init_device_cache when eligible
        self._mesh = mesh
        self._aug = jax.jit(build_batch_aug(recipe, self.crop_size, self.ndim))
        # optional hook that places the host batch on the device mesh
        # (GSPMD data parallelism) before the augmentation program runs
        self._shard = batch_shard_fn or (lambda x: x)
        # native threaded batch assembler (native/cbim_host.cpp); numpy
        # fallback otherwise. 3D only (2D batches are tiny).
        self._native = False
        if self.ndim == 3:
            try:
                from . import native
                self._native = native.available()
            except Exception:
                self._native = False

        # device cache (HBM-resident corpus).  Under GSPMD data parallelism
        # (``mesh`` given) the cache is REPLICATED across the mesh and the
        # augmented batch comes out sharded along 'data' — the multi-chip
        # train path keeps the offsets-only H2D data path (round 1 silently
        # regressed to per-step host assembly there).  The byte limit stays
        # per-chip (replication multiplies total HBM, not per-chip HBM).
        self._device_cache = None
        mode = cfg.get("device_cache", "auto")
        if mesh is None and batch_shard_fn is not None:
            # legacy explicit-shard-hook path without mesh info: cannot
            # express "replicated cache, sharded output" — host path.
            mode = False
        if mode in (True, "auto") and len(dataset.images) > 0:
            limit = int(cfg.get("device_cache_bytes", 4 << 30))
            cache_shape = tuple(
                max(max(im.shape[ax] for im in dataset.images),
                    self.buffer_shape[ax]) for ax in range(self.ndim))
            total = len(dataset.images) * int(np.prod(cache_shape)) * 5  # f32+i8
            if mode is True or total <= limit:
                self._init_device_cache(dataset, cache_shape)

    def _init_device_cache(self, dataset, cache_shape):
        n = len(dataset.images)
        # Low-side margin + high-side headroom so the virtual-start window
        # sampling (see the host-side comment below) stays a plain
        # non-negative dynamic_slice: start index = margin + virtual_start.
        # Exact per-axis bounds over the actual volumes:
        margins, extents = [], []
        for ax, b in enumerate(self.buffer_shape):
            lo_need, hi_need = 0, 0
            for im in dataset.images:
                s = im.shape[ax]
                if s <= b:
                    v_min = -((b - s) // 2)           # centered placement
                    v_max = v_min
                else:
                    m = (b - self.crop_size[ax]) // 2
                    v_min, v_max = -m, s - b + m
                lo_need = max(lo_need, -v_min)
                hi_need = max(hi_need, v_max + b)      # end offset in volume
            margins.append(lo_need)
            extents.append(lo_need + hi_need)
        self._cache_margin = np.asarray(margins, np.int32)
        cache_shape = tuple(max(c, e) for c, e in zip(cache_shape, extents))
        imgs = np.zeros((n, *cache_shape), np.float32)
        labs = np.zeros((n, *cache_shape), np.int8)
        for i, (im, lb) in enumerate(zip(dataset.images, dataset.labels)):
            sl = tuple(slice(lo, lo + s)
                       for lo, s in zip(margins, im.shape))
            imgs[(i, *sl)] = im
            labs[(i, *sl)] = lb
        # bf16 cache by default: halves HBM footprint and the resample's
        # gather traffic; ~0.4% quantization, far below the augmentation
        # noise floor (gaussian_noise_std ~2%).  cache_dtype: float32 opts out.
        cache_dtype = jnp.dtype(self.cfg.get("cache_dtype", "bfloat16"))
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(self._mesh, P())
            self._cache_img = jax.device_put(
                jnp.asarray(imgs, dtype=cache_dtype), repl)
            self._cache_lab = jax.device_put(jnp.asarray(labs), repl)
        else:
            self._cache_img = jnp.asarray(imgs, dtype=cache_dtype)  # one H2D
            self._cache_lab = jnp.asarray(labs)
        self._vol_shapes = np.array([im.shape for im in dataset.images],
                                    np.int64)
        buf = self.buffer_shape

        batch_aug = build_batch_aug(self.recipe, self.crop_size, self.ndim)

        def window(cache_img, cache_lab, idx, start):
            img = jax.lax.dynamic_slice(
                cache_img, (idx, *[start[a] for a in range(self.ndim)]),
                (1, *buf))[0][..., None]
            lab = jax.lax.dynamic_slice(
                cache_lab, (idx, *[start[a] for a in range(self.ndim)]),
                (1, *buf))[0]
            return img, lab

        def gather_and_aug(cache_img, cache_lab, idxs, starts, keys):
            imgs, labs = jax.vmap(window, in_axes=(None, None, 0, 0))(
                cache_img, cache_lab, idxs, starts)
            return batch_aug(imgs, labs, keys)

        # full-volume semantics (ACDC-style): pre_ops + affine grid over the
        # whole true volume, random crop fused as the affine's out_offset —
        # the reference's exact order (dataset_acdc.py:141-149,
        # augmentation.py:287-289 + crop_3d).  Only possible here, where the
        # full volumes live in HBM.
        # cfg override (debug/ops knob): full_volume: false in the YAML
        # forces the precrop-window approximation even for recipes that
        # default to exact full-volume semantics
        fv_cfg = self.cfg.get("full_volume")
        fv = self.recipe.full_volume if fv_cfg is None else bool(fv_cfg)
        self._fullvol = bool(fv) and self.ndim == 3
        if self._fullvol:
            bad = [nm for (nm, _, _) in self.recipe.pre_ops
                   if nm not in _FULLVOL_SAFE_PRE]
            if bad:
                raise ValueError(
                    f"full_volume recipe has mask-unsafe pre_ops {bad}; "
                    f"supported: {sorted(_FULLVOL_SAFE_PRE)}")
            recipe = self.recipe
            crop = self.crop_size
            n_pre = len(recipe.pre_ops)
            margin = self._cache_margin
            exts_const = jnp.asarray(
                [im.shape for im in dataset.images], jnp.int32)

            def pre_full(img, lab, ext, key):
                axm = [(jnp.arange(cache_shape[a]) >= int(margin[a]))
                       & (jnp.arange(cache_shape[a]) < int(margin[a]) + ext[a])
                       for a in range(3)]
                mask = (axm[0][:, None, None] & axm[1][None, :, None]
                        & axm[2][None, None, :])[..., None]
                count = jnp.prod(ext.astype(jnp.float32))
                k_ops = jax.random.split(
                    key, n_pre + len(recipe.post_ops) + 2)
                for ki, (name, prob, params) in enumerate(recipe.pre_ops):
                    img, lab = _gated(name, prob, params, img, lab,
                                      k_ops[ki], mask, count)
                img = jnp.where(mask, img, jnp.zeros((), img.dtype))
                k_branch, k_theta = jax.random.split(k_ops[n_pre])
                theta = A.random_theta_3d(k_theta, recipe.scale,
                                          recipe.rotate, recipe.translate,
                                          recipe.shear)
                if recipe.affine_prob < 1.0:
                    take = jax.random.bernoulli(k_branch, recipe.affine_prob)
                    theta = jnp.where(take, theta,
                                      jnp.eye(3, 4, dtype=jnp.float32))
                return img, lab, theta, k_ops[n_pre + 1:]

            def post_full(img, lab, k_ops):
                for ki, (name, prob, params) in enumerate(recipe.post_ops):
                    img, lab = _gated(name, prob, params, img, lab, k_ops[ki])
                return img, lab

            def gather_and_aug_full(cache_img, cache_lab, idxs, starts, keys):
                from ..ops.resample import affine_sample_3d_fullvol_batch
                # pre_ops run in f32: bf16 draws/pows on the full padded row
                # hit fp edges on TPU (a single non-finite voxel inside the
                # mask poisons the whole volume through gamma's retain_stats
                # reduction); cast back to the cache dtype for the gather so
                # its HBM traffic stays at the bf16 rate
                cache_dtype = cache_img.dtype
                imgs = jnp.take(cache_img, idxs, axis=0)[..., None] \
                    .astype(jnp.float32)
                labs = jnp.take(cache_lab, idxs, axis=0)
                exts = jnp.take(exts_const, idxs, axis=0)
                imgs, labs, thetas, k_post = jax.vmap(pre_full)(
                    imgs, labs, exts, keys)
                img_c, lab_c = affine_sample_3d_fullvol_batch(
                    imgs.astype(cache_dtype), labs, thetas, exts, starts,
                    margin, crop, num_classes=recipe.num_classes)
                if recipe.post_ops:
                    img_c, lab_c = jax.vmap(post_full)(img_c, lab_c, k_post)
                return img_c, lab_c

            gather_and_aug = gather_and_aug_full

        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(self._mesh, P())
            row = NamedSharding(self._mesh, P("data"))
            self._device_cache = jax.jit(
                gather_and_aug,
                in_shardings=(repl, repl, row, row, row),
                out_shardings=(row, row))
        else:
            self._device_cache = jax.jit(gather_and_aug)

    # -- host side -----------------------------------------------------------
    #
    # Window-start distribution: the buffer is training_size + pad; its
    # CENTER becomes the final crop center after the fused affine+crop.  The
    # reference affines the full volume then random-crops with start ~
    # randint(0, size - crop) (crop_3d), i.e. crop centers uniform over
    # [crop/2, size - crop/2].  Sampling the buffer start uniformly over
    # [-pad/2, size - buffer + pad/2] (out-of-volume margin zero-filled)
    # reproduces EXACTLY that center range — without it, edge crops are
    # unreachable and the pipeline over-samples volume centers (measured in
    # docs/aug_parity.md).

    def _virtual_start(self, s: int, ax: int) -> int:
        """Window start relative to the volume (may be negative: zero margin)."""
        b = self.buffer_shape[ax]
        if s <= b:
            return -((b - s) // 2)           # centered placement
        m = (b - self.crop_size[ax]) // 2
        return int(self._rng.integers(-m, s - b + m + 1))

    def _window_coords(self, shape):
        """[src0.., copy_w.., dst_off..] per axis (virtual-start sampling)."""
        starts, sizes, offs = [], [], []
        for ax, b in enumerate(self.buffer_shape):
            s = shape[ax]
            v = self._virtual_start(s, ax)
            src0 = max(v, 0)
            src1 = min(v + b, s)
            starts.append(src0)
            sizes.append(src1 - src0)
            offs.append(src0 - v)
        return starts, sizes, offs

    def _window(self, img: np.ndarray, lab: np.ndarray):
        """Random window of buffer_shape, zero-padded + centered if needed."""
        buf_img = np.zeros(self.buffer_shape, np.float32)
        buf_lab = np.zeros(self.buffer_shape, np.int32)
        starts, sizes, offs = self._window_coords(img.shape)
        slices_src = [slice(s0, s0 + w) for s0, w in zip(starts, sizes)]
        slices_dst = [slice(o, o + w) for o, w in zip(offs, sizes)]
        buf_img[tuple(slices_dst)] = img[tuple(slices_src)]
        buf_lab[tuple(slices_dst)] = lab[tuple(slices_src)]
        return buf_img, buf_lab

    def _draw_indices(self, batch_size: int) -> np.ndarray:
        """Sample indices: a per-epoch permutation without replacement (2D,
        reference DataLoader semantics) or i.i.d. uniform (3D)."""
        n = len(self.ds.images)
        if not self._without_replacement:
            return self._rng.integers(0, n, size=batch_size)
        out = np.empty(batch_size, np.int64)
        filled = 0
        while filled < batch_size:
            if self._epoch_perm is None or self._perm_pos >= n:
                self._epoch_perm = self._rng.permutation(n)
                self._perm_pos = 0
            take = min(batch_size - filled, n - self._perm_pos)
            out[filled:filled + take] = \
                self._epoch_perm[self._perm_pos:self._perm_pos + take]
            filled += take
            self._perm_pos += take
        return out

    def host_batch(self, batch_size: int):
        """Labels travel as int8 (medical label sets are tiny): 4x less
        host->device traffic than int32."""
        idxs = self._draw_indices(batch_size)
        if self._native:
            from . import native
            images = [self.ds.images[i] for i in idxs]
            labels = [self.ds.labels[i] for i in idxs]
            wins = np.empty((batch_size, 9), np.int64)
            for i, img in enumerate(images):
                starts, sizes, offs = self._window_coords(img.shape)
                wins[i] = starts + sizes + offs
            di, dl = native.assemble_batch(images, labels, wins,
                                           self.buffer_shape)
            return di[..., None], dl.astype(np.int8)
        imgs = np.empty((batch_size, *self.buffer_shape, 1), np.float32)
        labs = np.empty((batch_size, *self.buffer_shape), np.int8)
        for i, idx in enumerate(idxs):
            bi, bl = self._window(self.ds.images[idx], self.ds.labels[idx])
            imgs[i, ..., 0] = bi
            labs[i] = bl
        return imgs, labs

    # -- device side ----------------------------------------------------------
    def next_batch(self, batch_size: int):
        """Returns (img (B, *crop, 1) f32, lab (B, *crop) i32) on device.

        Call AFTER dispatching the previous train step: the host window copy
        and the H2D transfer then overlap the device compute (the dispatch is
        async), which is what hides the transfer on tunneled/remote devices.
        """
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, batch_size)
        if self._device_cache is not None:
            idxs = self._draw_indices(batch_size).astype(np.int32)
            starts = np.zeros((batch_size, self.ndim), np.int32)
            for i, idx in enumerate(idxs):
                shape = self._vol_shapes[idx]
                for ax in range(self.ndim):
                    if self._fullvol:
                        # crop start in VOLUME coords, the reference's
                        # crop_3d distribution: randint(0, max(S - ts, 1))
                        # (high-exclusive; start == S - ts unreachable, a
                        # reference quirk reproduced deliberately)
                        diff = int(shape[ax]) - self.crop_size[ax]
                        starts[i, ax] = self._rng.integers(0, max(diff, 1))
                    else:
                        v = self._virtual_start(int(shape[ax]), ax)
                        starts[i, ax] = self._cache_margin[ax] + v
            img, lab = self._device_cache(self._cache_img, self._cache_lab,
                                          jnp.asarray(idxs),
                                          jnp.asarray(starts), keys)
            return img, lab.astype(jnp.int32)

        imgs, labs = self.host_batch(batch_size)
        img, lab = self._aug(self._shard(jnp.asarray(imgs)),
                             self._shard(jnp.asarray(labs)), self._shard(keys))
        return img, lab.astype(jnp.int32)
