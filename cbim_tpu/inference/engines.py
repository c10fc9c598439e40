"""Inference engines: whole-image and sliding-window, 2D + 3D.

Reproduces reference inference/inference3d.py and inference2d.py exactly:
- window stride = half window; edge windows clamped flush to the border via
  ``split_idx`` (inference/utils.py:29-43) — kept bit-identical;
- uniform fusion: softmax-probability sum + visit counter, divided at the end
  (inference3d.py:61-88);
- inputs smaller than the window are zero-padded high-side and the output is
  cropped back (inference3d.py:44-54, :89-90).

TPU-native design: the window grid for a given volume shape is a *static*
start-index table, so the whole sweep compiles to one XLA program
(``lax.scan`` over dynamic-slice -> model forward -> scatter-add).  Windows
are batched ``window_batch`` at a time to fill the MXU; a validity mask makes
the padded tail contribute nothing, so results are independent of
window_batch.  Programs are cached per volume shape — across a validation run
every distinct test-volume shape compiles once and is reused every epoch.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np


def split_idx(half_win: int, size: int, i: int):
    """Exact port of reference inference/utils.py:29-43."""
    start = half_win * i
    end = start + half_win * 2
    if end > size:
        start = size - half_win * 2
        end = size
    return start, end


def _grid_starts(spatial, window):
    """All window start coordinates for a volume (reference's triple loop)."""
    halves = [w // 2 for w in window]
    axes = []
    for size, half in zip(spatial, halves):
        axes.append([split_idx(half, size, i)[0] for i in range(size // half)])
    starts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, len(window))
    return starts.astype(np.int32)


def _dedup_starts(starts: np.ndarray):
    """Collapse repeated window starts into (unique_starts, multiplicity).

    The reference's clamped grid revisits a start whenever an axis size is a
    multiple of the half-window: the last index clamps flush to the border
    (split_idx, reference inference/utils.py:29-43) and lands on an existing
    start.  A revisit contributes an identical (prob x importance, count)
    pair, so running the window once and scaling by the integer multiplicity
    is numerically equivalent up to fp summation order (m*q == q+...+q is
    exact in isolation, but at voxels where other windows' contributions
    interleave between duplicate visits the reordering can differ at ulp
    level under fp32 non-associativity) while saving the duplicate forwards:
    the AMOS eval shape 160x256x256 / 128^3 window drops from 32 to 18
    forwards.  The grid is lexicographically non-decreasing, so np.unique's
    sorted output preserves the reference's visit order."""
    uniq, mult = np.unique(starts, axis=0, return_counts=True)
    return uniq.astype(np.int32), mult.astype(np.float32)


def _auto_window_batch(n_windows: int, cap: int = 6) -> int:
    """Largest window_batch <= cap that divides the unique-window count, so
    no group carries padded (wasted) forwards.  Measured on v5e at the AMOS
    eval shape (18 unique windows): wb=6 0.571 vs the old global default
    wb=2 0.531 vols/s (docs/benchmarks.md).  Falls back to 2 when nothing
    in [2, cap] divides n (padding one group of 2 wastes at most 1 forward)."""
    for wb in range(cap, 1, -1):
        if n_windows % wb == 0:
            return wb
    return 2


class InferenceEngine:
    """Shape-cached jit programs around a model apply function.

    ``apply_fn(img) -> logits`` (deep-supervision heads already reduced to
    head[0] by the caller-provided function).
    """

    def __init__(self, apply_fn, num_classes: int, window_size=None,
                 window_batch: int | str | None = 1, fusion: str = "uniform",
                 gaussian_sigma_scale: float = 0.125, variables=None):
        """fusion: 'uniform' (reference semantics, inference3d.py:61-88) or
        'gaussian' — center-weighted window importance (the nnU-Net-style
        fusion whose machinery the reference vendors but never wires up,
        nnformer_utils.py:113-119); opt-in, usually slightly better Dice at
        window seams.

        ``variables``: when given, ``apply_fn(variables, img) -> logits`` and
        the variables ride every compiled program as a TRACED argument.
        Without it (legacy 1-arg ``apply_fn(img)``), closed-over weights are
        baked into the HLO as constants — which recompiles on every weight
        swap (each eval epoch, each ensemble member) and, on tunneled
        backends, can exceed the remote-compile upload limit outright
        (observed: nnFormer's ~600 MB param constants -> HTTP 413).  Swap
        weights without recompiling via :meth:`set_variables`."""
        if variables is None:
            self._apply = lambda v, x: apply_fn(x)
            self.variables = ()
        else:
            self._apply = apply_fn
            self.variables = variables
        self.apply_fn = apply_fn
        self.num_classes = num_classes
        self.window_size = tuple(window_size) if window_size else None
        # None/"auto": pick per volume shape in _prepare_windows
        self.window_batch = (None if window_batch in (None, "auto")
                             else max(1, int(window_batch)))
        assert fusion in ("uniform", "gaussian")
        self.fusion = fusion
        self.gaussian_sigma_scale = gaussian_sigma_scale
        self._whole_cache = {}
        self._sw_cache = {}

    def set_variables(self, variables):
        """Swap model weights without recompiling (same pytree structure)."""
        assert self.variables != (), \
            "engine was built with a closure apply_fn; pass variables= at init"
        self.variables = variables

    def _importance(self, window):
        if self.fusion == "uniform":
            return np.ones((*window, 1), np.float32)
        # separable gaussian centered on the window (nnU-Net style)
        maps = []
        for w in window:
            x = np.arange(w, dtype=np.float32) - (w - 1) / 2.0
            sigma = max(w * self.gaussian_sigma_scale, 1e-3)
            maps.append(np.exp(-0.5 * (x / sigma) ** 2))
        imp = maps[0][:, None] * maps[1][None, :] if len(window) == 2 else \
            maps[0][:, None, None] * maps[1][None, :, None] * maps[2][None, None, :]
        imp = imp / imp.max()
        imp = np.maximum(imp, imp.max() * 1e-3)   # keep counts positive
        return imp[..., None].astype(np.float32)

    # -- whole image --------------------------------------------------------
    def whole_image(self, img: jax.Array) -> jax.Array:
        """img: (B, *spatial, C) -> softmax probs (B, *spatial, classes)."""
        key = ("whole", img.shape)
        if key not in self._whole_cache:
            def fn(v, x):
                logits = self._apply(v, x)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            self._whole_cache[key] = jax.jit(fn)
        return self._whole_cache[key](self.variables, img)

    def whole_image_sharded(self, img: jax.Array, mesh, axis: str = "data"
                            ) -> jax.Array:
        """Batch-sharded whole-image inference: rows of ``img`` (e.g. the
        slices of a 2D test volume, validation.py:39-40) are distributed
        over the mesh's ``axis``; the batch is padded to a device multiple
        and the padding dropped after.  Purely data-parallel — no
        collectives."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = mesh.shape[axis]
        B = img.shape[0]
        pad = (-B) % ndev
        if pad:
            img = jnp.concatenate([img, jnp.zeros((pad, *img.shape[1:]),
                                                  img.dtype)], axis=0)
        key = ("whole_sharded", img.shape, axis,
               tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat))
        if key not in self._whole_cache:
            sharding = NamedSharding(mesh, P(axis))
            replicated = NamedSharding(mesh, P())

            def fn(v, x):
                logits = self._apply(v, x)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

            self._whole_cache[key] = jax.jit(
                fn, in_shardings=(replicated, sharding),
                out_shardings=sharding)
        probs = self._whole_cache[key](self.variables, img)
        return probs[:B] if pad else probs

    # -- sliding window -------------------------------------------------------
    def _prepare_windows(self, img: jax.Array, group_multiple: int = 1):
        """Pad input up to window, enumerate window starts, group by
        window_batch, and pad the group count to ``group_multiple`` (for
        even division across mesh devices).  Padded entries carry valid=0
        and contribute nothing."""
        window = self.window_size
        nd = len(window)
        spatial = img.shape[1:1 + nd]

        # pad up to window size if needed (reference inference3d.py:44-54)
        pads = [(0, max(0, w - s)) for s, w in zip(spatial, window)]
        if any(p[1] > 0 for p in pads):
            img_p = jnp.pad(img, [(0, 0)] + pads + [(0, 0)])
        else:
            img_p = img
        padded_spatial = tuple(img_p.shape[1:1 + nd])

        starts, mult = _dedup_starts(_grid_starts(padded_spatial, window))
        n = starts.shape[0]
        wb = self.window_batch
        if wb is None:
            wb = _auto_window_batch(n)
        n_pad = (-n) % (wb * group_multiple)
        valid = np.concatenate([mult, np.zeros(n_pad, np.float32)])
        starts = np.concatenate([starts, np.tile(starts[:1], (n_pad, 1))], axis=0)
        groups = starts.shape[0] // wb
        starts = starts.reshape(groups, wb, nd)
        valid = valid.reshape(groups, wb)
        return img_p, starts, valid, pads, spatial, padded_spatial

    def _crop_pads(self, probs, pads, spatial):
        if any(p[1] > 0 for p in pads):
            slices = tuple([slice(None)] + [slice(0, s) for s in spatial]
                           + [slice(None)])
            probs = probs[slices]
        return probs

    def _count_map(self, padded_spatial, starts, valid):
        """The fusion denominator (visit counter x importance,
        inference3d.py:84-88) is pure window geometry — identical for every
        volume of a given shape and independent of the data — so it is
        accumulated ONCE on the host and baked into the compiled program as
        a constant, instead of scatter-accumulated on device every call."""
        window = self.window_size
        imp = self._importance(window)[..., 0].astype(np.float32)
        cnt = np.zeros((1, *padded_spatial, 1), np.float32)
        for s, v in zip(starts.reshape(-1, len(window)), valid.reshape(-1)):
            if v > 0:
                sl = tuple([slice(None)] +
                           [slice(int(o), int(o) + w) for o, w in zip(s, window)]
                           + [slice(None)])
                cnt[sl] += v * imp[..., None]   # v = window multiplicity
        return cnt

    def sliding_window(self, img: jax.Array) -> jax.Array:
        """img: (1, *spatial, C) -> softmax probs (1, *spatial, classes)."""
        img_p, starts, valid, pads, spatial, padded_spatial = \
            self._prepare_windows(img)
        groups, wb = valid.shape

        key = ("sw", padded_spatial, groups, wb)
        if key not in self._sw_cache:
            sweep = self._sw_sweep(padded_spatial, self.window_size, wb)
            cnt = jnp.asarray(self._count_map(padded_spatial, starts, valid))

            def run(v, img, starts, valid):
                return sweep(v, img, starts, valid) / cnt

            self._sw_cache[key] = jax.jit(run)
        probs = self._sw_cache[key](self.variables, img_p,
                                    jnp.asarray(starts), jnp.asarray(valid))
        return self._crop_pads(probs, pads, spatial)

    # -- sliding window, 2D slice-batch form ----------------------------------
    def sliding_window_slices(self, img: jax.Array) -> jax.Array:
        """2D sliding window over a slice batch: img (B, H, W, C_in) ->
        probs (B, H, W, classes).

        Mirrors reference inference/inference2d.py:27-71: ALL slices of the
        volume ride as the batch through the net at each window position (the
        window grid/`split_idx` clamping and uniform counter fusion are
        identical to the 3D engine).  The reference's 2D path has no
        pad-up-to-window branch; inputs smaller than the window are
        nevertheless handled here by the shared zero-pad + crop-back
        (a strict superset — the reference would fail on such inputs).
        """
        window = self.window_size
        assert len(window) == 2, "sliding_window_slices needs a 2D window"
        B = img.shape[0]
        spatial = tuple(img.shape[1:3])

        pads = [(0, max(0, w - s)) for s, w in zip(spatial, window)]
        if any(p[1] > 0 for p in pads):
            img_p = jnp.pad(img, [(0, 0)] + pads + [(0, 0)])
        else:
            img_p = img
        padded_spatial = tuple(img_p.shape[1:3])
        starts, mult = _dedup_starts(_grid_starts(padded_spatial, window))

        key = ("sw2d", B, padded_spatial, img.shape[-1])
        if key not in self._sw_cache:
            C = self.num_classes
            apply_fn = self._apply
            importance = jnp.asarray(self._importance(window))   # (wh, ww, 1)
            cnt = jnp.asarray(
                self._count_map(padded_spatial, starts[:, None, :],
                                mult[:, None]))                  # (1, H, W, 1)

            def run(v, img, starts, mult):
                acc = jnp.zeros((B, *padded_spatial, C), jnp.float32)

                def body(acc, sm):
                    s, m = sm
                    idx = (0, s[0], s[1], 0)
                    win = jax.lax.dynamic_slice(
                        img, idx, (B, *window, img.shape[-1]))
                    logits = apply_fn(v, win)
                    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                    cur = jax.lax.dynamic_slice(acc, idx, (B, *window, C))
                    acc = jax.lax.dynamic_update_slice(
                        acc, cur + probs * importance[None] * m, idx)
                    return acc, None

                acc, _ = jax.lax.scan(body, acc, (starts, mult))
                return acc / cnt

            self._sw_cache[key] = jax.jit(run)
        probs = self._sw_cache[key](self.variables, img_p,
                                    jnp.asarray(starts), jnp.asarray(mult))
        return self._crop_pads(probs, pads, spatial)

    def sliding_window_slices_sharded(self, img: jax.Array, mesh,
                                      axis: str = "data") -> jax.Array:
        """Slice-batch 2D sliding window with the slice dim sharded over the
        mesh (purely data-parallel; the window sweep inside is the same
        program).  Slice count is padded to a device multiple and the padding
        dropped after."""
        ndev = mesh.shape[axis]
        B = img.shape[0]
        pad = (-B) % ndev
        if pad:
            img = jnp.concatenate(
                [img, jnp.zeros((pad, *img.shape[1:]), img.dtype)], axis=0)
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P(axis))
        img = jax.device_put(img, sharding)
        probs = self.sliding_window_slices(img)
        return probs[:B] if pad else probs

    def sliding_window_sharded(self, img: jax.Array, mesh, axis: str = "data"
                               ) -> jax.Array:
        """Multi-chip sliding window: window groups are sharded across the
        mesh's ``axis``; every device sweeps its share of windows into a
        local (accumulator, counter) pair and the pairs are fused with one
        ``psum`` riding ICI.  Numerics match :meth:`sliding_window` up to fp
        summation order (same windows, same importance weights, same
        division).

        The volume itself is replicated — for the reference's window/volume
        ratios (e.g. 32 x 128^3 windows over a 160x256x256 AMOS volume,
        SURVEY §3.3) the sweep is compute-bound, so sharding compute while
        replicating the modest accumulator state is the right trade; the
        collective cost is one all-reduce of (volume x classes) at the end.
        """
        ndev = mesh.shape[axis]
        img_p, starts, valid, pads, spatial, padded_spatial = \
            self._prepare_windows(img, group_multiple=ndev)
        groups, wb = valid.shape

        key = ("sw_sharded", padded_spatial, groups, wb, axis,
               tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat))
        if key not in self._sw_cache:
            cnt = self._count_map(padded_spatial, starts, valid)
            self._sw_cache[key] = self._build_sw_sharded(
                padded_spatial, self.window_size, wb, mesh, axis, cnt)
        probs = self._sw_cache[key](self.variables, img_p,
                                    jnp.asarray(starts), jnp.asarray(valid))
        return self._crop_pads(probs, pads, spatial)

    def _sw_sweep(self, spatial, window, wb):
        """Returns ``sweep(v, img, starts, valid) -> acc``: the weighted
        probability accumulator WITHOUT the final division, so single-device
        and sharded lowerings share it (the sharded path psums before
        dividing).  The denominator is the host-precomputed
        :meth:`_count_map` constant."""
        nd = len(window)
        C = self.num_classes
        apply_fn = self._apply
        importance = jnp.asarray(self._importance(window))   # (*window, 1)

        def sweep(v, img, starts, valid):
            # img: (1, *spatial, C_in); starts: (groups, wb, nd)
            acc = jnp.zeros((1, *spatial, C), jnp.float32)

            def extract(s):
                return jax.lax.dynamic_slice(
                    img, (0, *[s[a] for a in range(nd)], 0),
                    (1, *window, img.shape[-1]))[0]

            def body(acc, sv):
                s_grp, v_grp = sv                       # (wb, nd), (wb,)
                wins = jax.vmap(extract)(s_grp)          # (wb, *window, C_in)
                logits = apply_fn(v, wins)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

                def scatter(acc, i):
                    s = s_grp[i]
                    v = v_grp[i]
                    idx = (0, *[s[a] for a in range(nd)], 0)
                    cur = jax.lax.dynamic_slice(acc, idx, (1, *window, C))
                    acc = jax.lax.dynamic_update_slice(
                        acc, cur + probs[i][None] * importance[None] * v, idx)
                    return acc, None

                acc, _ = jax.lax.scan(scatter, acc, jnp.arange(wb))
                return acc, None

            acc, _ = jax.lax.scan(body, acc, (starts, valid))
            return acc

        return sweep

    def _build_sw_sharded(self, spatial, window, wb, mesh, axis, cnt):
        from jax.sharding import PartitionSpec as P

        sweep = self._sw_sweep(spatial, window, wb)
        cnt = jnp.asarray(cnt)

        def local(v, img, starts, valid):
            acc = sweep(v, img, starts, valid)
            acc = jax.lax.psum(acc, axis)
            return acc / cnt

        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis)),
            out_specs=P(),
            check_vma=False)  # psum makes the output replicated
        return jax.jit(sharded)


def inference_whole_image(engine: InferenceEngine, img, cfg=None):
    return engine.whole_image(img)


def inference_sliding_window(engine: InferenceEngine, img, cfg=None):
    return engine.sliding_window(img)


def get_inference(cfg):
    """Dispatch on (dimension, sliding_window) (reference inference/utils.py:4-25)."""
    if cfg.sliding_window:
        return inference_sliding_window
    return inference_whole_image


def make_engine(model, variables, cfg, window_batch: int | None = None):
    """Convenience: wrap a Flax model+vars into an InferenceEngine.

    Deep-supervision models return a list of heads; head[0] is used
    (reference inference3d.py:22-24,79-81).
    """
    def apply_fn(v, x):
        out = model.apply(v, x, train=False)
        if isinstance(out, (tuple, list)):
            out = out[0]
        return out

    # measured on v5e (AMOS eval shape, dedup'd grid, tools/bench_infer.py
    # 2026-08-19): wb=1 0.494, wb=2 0.531, wb=3 0.537, wb=6 0.571 vols/s;
    # default "auto" picks the largest wb <= 6 dividing the per-shape
    # unique-window count (= 6 at the AMOS shape), see _auto_window_batch
    wb = window_batch if window_batch is not None \
        else getattr(cfg, "window_batch", "auto")
    return InferenceEngine(apply_fn, cfg.classes,
                           window_size=getattr(cfg, "window_size", None),
                           window_batch=wb,
                           fusion=getattr(cfg, "window_fusion", "uniform"),
                           variables=variables)
