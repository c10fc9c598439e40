"""Tap-packed Pallas conv3d for small channel counts (the full-res regime).

Why: XLA lowers a stride-1 3^3 conv as per-tap matmuls whose MXU tiles are
(C_in x C_out) — at the reference's full-resolution channel width (32) that
fills 32 of 128 MXU lanes and measures ~16 TFLOP/s on v5e, ~8% of peak
(tools/probe_norm_layout.py).  The same arithmetic reorganized so the
contraction packs the d-axis taps with channels, K = (kd, c) = 96, and the
output packs the remaining taps with output channels, N = (kh, kw, f) = 288,
runs near-dense MXU tiles with EXACTLY the original FLOPs:

    partial[(d, h~, w~), (kh, kw, f)] = sum_{kd, c} xp[d+kd, h~, w~, c]
                                                  * W[kd, kh, kw, c, f]
    y[d, h, w, f] = sum_{kh, kw} partial[(d, h+kh, w+kw), (kh, kw, f)]

One [M, 96] @ [96, 288] matmul per tile plus a 9-term shifted reduce in VMEM
(h shifts ride the sublane-outer dims, w shifts the sublanes, tap blocks the
lanes).

Layout notes:
- input is pre-padded (caller) to xp[B, D+2, H+2, Wp, C] with Wp = W+2
  rounded up to a multiple of 8, so every (d, h) slab reshape that feeds the
  matmul collapses without a relayout;
- the halo'd input tile (overlapping blocks) is DMA'd manually from HBM —
  BlockSpec blocks cannot overlap.

Exact-math parity with lax.conv_general_dilated (NDHWC, SAME, stride 1) up
to f32 accumulation order; verified by tests/test_pallas_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output tile extents (d, h); w is processed full-width
_D_BLK = 2
_H_BLK = 8

# Diagnostic flag, read ONCE at import (jit caches do not key on env vars, so
# reading it inside the kernel trace would freeze whatever value the first
# trace saw).  When set, the kernel SKIPS the 9-term reduce and returns
# mathematically wrong outputs — for probe tooling only.
import os as _os  # noqa: E402
_NORED = _os.environ.get("CBIM_PLCONV_NORED") == "1"
if _NORED:
    import warnings
    warnings.warn(
        "CBIM_PLCONV_NORED=1: pallas conv3d outputs are intentionally WRONG "
        "(reduce skipped); diagnostic use only", stacklevel=2)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _pack_weights(w: jax.Array) -> jax.Array:
    """w[3, 3, 3, C, F] -> W'[(kd, c) = 3C, (kh, kw, f) = 9F]."""
    k3, k3b, k3c, C, F = w.shape
    assert (k3, k3b, k3c) == (3, 3, 3), w.shape
    # (kd, kh, kw, c, f) -> (kd, c, kh, kw, f)
    wp = jnp.transpose(w, (0, 3, 1, 2, 4))
    return wp.reshape(3 * C, 9 * F)


def _grp_g(F: int) -> int:
    """Lane width of one kh-group in the grouped packing."""
    return _round_up(3 * F, 128)


def _use_grouped(F: int) -> bool:
    """Grouped packing pays when the per-group zero pad is small relative to
    the reduce saving: always for F<=64, and exactly free when 3F is a
    multiple of the 128-lane vreg (e.g. F=128).  For F=96 the +29% MXU pad
    cost eats the win, so those stay on the flat 9F packing."""
    return F <= 64 or (3 * F) % 128 == 0


def _pack_weights_grouped(w: jax.Array) -> jax.Array:
    """w[3,3,3,C,F] -> W'[3C, 3*G], G = roundup(3F, 128): the column block
    for tap (kh, kw) sits at lane offset G*kh + F*kw, zero-padded to G per
    kh-group.  The kernel's kh-fold then reads three 128-ALIGNED lane
    groups (full-width VPU adds), leaving only the three narrow kw
    slice-adds — measured 35% faster than the flat 9F packing whose nine
    32-lane misaligned slices dominated the kernel (tools/probe_cw_dissect)."""
    k3, k3b, k3c, C, F = w.shape
    assert (k3, k3b, k3c) == (3, 3, 3), w.shape
    G = _grp_g(F)
    wp = jnp.transpose(w, (0, 3, 1, 2, 4)).reshape(3 * C, 3, 3 * F)
    wp = jnp.pad(wp, ((0, 0), (0, 0), (0, G - 3 * F)))
    return wp.reshape(3 * C, 3 * G)


def _group_fold(partial, d_blk, h_blk, Wp, W, F):
    """Reduce a grouped-packing partial [M, 3G] to the conv output tile
    [d_blk, h_blk, W, F] (f32): aligned full-width kh-fold, then three
    narrow kw slice-adds."""
    G = _grp_g(F)
    p = partial.reshape(d_blk, h_blk + 2, Wp, 3 * G)
    T = (p[:, 0:h_blk, :, 0:G]
         + p[:, 1:1 + h_blk, :, G:2 * G]
         + p[:, 2:2 + h_blk, :, 2 * G:3 * G])
    return (T[:, :, 0:W, 0:F]
            + T[:, :, 1:1 + W, F:2 * F]
            + T[:, :, 2:2 + W, 2 * F:3 * F])


def _halo_tile_dma(x_hbm, xt_ref, sem, slot, b, di, hi, n_d: int, n_h: int,
                   d_blk: int, h_blk: int, dst_trail, src_trail, action: str,
                   base=None):
    """Edge-clamped halo'd tile copy from the UNPADDED HBM tensor.

    Copies x_hbm[b, di*d_blk-1 : +d_blk+2, hi*h_blk-1 : +h_blk+2, <trail>]
    into xt_ref[slot, :, dlo:.., hlo:.., <dst_trail>], where halo rows/cols
    outside the array bounds are skipped — the caller pre-zeroes edge tiles
    (_zero_halo), which restores SAME zero-padding semantics without the
    caller-side XLA pad op (one full HBM write+read per conv) the kernels
    used to require.  DMA copy shapes must be static, so the clamping is
    emitted as pl.when branches keyed on the (traced) block index; `action`
    is 'start' or 'wait' ('wait' must re-emit matching descriptors — the
    awaited byte count differs per branch).  `base` is an extra predicate
    AND'ed into every branch (the prefetch-guard condition)."""
    d_cases = [(1, 1)] if n_d == 1 else [(1, 0), (0, 0), (0, 1)]
    h_cases = [(1, 1)] if n_h == 1 else [(1, 0), (0, 0), (0, 1)]
    for dlo, dhi in d_cases:
        for hlo, hhi in h_cases:
            conds = [] if base is None else [base]
            if n_d > 1:
                conds.append((di == 0) if dlo else (di != 0))
                conds.append((di == n_d - 1) if dhi else (di != n_d - 1))
            if n_h > 1:
                conds.append((hi == 0) if hlo else (hi != 0))
                conds.append((hi == n_h - 1) if hhi else (hi != n_h - 1))
            sd = d_blk + 2 - dlo - dhi
            sh = h_blk + 2 - hlo - hhi
            src = x_hbm.at[(pl.ds(b, 1),
                            pl.ds(di * d_blk - 1 + dlo, sd),
                            pl.ds(hi * h_blk - 1 + hlo, sh)) + src_trail]
            dst = xt_ref.at[(slot, slice(None),
                             slice(dlo, dlo + sd),
                             slice(hlo, hlo + sh)) + dst_trail]
            desc = pltpu.make_async_copy(src, dst, sem.at[slot])
            if conds:
                cond = functools.reduce(jnp.logical_and, conds)

                @pl.when(cond)
                def _(desc=desc):
                    getattr(desc, action)()
            else:
                getattr(desc, action)()


def _zero_halo(xt_ref, slot, di, hi, n_d: int, n_h: int,
               d_blk: int, h_blk: int, base=None):
    """Zero the halo rows/cols of xt_ref[slot] that _halo_tile_dma will SKIP
    for an edge tile (di, hi).  The zero stores and the DMA writes touch
    disjoint regions of the slot, so issuing the stores right before the DMA
    start is race-free; interior tiles store nothing."""
    def _and(c):
        return c if base is None else jnp.logical_and(base, c)

    trail = xt_ref.shape[4:]
    z = jnp.zeros((h_blk + 2,) + trail, xt_ref.dtype)

    @pl.when(_and(di == 0))
    def _():
        xt_ref[slot, 0, 0] = z

    @pl.when(_and(di == n_d - 1))
    def _():
        xt_ref[slot, 0, d_blk + 1] = z

    zh = jnp.zeros((d_blk + 2,) + trail, xt_ref.dtype)

    @pl.when(_and(hi == 0))
    def _():
        xt_ref[slot, 0, :, 0] = zh

    @pl.when(_and(hi == n_h - 1))
    def _():
        xt_ref[slot, 0, :, h_blk + 1] = zh


def _conv_kernel(xp_hbm, wp_ref, y_ref, xt_ref, sem, *,
                 D: int, H: int, W: int, Wp: int, C: int, Cp: int, F: int,
                 d_blk: int, h_blk: int, slice_k: bool, grouped: bool,
                 halo: bool = False):
    b = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(2)
    n_total = pl.num_programs(0) * n_d * n_h
    idx = (b * n_d + di) * n_h + hi

    # double-buffered halo'd input tiles: xt_ref[slot] is
    # [1, d_blk+2, h_blk+2, Wp, Cp]  (Cp = C padded to the 128-lane tile so
    # the manual HBM DMA is alignment-legal; the HBM buffer is physically
    # 128-lane padded either way).  The overlap (halo) is why this is a
    # manual DMA instead of a BlockSpec.
    #
    # halo=True (lane-dense C only, C % 128 == 0): the operand is the
    # UNPADDED tensor — the D/H halo comes from the edge-clamped DMA +
    # border zeroing, and the W halo/alignment is padded per-view in VMEM.
    # Kills the caller-side XLA pre-pad (a full HBM write+read per conv).
    slot = jax.lax.rem(idx, 2)

    if halo:
        trail = (slice(None), slice(None))

        def tile_io(slot_, b_, di_, hi_, action, base=None):
            _halo_tile_dma(xp_hbm, xt_ref, sem, slot_, b_, di_, hi_, n_d,
                           n_h, d_blk, h_blk, trail, trail, action,
                           base=base)

        _zero_halo(xt_ref, slot, di, hi, n_d, n_h, d_blk, h_blk,
                   base=idx == 0)
        tile_io(slot, b, di, hi, "start", base=idx == 0)
        nxt = idx + 1
        nb = nxt // (n_d * n_h)
        nr = jax.lax.rem(nxt, n_d * n_h)
        ndi = nr // n_h
        nhi = jax.lax.rem(nr, n_h)
        nslot = jax.lax.rem(nxt, 2)
        _zero_halo(xt_ref, nslot, ndi, nhi, n_d, n_h, d_blk, h_blk,
                   base=nxt < n_total)
        tile_io(nslot, nb, ndi, nhi, "start", base=nxt < n_total)
        tile_io(slot, b, di, hi, "wait")
    else:
        def tile_dma(slot, b_, di_, hi_):
            return pltpu.make_async_copy(
                xp_hbm.at[pl.ds(b_, 1), pl.ds(di_ * d_blk, d_blk + 2),
                          pl.ds(hi_ * h_blk, h_blk + 2)],
                xt_ref.at[slot], sem.at[slot])

        @pl.when(idx == 0)
        def _():
            tile_dma(0, b, di, hi).start()

        # prefetch the next tile while this one computes
        nxt = idx + 1
        nb = nxt // (n_d * n_h)
        nr = jax.lax.rem(nxt, n_d * n_h)

        @pl.when(nxt < n_total)
        def _():
            tile_dma(jax.lax.rem(nxt, 2), nb, nr // n_h,
                     jax.lax.rem(nr, n_h)).start()

        tile_dma(slot, b, di, hi).wait()

    M = d_blk * (h_blk + 2) * Wp
    # X3: three d-shifted views stacked on the channel axis.
    # slice_k=True: lane-slice each view to the real C -> K = 3C (exact
    # FLOPs, pays a VMEM relayout).  False: keep padded lanes -> K = 3*Cp
    # (zero rows in the packed weights; more MXU work, no relayout).
    if halo:
        views = [jnp.pad(xt_ref[slot, 0, kd:kd + d_blk],
                         ((0, 0), (0, 0), (1, Wp - W - 1), (0, 0))
                         ).reshape(M, Cp)
                 for kd in range(3)]
    else:
        views = [xt_ref[slot, 0, kd:kd + d_blk].reshape(M, Cp)
                 for kd in range(3)]
    if slice_k:
        views = [v[:, :C] for v in views]
    x3 = jnp.concatenate(views, axis=1)

    partial = jnp.dot(x3, wp_ref[:], preferred_element_type=jnp.float32)

    if _NORED:
        # diagnostic-only (CBIM_PLCONV_NORED=1 at import): skips the
        # shifted reduce and produces WRONG conv outputs; a loud warning is
        # emitted at import time (see _NORED below)
        n_w = 3 * _grp_g(F) if grouped else 9 * F
        partial = partial.reshape(d_blk, h_blk + 2, Wp, n_w)
        y_ref[0] = partial[:, 1:1 + h_blk, 1:1 + W, :F].astype(y_ref.dtype)
        return

    if grouped:
        y_ref[0] = _group_fold(partial, d_blk, h_blk, Wp, W, F).astype(
            y_ref.dtype)
        return

    partial = partial.reshape(d_blk, h_blk + 2, Wp, 9 * F)
    acc = jnp.zeros((d_blk, h_blk, W, F), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            j = kh * 3 + kw
            acc = acc + partial[:, kh:kh + h_blk, kw:kw + W,
                                j * F:(j + 1) * F]
    y_ref[0] = acc.astype(y_ref.dtype)


def _conv3d_same_pallas(x: jax.Array, w: jax.Array, interpret: bool,
                        d_blk: int = _D_BLK, h_blk: int = _H_BLK,
                        slice_k: bool = True, pad_c: bool | None = None,
                        halo: bool | None = None):
    B, D, H, W, C = x.shape
    F = w.shape[-1]
    assert w.shape == (3, 3, 3, C, F), w.shape
    assert D % d_blk == 0 and H % h_blk == 0, (D, H, d_blk, h_blk)

    Wp = _round_up(W + 2, 8)
    # On a real TPU the manually-DMA'd HBM operand needs a 128-aligned minor
    # dim.  halo mode (lane-dense C, C % 128 == 0) skips the caller-side
    # pre-pad entirely: D/H halo from the edge-clamped DMA, W halo padded in
    # VMEM.  Otherwise C is padded to the lane tile by the XLA pre-pad.
    # Interpret mode has no alignment constraint and defaults to Cp=C, but
    # tests force pad_c=True / halo=True so both arithmetics are covered
    # without hardware.
    if halo is None:
        # C % 128 only: the halo DMA needs a 128-lane-aligned minor dim —
        # C = 64 was tried (to kill the 64^3 stages' ~27 ms/step pre-pads)
        # and the Mosaic compile rejects it (remote_compile 500, 2026-08-19).
        # At C % 128 the device path is parity-verified (halo == padded ==
        # f32 oracle to 7e-4 at (2,16,32,32,128)); opt-in because the
        # flagship config has no eligible 3^3 NDHWC stage at C % 128 == 0.
        import os as _os2
        halo = C % 128 == 0 and _os2.environ.get("CBIM_PLHALO") == "1"
    if halo:
        pad_c = False
    if pad_c is None:
        pad_c = not interpret
    Cp = _round_up(C, 128) if pad_c else C
    if halo:
        xp = x
    else:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, Wp - W - 1),
                         (0, Cp - C)))
    grouped = _use_grouped(F)
    n_w = 3 * _grp_g(F) if grouped else 9 * F
    wp = (_pack_weights_grouped(w) if grouped else _pack_weights(w)
          ).astype(x.dtype)
    if not slice_k and Cp != C:
        # zero rows for the padded channels: K = 3*Cp
        wp = wp.reshape(3, C, n_w)
        wp = jnp.pad(wp, ((0, 0), (0, Cp - C), (0, 0))).reshape(3 * Cp, n_w)
    k_dim = 3 * C if slice_k else 3 * Cp

    kernel = functools.partial(
        _conv_kernel, D=D, H=H, W=W, Wp=Wp, C=C, Cp=Cp, F=F,
        d_blk=d_blk, h_blk=h_blk, slice_k=slice_k, grouped=grouped,
        halo=halo)

    scratch_w = W if halo else Wp
    y = pl.pallas_call(
        kernel,
        grid=(B, D // d_blk, H // h_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xp stays in HBM
            pl.BlockSpec((k_dim, n_w), lambda b, d, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_blk, h_blk, W, F),
                               lambda b, d, h: (b, d, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 1, d_blk + 2, h_blk + 2, scratch_w, Cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wp)
    return y


def conv3d_same(x: jax.Array, w: jax.Array,
                interpret: bool | None = None) -> jax.Array:
    """Stride-1 SAME 3^3 conv, NDHWC: x[B,D,H,W,C], w[3,3,3,C,F] -> y[...,F].

    Exact lax.conv parity (f32 accumulation).  Forward only for now; wrap in
    jax.vjp-aware call sites via conv3d.py's custom_vjp once the backward
    kernels land.
    """
    import os
    if interpret is None:
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    slice_k = os.environ.get("CBIM_PLCONV_SLICEK", "1") == "1"
    # The f32 partial tile scales with (h_blk+2) * 9F: at F<=64 the default
    # h_blk=8 fits VMEM comfortably, but wider outputs (e.g. the dgrad of a
    # 96->32 conv runs this kernel with F=96) blow the 16 MB budget — shrink
    # the h tile for those.
    F = w.shape[-1]
    H = x.shape[2]
    h_blk = _H_BLK
    if F > 64:
        for cand in (4, 2):
            if H % cand == 0:
                h_blk = cand
                break
    return _conv3d_same_pallas(x, w, interpret, h_blk=h_blk, slice_k=slice_k)


# ---------------------------------------------------------------------------
# trainable wrapper: custom VJP
# ---------------------------------------------------------------------------

def _flip_swap(w: jax.Array) -> jax.Array:
    """dgrad weights: spatial flip + in/out channel swap.

    For a stride-1 SAME correlation y = x * w, the input gradient is the
    stride-1 SAME correlation of the upstream gradient with the spatially
    flipped kernel whose c/f axes are swapped — so the SAME forward kernel
    computes dgrad too.
    """
    return jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))


def _xla_conv_ndhwc(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@jax.custom_vjp
def conv3d_same_t(x: jax.Array, w: jax.Array) -> jax.Array:
    """Trainable stride-1 SAME 3^3 conv: Pallas forward AND input-gradient
    (the dgrad is the same tap-packed kernel run on the upstream gradient
    with flip-swapped weights); the weight gradient uses XLA's standard
    wgrad lowering (one voxel-contraction — K is huge there, so the MXU
    fill problem the forward kernel solves does not apply to it)."""
    return conv3d_same(x, w)


def _conv3d_t_fwd(x, w):
    return conv3d_same(x, w), (x, w)


def _conv3d_t_bwd(res, g):
    import os
    x, w = res
    g = g.astype(x.dtype)
    dx = conv3d_same(g, _flip_swap(w).astype(w.dtype))
    if os.environ.get("CBIM_PLWGRAD", "1") != "0":
        dw = conv3d_wgrad(x, g)
    else:
        _, w_vjp = jax.vjp(lambda wt: _xla_conv_ndhwc(x, wt), w)
        dw, = w_vjp(g)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_same_t.defvjp(_conv3d_t_fwd, _conv3d_t_bwd)


# ---------------------------------------------------------------------------
# weight gradient (wgrad) kernel
# ---------------------------------------------------------------------------
#
#   dW[kd, kh, kw, c, f] = sum_{b,d,h,w} xp[b, d+kd, h+kh, w+kw, c]
#                                      * g[b, d, h, w, f]
#
# Tap-packed like the forward: per (b, d-tile, h-tile), stack the three
# d-shifted input views into x3[M, 3C] (M spans the HALO'd h/w frame) and
# scatter the gradient tile into nine (kh, kw)-shifted positions of that
# same frame, G9[M, 9F].  One dot contracting M gives the full packed
# weight gradient dWp[3C, 9F] for the tile; a single f32 output block is
# accumulated across the (sequential) grid.  Unpacking dWp is exactly the
# inverse of _pack_weights.

def _build_g9(g, Wp, W, F, grouped):
    """Scatter the gradient tile g[d, h, W, F] into the nine (kh, kw)-shifted
    positions of the halo'd frame: [d, h+2, Wp, 9F] (flat packing) or
    [d, h+2, Wp, 3G] (grouped: each piece lane-padded straight to its
    F*kw offset inside a 128-aligned kh-group, groups summed full-width,
    then one aligned 3-way concat — avoids the nine misaligned 32-lane
    concat writes that dominated the flat build)."""
    if not grouped:
        shifted = [jnp.pad(g, ((0, 0), (kh, 2 - kh), (kw, Wp - W - kw),
                               (0, 0)))
                   for kh in range(3) for kw in range(3)]
        return jnp.concatenate(shifted, axis=-1)
    G = _grp_g(F)
    groups = []
    for kh in range(3):
        acc = None
        for kw in range(3):
            p = jnp.pad(g, ((0, 0), (kh, 2 - kh), (kw, Wp - W - kw),
                            (F * kw, G - F * (kw + 1))))
            acc = p if acc is None else acc + p
        groups.append(acc)
    return jnp.concatenate(groups, axis=-1)


def _unpack_dw_grouped(dwp: jax.Array, C: int, F: int) -> jax.Array:
    """Inverse of _pack_weights_grouped on the wgrad output:
    [3C, 3G] -> [3, 3, 3, C, F]."""
    G = _grp_g(F)
    dw = dwp.reshape(3, C, 3, G)[:, :, :, :3 * F].reshape(3, C, 3, 3, F)
    return dw.transpose(0, 2, 3, 1, 4)


def _wgrad_kernel(xp_hbm, g_ref, dw_ref, xt_ref, sem, *,
                  D: int, H: int, W: int, Wp: int, C: int, Cp: int, F: int,
                  d_blk: int, h_blk: int, slice_k: bool, grouped: bool,
                  halo: bool = False):
    b = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(2)
    n_total = pl.num_programs(0) * n_d * n_h
    idx = (b * n_d + di) * n_h + hi

    slot = jax.lax.rem(idx, 2)

    if halo:
        trail = (slice(None), slice(None))

        def tile_io(slot_, b_, di_, hi_, action, base=None):
            _halo_tile_dma(xp_hbm, xt_ref, sem, slot_, b_, di_, hi_, n_d,
                           n_h, d_blk, h_blk, trail, trail, action,
                           base=base)

        _zero_halo(xt_ref, slot, di, hi, n_d, n_h, d_blk, h_blk,
                   base=idx == 0)
        tile_io(slot, b, di, hi, "start", base=idx == 0)
        nxt = idx + 1
        nb = nxt // (n_d * n_h)
        nr = jax.lax.rem(nxt, n_d * n_h)
        ndi = nr // n_h
        nhi = jax.lax.rem(nr, n_h)
        nslot = jax.lax.rem(nxt, 2)
        _zero_halo(xt_ref, nslot, ndi, nhi, n_d, n_h, d_blk, h_blk,
                   base=nxt < n_total)
        tile_io(nslot, nb, ndi, nhi, "start", base=nxt < n_total)
        tile_io(slot, b, di, hi, "wait")
    else:
        def tile_dma(slot, b_, di_, hi_):
            return pltpu.make_async_copy(
                xp_hbm.at[pl.ds(b_, 1), pl.ds(di_ * d_blk, d_blk + 2),
                          pl.ds(hi_ * h_blk, h_blk + 2)],
                xt_ref.at[slot], sem.at[slot])

        @pl.when(idx == 0)
        def _():
            tile_dma(0, b, di, hi).start()

        nxt = idx + 1
        nb = nxt // (n_d * n_h)
        nr = jax.lax.rem(nxt, n_d * n_h)

        @pl.when(nxt < n_total)
        def _():
            tile_dma(jax.lax.rem(nxt, 2), nb, nr // n_h,
                     jax.lax.rem(nr, n_h)).start()

        tile_dma(slot, b, di, hi).wait()

    M = d_blk * (h_blk + 2) * Wp
    if halo:
        views = [jnp.pad(xt_ref[slot, 0, kd:kd + d_blk],
                         ((0, 0), (0, 0), (1, Wp - W - 1), (0, 0))
                         ).reshape(M, Cp)
                 for kd in range(3)]
    else:
        views = [xt_ref[slot, 0, kd:kd + d_blk].reshape(M, Cp)
                 for kd in range(3)]
    if slice_k:
        views = [v[:, :C] for v in views]
    x3 = jnp.concatenate(views, axis=1)                  # [M, 3C']

    g = g_ref[0]                                         # [d_blk, h_blk, W, F]
    g9 = _build_g9(g, Wp, W, F, grouped)
    dw = jax.lax.dot_general(x3, g9.reshape(M, -1), (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(idx == 0)
    def _():
        dw_ref[:] = dw

    @pl.when(idx > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw


def conv3d_wgrad(x: jax.Array, g: jax.Array,
                 interpret: bool | None = None,
                 d_blk: int = _D_BLK, h_blk: int | None = None,
                 pad_c: bool | None = None,
                 halo: bool | None = None) -> jax.Array:
    """Weight gradient of the stride-1 SAME 3^3 conv: x[B,D,H,W,C],
    g[B,D,H,W,F] -> dW[3,3,3,C,F] (f32).  Exact parity with the transpose
    rule of lax.conv_general_dilated up to f32 accumulation order."""
    import os
    if interpret is None:
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    B, D, H, W, C = x.shape
    F = g.shape[-1]
    assert g.shape == (B, D, H, W, F), (g.shape, x.shape)

    if h_blk is None:
        h_blk = _H_BLK
        # G9 frame is (h_blk+2) * Wp * 9F in g.dtype: shrink h for wide F
        if F > 64:
            for cand in (4, 2):
                if H % cand == 0:
                    h_blk = cand
                    break
    assert D % d_blk == 0 and H % h_blk == 0, (D, H, d_blk, h_blk)

    Wp = _round_up(W + 2, 8)
    if halo is None:
        # lane-dense C only: skip the pre-pad (see fwd; C=64 rejected by
        # Mosaic)
        halo = C % 128 == 0 and os.environ.get("CBIM_PLHALO") == "1"
    if halo:
        pad_c = False
    if pad_c is None:
        pad_c = not interpret
    Cp = _round_up(C, 128) if pad_c else C
    slice_k = os.environ.get("CBIM_PLCONV_SLICEK", "1") == "1"
    if halo:
        xp = x
    else:
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, Wp - W - 1),
                         (0, Cp - C)))
    k_dim = 3 * C if slice_k else 3 * Cp
    grouped = _use_grouped(F) and C <= 64
    n_w = 3 * _grp_g(F) if grouped else 9 * F

    kernel = functools.partial(
        _wgrad_kernel, D=D, H=H, W=W, Wp=Wp, C=C, Cp=Cp, F=F,
        d_blk=d_blk, h_blk=h_blk, slice_k=slice_k, grouped=grouped,
        halo=halo)

    scratch_w = W if halo else Wp
    dwp = pl.pallas_call(
        kernel,
        grid=(B, D // d_blk, H // h_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xp stays in HBM
            pl.BlockSpec((1, d_blk, h_blk, W, F),
                         lambda b, d, h: (b, d, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_dim, n_w), lambda b, d, h: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_dim, n_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 1, d_blk + 2, h_blk + 2, scratch_w, Cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, g)

    if not slice_k and Cp != C:
        dwp = dwp.reshape(3, Cp, n_w)[:, :C].reshape(3 * C, n_w)
    if grouped:
        return _unpack_dw_grouped(dwp, C, F)
    # inverse of _pack_weights: [(kd, c), (kh, kw, f)] -> [kd, kh, kw, c, f]
    dw = dwp.reshape(3, C, 3, 3, F).transpose(0, 2, 3, 1, 4)
    return dw


# ---------------------------------------------------------------------------
# NDHCW ("cw") variants: channels on sublanes, W on lanes
# ---------------------------------------------------------------------------
#
# A bf16 NDHWC tensor with C < 128 is physically lane-padded in HBM (C=32
# occupies 32 of 128 lanes -> 4x memory and bandwidth).  Storing the stage
# tensors as [B, D, H, C, W] instead puts W (typically 128) on the lanes and
# C on the sublanes: DENSE in HBM, so the pre-pad, the kernel's tile DMAs,
# the output writes, and every surrounding elementwise/norm op move 4x less
# data at full-res widths.  The MXU math is unchanged: each tile is
# transposed C<->W **in VMEM** (cheap — VPU shuffles) back into the proven
# tap-packed form, and the output tile is transposed back before the store.
#
# Caller contract: x_cw[B, D, H, C, W] is passed UNPADDED.  The D/H zero
# halo is restored per-tile by an edge-clamped DMA plus VMEM border zeroing
# (_halo_tile_dma/_zero_halo); the W halo + lane alignment is materialized
# in VMEM after the per-tile transpose.

def _halo_valid_mask(di, hi, d_blk: int, h_blk: int, n_d: int, n_h: int,
                     shape, d_axis: int = 0, h_axis: int = 1):
    """Validity mask over a halo'd tile: True where the global (d, h)
    coordinate lies inside the volume.  Used by the norm-act ("na") kernel
    variants: SAME zero padding applies to the NORMED input, so after the
    in-kernel norm+act the out-of-volume halo rows must be re-zeroed (a raw
    zero would otherwise normalize to act(-mean*rstd) != 0)."""
    D = n_d * d_blk
    H = n_h * h_blk
    gd = jax.lax.broadcasted_iota(jnp.int32, shape, d_axis) + di * d_blk - 1
    gh = jax.lax.broadcasted_iota(jnp.int32, shape, h_axis) + hi * h_blk - 1
    return (gd >= 0) & (gd < D) & (gh >= 0) & (gh < H)


def _na_apply(t, stat_ref, mask, act: str | None, dtype):
    """act((t - mean) * rstd) in f32, out-of-volume positions zeroed, cast
    back to the compute dtype.  ``stat_ref`` block is (1, 2, C, 1); the
    caller passes ``cmean``/``crstd`` shaped to broadcast against t."""
    from .fused_norm import _act_fn
    mean, rstd = stat_ref
    n = (t.astype(jnp.float32) - mean) * rstd
    n = _act_fn(act)(n)
    return jnp.where(mask, n, 0.0).astype(dtype)


def _na_apply_slabs(load_slab, na_ref, stats, di, hi, d_blk: int, h_blk: int,
                    n_d: int, n_h: int, act, h_axis: int):
    """Apply norm+act per d-slab into the explicit VMEM scratch ``na_ref``,
    inside a ``fori_loop`` so the stack is ONE slab's worth of temps.

    The erf chain keeps ~a dozen f32 temps live; applied to the whole halo'd
    tile at once — or even per-slab in an UNROLLED loop — the Mosaic stack
    allocator sums every temp ever created (measured 19.7-36.8 MB of scoped
    stack vs the 16 MB limit).  A fori_loop body is a single allocation
    region reused across iterations, bounding the live f32 set to one
    (h+2, ...) slab.

    ``load_slab(i)``: returns slab i of the halo'd tile in na_ref's layout;
    ``h_axis``: position of the h dim inside a slab (0 for both layouts:
    (h+2, W, C) and (h+2, C, W)).  Out-of-volume d rows reduce to a scalar
    predicate per slab; h rows to an iota mask."""
    D = n_d * d_blk
    H = n_h * h_blk
    slab_shape = na_ref.shape[1:]
    gh = (jax.lax.broadcasted_iota(jnp.int32, slab_shape, h_axis)
          + hi * h_blk - 1)
    h_ok = (gh >= 0) & (gh < H)

    def body(i, carry):
        gd = di * d_blk - 1 + i
        mask = h_ok & (gd >= 0) & (gd < D)
        na_ref[i] = _na_apply(load_slab(i), stats, mask, act, na_ref.dtype)
        return carry

    jax.lax.fori_loop(0, d_blk + 2, body, 0)


def _conv_kernel_cw(x_hbm, wp_ref, y_ref, xt_ref, sem, *,
                    W: int, Wp: int, C: int, F: int,
                    d_blk: int, h_blk: int, grouped: bool):
    b = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(2)
    n_total = pl.num_programs(0) * n_d * n_h
    idx = (b * n_d + di) * n_h + hi

    # x_hbm is the UNPADDED [B, D, H, C, W] tensor: the D/H zero halo is
    # restored per-tile (edge-clamped DMA + VMEM border zeroing) instead of
    # the former caller-side jnp.pad, which cost one full HBM write+read of
    # the stage tensor per conv.
    trail = (slice(None), slice(None))

    def tile_io(slot_, b_, di_, hi_, action, base=None):
        _halo_tile_dma(x_hbm, xt_ref, sem, slot_, b_, di_, hi_, n_d, n_h,
                       d_blk, h_blk, trail, trail, action, base=base)

    slot = jax.lax.rem(idx, 2)

    _zero_halo(xt_ref, slot, di, hi, n_d, n_h, d_blk, h_blk, base=idx == 0)
    tile_io(slot, b, di, hi, "start", base=idx == 0)

    nxt = idx + 1
    nb = nxt // (n_d * n_h)
    nr = jax.lax.rem(nxt, n_d * n_h)
    ndi = nr // n_h
    nhi = jax.lax.rem(nr, n_h)
    nslot = jax.lax.rem(nxt, 2)
    _zero_halo(xt_ref, nslot, ndi, nhi, n_d, n_h, d_blk, h_blk,
               base=nxt < n_total)
    tile_io(nslot, nb, ndi, nhi, "start", base=nxt < n_total)

    tile_io(slot, b, di, hi, "wait")

    # [d+2, h+2, C, W] -> [d+2, h+2, W, C] in VMEM, then W halo + alignment
    t = jnp.transpose(xt_ref[slot, 0], (0, 1, 3, 2))
    tp = jnp.pad(t, ((0, 0), (0, 0), (1, Wp - W - 1), (0, 0)))

    M = d_blk * (h_blk + 2) * Wp
    views = [tp[kd:kd + d_blk].reshape(M, C) for kd in range(3)]
    x3 = jnp.concatenate(views, axis=1)

    partial = jnp.dot(x3, wp_ref[:], preferred_element_type=jnp.float32)

    if grouped:
        acc = _group_fold(partial, d_blk, h_blk, Wp, W, F)
        y_ref[0] = jnp.transpose(acc, (0, 1, 3, 2)).astype(y_ref.dtype)
        return

    partial = partial.reshape(d_blk, h_blk + 2, Wp, 9 * F)
    acc = jnp.zeros((d_blk, h_blk, W, F), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            j = kh * 3 + kw
            acc = acc + partial[:, kh:kh + h_blk, kw:kw + W,
                                j * F:(j + 1) * F]
    y_ref[0] = jnp.transpose(acc, (0, 1, 3, 2)).astype(y_ref.dtype)


def conv3d_same_cw(x: jax.Array, w: jax.Array,
                   interpret: bool | None = None,
                   d_blk: int = _D_BLK, h_blk: int | None = None) -> jax.Array:
    """Stride-1 SAME 3^3 conv in NDHCW layout: x[B,D,H,C,W], w[3,3,3,C,F]
    -> y[B,D,H,F,W].  Exact lax.conv parity (f32 accumulation) on the
    NDHWC-transposed data; verified by tests/test_pallas_conv.py."""
    if interpret is None:
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    B, D, H, C, W = x.shape
    F = w.shape[-1]
    assert w.shape == (3, 3, 3, C, F), (w.shape, x.shape)
    grouped = _use_grouped(F)
    if h_blk is None:
        h_blk = _H_BLK
        if F > 64:                      # f32 partial scales with 9F
            for cand in (4, 2):
                if H % cand == 0:
                    h_blk = cand
                    break
        elif F <= 32 and grouped and H % 16 == 0:
            # measured faster at the full-res F=32 regime (less halo slop,
            # fewer grid steps); the f32 partial (2*18*Wp*384B) still fits
            h_blk = 16
    assert D % d_blk == 0 and H % h_blk == 0, (D, H, d_blk, h_blk)

    Wp = _round_up(W + 2, 8)
    # no pre-pad at all: the D/H halo is materialized per-tile by the
    # edge-clamped DMA (W halo + lane alignment already live in VMEM), so
    # the input rides from HBM exactly once
    n_w = 3 * _grp_g(F) if grouped else 9 * F
    wp = (_pack_weights_grouped(w) if grouped else _pack_weights(w)
          ).astype(x.dtype)

    kernel = functools.partial(
        _conv_kernel_cw, W=W, Wp=Wp, C=C, F=F, d_blk=d_blk, h_blk=h_blk,
        grouped=grouped)

    y = pl.pallas_call(
        kernel,
        grid=(B, D // d_blk, H // h_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xp stays in HBM
            pl.BlockSpec((3 * C, n_w), lambda b, d, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_blk, h_blk, F, W),
                               lambda b, d, h: (b, d, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, F, W), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 1, d_blk + 2, h_blk + 2, C, W), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, wp)
    return y


def _wgrad_kernel_cw(x_hbm, g_ref, dw_ref, xt_ref, sem, *,
                     W: int, Wp: int, C: int, F: int,
                     d_blk: int, h_blk: int, grouped: bool):
    b = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(2)
    n_total = pl.num_programs(0) * n_d * n_h
    idx = (b * n_d + di) * n_h + hi

    # unpadded x_hbm + edge-clamped halo DMA, as in _conv_kernel_cw
    trail = (slice(None), slice(None))

    def tile_io(slot_, b_, di_, hi_, action, base=None):
        _halo_tile_dma(x_hbm, xt_ref, sem, slot_, b_, di_, hi_, n_d, n_h,
                       d_blk, h_blk, trail, trail, action, base=base)

    slot = jax.lax.rem(idx, 2)

    _zero_halo(xt_ref, slot, di, hi, n_d, n_h, d_blk, h_blk, base=idx == 0)
    tile_io(slot, b, di, hi, "start", base=idx == 0)

    nxt = idx + 1
    nb = nxt // (n_d * n_h)
    nr = jax.lax.rem(nxt, n_d * n_h)
    ndi = nr // n_h
    nhi = jax.lax.rem(nr, n_h)
    nslot = jax.lax.rem(nxt, 2)
    _zero_halo(xt_ref, nslot, ndi, nhi, n_d, n_h, d_blk, h_blk,
               base=nxt < n_total)
    tile_io(nslot, nb, ndi, nhi, "start", base=nxt < n_total)

    tile_io(slot, b, di, hi, "wait")

    t = jnp.transpose(xt_ref[slot, 0], (0, 1, 3, 2))   # [d+2, h+2, W, C]
    tp = jnp.pad(t, ((0, 0), (0, 0), (1, Wp - W - 1), (0, 0)))
    M = d_blk * (h_blk + 2) * Wp
    views = [tp[kd:kd + d_blk].reshape(M, C) for kd in range(3)]
    x3 = jnp.concatenate(views, axis=1)                  # [M, 3C]

    g = jnp.transpose(g_ref[0], (0, 1, 3, 2))            # [d_blk, h_blk, W, F]
    g9 = _build_g9(g, Wp, W, F, grouped)
    dw = jax.lax.dot_general(x3, g9.reshape(M, -1), (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(idx == 0)
    def _():
        dw_ref[:] = dw

    @pl.when(idx > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw


def conv3d_wgrad_cw(x: jax.Array, g: jax.Array,
                    interpret: bool | None = None,
                    d_blk: int = _D_BLK, h_blk: int | None = None) -> jax.Array:
    """Weight gradient in NDHCW layout: x[B,D,H,C,W], g[B,D,H,F,W]
    -> dW[3,3,3,C,F] (f32)."""
    if interpret is None:
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    B, D, H, C, W = x.shape
    F = g.shape[3]
    assert g.shape == (B, D, H, F, W), (g.shape, x.shape)
    if h_blk is None:
        h_blk = _H_BLK
        if F > 64:
            for cand in (4, 2):
                if H % cand == 0:
                    h_blk = cand
                    break
    assert D % d_blk == 0 and H % h_blk == 0, (D, H, d_blk, h_blk)

    Wp = _round_up(W + 2, 8)
    grouped = _use_grouped(F) and C <= 64
    n_w = 3 * _grp_g(F) if grouped else 9 * F

    kernel = functools.partial(
        _wgrad_kernel_cw, W=W, Wp=Wp, C=C, F=F, d_blk=d_blk, h_blk=h_blk,
        grouped=grouped)

    dwp = pl.pallas_call(
        kernel,
        grid=(B, D // d_blk, H // h_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, d_blk, h_blk, F, W),
                         lambda b, d, h: (b, d, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * C, n_w), lambda b, d, h: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * C, n_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 1, d_blk + 2, h_blk + 2, C, W), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, g)

    if grouped:
        return _unpack_dw_grouped(dwp, C, F)
    dw = dwp.reshape(3, C, 3, 3, F).transpose(0, 2, 3, 1, 4)
    return dw


# ---------------------------------------------------------------------------
# cw2: transpose-free NDHCW forward
# ---------------------------------------------------------------------------
#
# The _conv_kernel_cw relayout t = (C, W)->(W, C) is a lane<->sublane
# transpose — the expensive relayout class (~3 ms of the ~8.7 ms C32 conv,
# tools/probe_cw_dissect.py).  This variant keeps W on the lanes end to end:
#
#     partial[(kw, kh, f), (d, h~, w)] = sum_{kd, c}
#         W2[(kw, kh, f), (kd, c)] * xs[(kd, c), (d, h~, w)]
#
# xs needs C moved above (d, h~) — a sublane<->outer swap (no lane
# crossing).  The kh-fold is then three ALIGNED row-group adds with an
# h~-slice, and the kw-fold is a +-1 lane roll with the first/last lane
# masked to zero — which IS the SAME-conv w halo, so no w padding exists
# anywhere.  The output [F, d, h, W] -> [d, h, F, W] write-back is another
# sublane<->outer swap.  Same FLOPs and f32 accumulation as the cw kernel.

def _pack_weights_cw2(w: jax.Array) -> jax.Array:
    """w[3, 3, 3, C, F] (kd, kh, kw, c, f) -> W2[(kw, kh, f) = 9F, (kd, c) = 3C]."""
    return jnp.transpose(w, (2, 1, 4, 0, 3)).reshape(-1, 3 * w.shape[3])


def _conv_kernel_cw2(x_hbm, wp_ref, y_ref, xt_ref, sem, *,
                     W: int, C: int, F: int, d_blk: int, h_blk: int):
    b = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(2)
    n_total = pl.num_programs(0) * n_d * n_h
    idx = (b * n_d + di) * n_h + hi

    trail = (slice(None), slice(None))

    def tile_io(slot_, b_, di_, hi_, action, base=None):
        _halo_tile_dma(x_hbm, xt_ref, sem, slot_, b_, di_, hi_, n_d, n_h,
                       d_blk, h_blk, trail, trail, action, base=base)

    slot = jax.lax.rem(idx, 2)

    _zero_halo(xt_ref, slot, di, hi, n_d, n_h, d_blk, h_blk, base=idx == 0)
    tile_io(slot, b, di, hi, "start", base=idx == 0)

    nxt = idx + 1
    nb = nxt // (n_d * n_h)
    nr = jax.lax.rem(nxt, n_d * n_h)
    ndi = nr // n_h
    nhi = jax.lax.rem(nr, n_h)
    nslot = jax.lax.rem(nxt, 2)
    _zero_halo(xt_ref, nslot, ndi, nhi, n_d, n_h, d_blk, h_blk,
               base=nxt < n_total)
    tile_io(nslot, nb, ndi, nhi, "start", base=nxt < n_total)

    tile_io(slot, b, di, hi, "wait")

    # xs[(kd c), (d h~ w)]: sublane<->outer swap, W stays on the lanes
    xs = jnp.concatenate(
        [jnp.transpose(xt_ref[slot, 0, kd:kd + d_blk], (2, 0, 1, 3))
         for kd in range(3)], axis=0)
    N = d_blk * (h_blk + 2) * W
    partial = jnp.dot(wp_ref[:], xs.reshape(3 * C, N),
                      preferred_element_type=jnp.float32)
    p = partial.reshape(9, F, d_blk, h_blk + 2, W)

    lane = jax.lax.broadcasted_iota(
        jnp.int32, (F, d_blk, h_blk, W), 3)
    acc = jnp.zeros((F, d_blk, h_blk, W), jnp.float32)
    for kw in range(3):
        # aligned kh-fold for this kw: row-group select + h~ slice
        t = (p[kw * 3 + 0, :, :, 0:h_blk]
             + p[kw * 3 + 1, :, :, 1:1 + h_blk]
             + p[kw * 3 + 2, :, :, 2:2 + h_blk])
        if kw == 0:
            # y[w] += t[w-1]: roll right, lane 0 takes the zero w-halo
            acc = acc + jnp.where(lane == 0, 0.0, pltpu.roll(t, 1, 3))
        elif kw == 2:
            # y[w] += t[w+1]: roll left (= right by W-1), last lane takes
            # the zero w-halo
            acc = acc + jnp.where(lane == W - 1, 0.0, pltpu.roll(t, W - 1, 3))
        else:
            acc = acc + t
    y_ref[0] = jnp.transpose(acc, (1, 2, 0, 3)).astype(y_ref.dtype)


def conv3d_same_cw2(x: jax.Array, w: jax.Array,
                    interpret: bool | None = None,
                    d_blk: int = _D_BLK,
                    h_blk: int | None = None) -> jax.Array:
    """Transpose-free NDHCW stride-1 SAME 3^3 conv: x[B,D,H,C,W],
    w[3,3,3,C,F] -> y[B,D,H,F,W].  Same math as conv3d_same_cw (f32
    accumulation); verified by tests/test_pallas_conv.py."""
    if interpret is None:
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    B, D, H, C, W = x.shape
    F = w.shape[-1]
    assert w.shape == (3, 3, 3, C, F), (w.shape, x.shape)
    if h_blk is None:
        # f32 partial is 9F * d_blk * (h_blk+2) * W * 4B
        h_blk = _H_BLK
        for cand in (8, 4, 2):
            if H % cand == 0 and 9 * F * d_blk * (cand + 2) * W * 4 <= 2 ** 22:
                h_blk = cand
                break
    assert D % d_blk == 0 and H % h_blk == 0, (D, H, d_blk, h_blk)

    wp = _pack_weights_cw2(w).astype(x.dtype)

    kernel = functools.partial(
        _conv_kernel_cw2, W=W, C=C, F=F, d_blk=d_blk, h_blk=h_blk)

    y = pl.pallas_call(
        kernel,
        grid=(B, D // d_blk, H // h_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec((9 * F, 3 * C), lambda b, d, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_blk, h_blk, F, W),
                               lambda b, d, h: (b, d, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, F, W), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 1, d_blk + 2, h_blk + 2, C, W), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, wp)
    return y


# ---------------------------------------------------------------------------
# layout movers: NDHWC <-> NDHCW
# ---------------------------------------------------------------------------
#
# Left to XLA on purpose: a Pallas relayout kernel (VMEM tile transpose per
# (b, d, h-slab)) was measured SLOWER end-to-end (2.25 -> 2.17 vols/s at
# 64 KB tiles, 2.18 at 2 MB tiles) — XLA fuses these transposes into the
# neighbouring elementwise ops, and an opaque custom call forces extra
# materialisation on both sides.

def to_cw(x: jax.Array) -> jax.Array:
    """[B, D, H, W, C] -> [B, D, H, C, W] (stage entry)."""
    return jnp.transpose(x, (0, 1, 2, 4, 3))


def from_cw(x: jax.Array) -> jax.Array:
    """[B, D, H, C, W] -> [B, D, H, W, C] (stage exit)."""
    return jnp.transpose(x, (0, 1, 2, 4, 3))


@jax.custom_vjp
def conv3d_same_cw_t(x: jax.Array, w: jax.Array) -> jax.Array:
    """Trainable NDHCW stride-1 SAME 3^3 conv: Pallas forward, dgrad (same
    kernel on the flip-swapped weights) and wgrad, all in the dense
    channels-on-sublanes layout."""
    return conv3d_same_cw(x, w)


def _conv3d_cw_t_fwd(x, w):
    return conv3d_same_cw(x, w), (x, w)


def _conv3d_cw_t_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = conv3d_same_cw(g, _flip_swap(w).astype(w.dtype))
    # wgrad uses the cw2 batched-dot kernel: transpose-free, measured ~2x
    # faster than the rotate-based cw wgrad (5.69 vs 10.74 ms at
    # 2x128^3 C32->F32, tools/probe_newkernels.py 2026-08-18, max rel
    # diff 7e-7 on device).  That shape is exactly the grouped-packing
    # regime (_use_grouped(F) and C<=64) the cw wgrad is best at, so the
    # default holds for small F too; CBIM_WGRAD_CW2=0 opts out.
    if _os.environ.get("CBIM_WGRAD_CW2", "1") != "0":
        dw = conv3d_wgrad_cw2(x, g)
    else:
        dw = conv3d_wgrad_cw(x, g)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_same_cw_t.defvjp(_conv3d_cw_t_fwd, _conv3d_cw_t_bwd)


# ------------------------------------------------------------- cw2 wgrad
#
# Same transpose-free discipline for the weight gradient.  The contraction
# pairs x-lanes with g-lanes, so instead of rotating one operand (the cw
# wgrad's C<->W transpose), contract the W lanes directly with a BATCHED
# dot over the (d, h~) rows:
#
#     dW2[(kw, kh, f), (kd, c)] = sum_{(d, h~)}  g9[(d, h~), (kw, kh, f), :W]
#                                              @ xs[(d, h~), (kd, c),     :W]^T
#
# xs is just the kd-concat of tile views (C stays on sublanes); g9 places g
# into the h~ frame at offset kh (outer-dim pads) and handles kw by the
# same +-1 lane roll + boundary mask as the cw2 forward.

def _wgrad_kernel_cw2(x_hbm, g_ref, dw_ref, xt_ref, sem, *,
                      W: int, C: int, F: int, d_blk: int, h_blk: int):
    b = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(2)
    n_total = pl.num_programs(0) * n_d * n_h
    idx = (b * n_d + di) * n_h + hi

    trail = (slice(None), slice(None))

    def tile_io(slot_, b_, di_, hi_, action, base=None):
        _halo_tile_dma(x_hbm, xt_ref, sem, slot_, b_, di_, hi_, n_d, n_h,
                       d_blk, h_blk, trail, trail, action, base=base)

    slot = jax.lax.rem(idx, 2)

    _zero_halo(xt_ref, slot, di, hi, n_d, n_h, d_blk, h_blk, base=idx == 0)
    tile_io(slot, b, di, hi, "start", base=idx == 0)
    nxt = idx + 1
    nb = nxt // (n_d * n_h)
    nr = jax.lax.rem(nxt, n_d * n_h)
    ndi = nr // n_h
    nhi = jax.lax.rem(nr, n_h)
    nslot = jax.lax.rem(nxt, 2)
    _zero_halo(xt_ref, nslot, ndi, nhi, n_d, n_h, d_blk, h_blk,
               base=nxt < n_total)
    tile_io(nslot, nb, ndi, nhi, "start", base=nxt < n_total)
    tile_io(slot, b, di, hi, "wait")

    Bt = d_blk * (h_blk + 2)
    # xs[(d, h~), (kd c), w]: pure views + concat, no relayout
    xs = jnp.concatenate(
        [xt_ref[slot, 0, kd:kd + d_blk] for kd in range(3)],
        axis=2).reshape(Bt, 3 * C, W)

    g = g_ref[0]                                   # [d, h, F, W]
    lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, 3)
    # g'_kw[w] = g[w - kw + 1] with zeros rolled in at the w boundary.
    # Mosaic has no bf16 lane rotate ("Rotate with non-32-bit data"), so
    # the two shifted variants roll an f32 upcast and cast back (exact).
    g32 = g.astype(jnp.float32)
    gk = [jnp.where(lane == W - 1, 0.0,
                    pltpu.roll(g32, W - 1, 3)).astype(g.dtype),     # kw=0
          g,                                                        # kw=1
          jnp.where(lane == 0, 0.0,
                    pltpu.roll(g32, 1, 3)).astype(g.dtype)]         # kw=2
    g9 = jnp.concatenate(
        [jnp.pad(gk[kw], ((0, 0), (kh, 2 - kh), (0, 0), (0, 0)))
         for kw in range(3) for kh in range(3)],
        axis=2).reshape(Bt, 9 * F, W)

    part = jax.lax.dot_general(g9, xs, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
    dw = jnp.sum(part, axis=0)                     # [9F, 3C]

    @pl.when(idx == 0)
    def _():
        dw_ref[:] = dw

    @pl.when(idx > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw


def conv3d_wgrad_cw2(x: jax.Array, g: jax.Array,
                     interpret: bool | None = None,
                     d_blk: int = _D_BLK,
                     h_blk: int | None = None) -> jax.Array:
    """Transpose-free NDHCW weight gradient: x[B,D,H,C,W], g[B,D,H,F,W]
    -> dW[3,3,3,C,F] (f32)."""
    if interpret is None:
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    B, D, H, C, W = x.shape
    F = g.shape[3]
    assert g.shape == (B, D, H, F, W), (g.shape, x.shape)
    if h_blk is None:
        h_blk = _H_BLK
        # g9 frame is 9F * d_blk * (h_blk+2) * W in g.dtype
        if F > 64:
            for cand in (4, 2):
                if H % cand == 0:
                    h_blk = cand
                    break
    assert D % d_blk == 0 and H % h_blk == 0, (D, H, d_blk, h_blk)

    kernel = functools.partial(
        _wgrad_kernel_cw2, W=W, C=C, F=F, d_blk=d_blk, h_blk=h_blk)

    dwp = pl.pallas_call(
        kernel,
        grid=(B, D // d_blk, H // h_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, d_blk, h_blk, F, W),
                         lambda b, d, h: (b, d, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * F, 3 * C), lambda b, d, h: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * F, 3 * C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 1, d_blk + 2, h_blk + 2, C, W), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, g)
    # rows (kw, kh, f), cols (kd, c) -> dW[kd, kh, kw, c, f]
    dw = dwp.reshape(3, 3, F, 3, C).transpose(3, 1, 0, 4, 2)
    return dw


@jax.custom_vjp
def conv3d_same_cw2_t(x: jax.Array, w: jax.Array) -> jax.Array:
    """Trainable transpose-free NDHCW conv: cw2 forward, dgrad (the cw2
    kernel on the flip-swapped weights) and the batched-dot cw2 wgrad."""
    return conv3d_same_cw2(x, w)


def _conv3d_cw2_t_fwd(x, w):
    return conv3d_same_cw2(x, w), (x, w)


def _conv3d_cw2_t_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = conv3d_same_cw2(g, _flip_swap(w).astype(w.dtype))
    dw = conv3d_wgrad_cw2(x, g)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_same_cw2_t.defvjp(_conv3d_cw2_t_fwd, _conv3d_cw2_t_bwd)


# ---------------------------------------------------------------------------
# "na" variants: preact InstanceNorm+act fused INTO the conv kernels
# ---------------------------------------------------------------------------
#
# The preact ConvNormAct chain (reference conv_layers.py:16-53 with
# preact=True) is  x -> InstanceNorm -> act -> conv.  Unfused, the norm
# apply + act costs one full elementwise HBM pass of the stage tensor per
# conv (profiled ~2 ms/call at 2x128^3x32, ~30 ms/step total with remat
# recompute — tools/profile_step.py r3).  These variants read the RAW x tile
# and apply act((x - mean) * rstd) in VMEM right before the matmul, so the
# normed-activated tensor never exists in HBM:
#
#   stats:  one Pallas pass over x (fused_norm._stats_kernel_cw, the
#           device-verified kernel) -> (B, 2, C, 1) mean/rstd
#   fw:     conv3d_same_cw_na(x, stat, w)  = conv(act(norm(x)))
#   bwd:    dxn  = cw dgrad of g (unchanged kernel, flip-swapped weights)
#           dw   = conv3d_wgrad_cw2_na(x, stat, g)  (pre-applies na to x)
#           dx   = fused_norm._backward_cw(x, dxn, stat)  (device-verified)
#
# SAME-padding correctness: zero padding applies to the NORMED input, so the
# kernels re-zero out-of-volume halo rows AFTER the apply (_halo_valid_mask).

def _conv_kernel_cw_na(x_hbm, stat_ref, wp_ref, y_ref, xt_ref, na_ref, sem, *,
                       W: int, Wp: int, C: int, F: int,
                       d_blk: int, h_blk: int, grouped: bool, act):
    b = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(2)
    n_total = pl.num_programs(0) * n_d * n_h
    idx = (b * n_d + di) * n_h + hi

    trail = (slice(None), slice(None))

    def tile_io(slot_, b_, di_, hi_, action, base=None):
        _halo_tile_dma(x_hbm, xt_ref, sem, slot_, b_, di_, hi_, n_d, n_h,
                       d_blk, h_blk, trail, trail, action, base=base)

    slot = jax.lax.rem(idx, 2)

    _zero_halo(xt_ref, slot, di, hi, n_d, n_h, d_blk, h_blk, base=idx == 0)
    tile_io(slot, b, di, hi, "start", base=idx == 0)
    nxt = idx + 1
    nb = nxt // (n_d * n_h)
    nr = jax.lax.rem(nxt, n_d * n_h)
    ndi = nr // n_h
    nhi = jax.lax.rem(nr, n_h)
    nslot = jax.lax.rem(nxt, 2)
    _zero_halo(xt_ref, nslot, ndi, nhi, n_d, n_h, d_blk, h_blk,
               base=nxt < n_total)
    tile_io(nslot, nb, ndi, nhi, "start", base=nxt < n_total)
    tile_io(slot, b, di, hi, "wait")

    # per-slab: [h+2, C, W] -> [h+2, W, C] transpose (C to lanes) + the
    # norm+act apply with out-of-volume re-zeroing, looped through the na
    # scratch to bound the f32 temp set; then W halo + alignment
    mean = stat_ref[0, 0, :, 0]                      # (C,): lane broadcast
    rstd = stat_ref[0, 1, :, 0]
    _na_apply_slabs(lambda i: jnp.transpose(xt_ref[slot, 0, i], (0, 2, 1)),
                    na_ref, (mean, rstd), di, hi, d_blk, h_blk,
                    n_d, n_h, act, h_axis=0)
    tp = jnp.pad(na_ref[:], ((0, 0), (0, 0), (1, Wp - W - 1), (0, 0)))

    M = d_blk * (h_blk + 2) * Wp
    views = [tp[kd:kd + d_blk].reshape(M, C) for kd in range(3)]
    x3 = jnp.concatenate(views, axis=1)

    partial = jnp.dot(x3, wp_ref[:], preferred_element_type=jnp.float32)

    if grouped:
        acc = _group_fold(partial, d_blk, h_blk, Wp, W, F)
        y_ref[0] = jnp.transpose(acc, (0, 1, 3, 2)).astype(y_ref.dtype)
        return

    partial = partial.reshape(d_blk, h_blk + 2, Wp, 9 * F)
    acc = jnp.zeros((d_blk, h_blk, W, F), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            j = kh * 3 + kw
            acc = acc + partial[:, kh:kh + h_blk, kw:kw + W,
                                j * F:(j + 1) * F]
    y_ref[0] = jnp.transpose(acc, (0, 1, 3, 2)).astype(y_ref.dtype)


def conv3d_same_cw_na(x: jax.Array, stat: jax.Array, w: jax.Array,
                      act=None, interpret: bool | None = None,
                      d_blk: int = _D_BLK,
                      h_blk: int | None = None) -> jax.Array:
    """Stride-1 SAME 3^3 conv of the normed-activated input, NDHCW layout:
    y = conv(act((x - mean) * rstd)), x[B,D,H,C,W], stat[B,2,C,1] f32,
    w[3,3,3,C,F] -> y[B,D,H,F,W].  The norm+act happens per-tile in VMEM."""
    if interpret is None:
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    B, D, H, C, W = x.shape
    F = w.shape[-1]
    assert w.shape == (3, 3, 3, C, F), (w.shape, x.shape)
    assert stat.shape == (B, 2, C, 1), (stat.shape, x.shape)
    grouped = _use_grouped(F)
    if h_blk is None:
        # the in-kernel f32 norm+act chain (erf polynomial) keeps ~a dozen
        # full-tile f32 temps live; h_blk=16 measured 36.8M of scoped stack
        # (16M limit) at C32/W128, so the na variant caps at 8
        h_blk = _H_BLK
        if F > 64:
            for cand in (4, 2):
                if H % cand == 0:
                    h_blk = cand
                    break
    assert D % d_blk == 0 and H % h_blk == 0, (D, H, d_blk, h_blk)

    Wp = _round_up(W + 2, 8)
    n_w = 3 * _grp_g(F) if grouped else 9 * F
    wp = (_pack_weights_grouped(w) if grouped else _pack_weights(w)
          ).astype(x.dtype)

    kernel = functools.partial(
        _conv_kernel_cw_na, W=W, Wp=Wp, C=C, F=F, d_blk=d_blk, h_blk=h_blk,
        grouped=grouped, act=act)

    y = pl.pallas_call(
        kernel,
        grid=(B, D // d_blk, H // h_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec((1, 2, C, 1), lambda b, d, h: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C, n_w), lambda b, d, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d_blk, h_blk, F, W),
                               lambda b, d, h: (b, d, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, F, W), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 1, d_blk + 2, h_blk + 2, C, W), x.dtype),
            pltpu.VMEM((d_blk + 2, h_blk + 2, W, C), x.dtype),   # na slabs
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, stat, wp)
    return y


def _wgrad_kernel_cw2_na(x_hbm, stat_ref, g_ref, dw_ref, xt_ref, na_ref, sem,
                         *, W: int, C: int, F: int, d_blk: int, h_blk: int,
                         act):
    b = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(2)
    n_total = pl.num_programs(0) * n_d * n_h
    idx = (b * n_d + di) * n_h + hi

    trail = (slice(None), slice(None))

    def tile_io(slot_, b_, di_, hi_, action, base=None):
        _halo_tile_dma(x_hbm, xt_ref, sem, slot_, b_, di_, hi_, n_d, n_h,
                       d_blk, h_blk, trail, trail, action, base=base)

    slot = jax.lax.rem(idx, 2)

    _zero_halo(xt_ref, slot, di, hi, n_d, n_h, d_blk, h_blk, base=idx == 0)
    tile_io(slot, b, di, hi, "start", base=idx == 0)
    nxt = idx + 1
    nb = nxt // (n_d * n_h)
    nr = jax.lax.rem(nxt, n_d * n_h)
    ndi = nr // n_h
    nhi = jax.lax.rem(nr, n_h)
    nslot = jax.lax.rem(nxt, 2)
    _zero_halo(xt_ref, nslot, ndi, nhi, n_d, n_h, d_blk, h_blk,
               base=nxt < n_total)
    tile_io(nslot, nb, ndi, nhi, "start", base=nxt < n_total)
    tile_io(slot, b, di, hi, "wait")

    # pre-apply norm+act on the raw tile [d+2, h+2, C, W] (C on sublanes),
    # slab-at-a-time through the na scratch to bound the f32 temp set
    mean = stat_ref[0, 0]                            # (C, 1): W broadcast
    rstd = stat_ref[0, 1]
    _na_apply_slabs(lambda i: xt_ref[slot, 0, i], na_ref, (mean, rstd),
                    di, hi, d_blk, h_blk, n_d, n_h, act, h_axis=0)
    tile = na_ref[:]

    Bt = d_blk * (h_blk + 2)
    xs = jnp.concatenate(
        [tile[kd:kd + d_blk] for kd in range(3)],
        axis=2).reshape(Bt, 3 * C, W)

    g = g_ref[0]                                   # [d, h, F, W]
    lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, 3)
    g32 = g.astype(jnp.float32)
    gk = [jnp.where(lane == W - 1, 0.0,
                    pltpu.roll(g32, W - 1, 3)).astype(g.dtype),     # kw=0
          g,                                                        # kw=1
          jnp.where(lane == 0, 0.0,
                    pltpu.roll(g32, 1, 3)).astype(g.dtype)]         # kw=2
    g9 = jnp.concatenate(
        [jnp.pad(gk[kw], ((0, 0), (kh, 2 - kh), (0, 0), (0, 0)))
         for kw in range(3) for kh in range(3)],
        axis=2).reshape(Bt, 9 * F, W)

    part = jax.lax.dot_general(g9, xs, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
    dw = jnp.sum(part, axis=0)                     # [9F, 3C]

    @pl.when(idx == 0)
    def _():
        dw_ref[:] = dw

    @pl.when(idx > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw


def conv3d_wgrad_cw2_na(x: jax.Array, stat: jax.Array, g: jax.Array,
                        act=None, interpret: bool | None = None,
                        d_blk: int = _D_BLK,
                        h_blk: int | None = None) -> jax.Array:
    """Weight gradient of conv3d_same_cw_na: contracts the upstream gradient
    against the normed-activated input, recomputed per-tile in VMEM from the
    raw x and the (B,2,C,1) stats."""
    if interpret is None:
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    B, D, H, C, W = x.shape
    F = g.shape[3]
    assert g.shape == (B, D, H, F, W), (g.shape, x.shape)
    assert stat.shape == (B, 2, C, 1), (stat.shape, x.shape)
    if h_blk is None:
        h_blk = _H_BLK
        if F > 64:
            for cand in (4, 2):
                if H % cand == 0:
                    h_blk = cand
                    break
    assert D % d_blk == 0 and H % h_blk == 0, (D, H, d_blk, h_blk)

    kernel = functools.partial(
        _wgrad_kernel_cw2_na, W=W, C=C, F=F, d_blk=d_blk, h_blk=h_blk,
        act=act)

    dwp = pl.pallas_call(
        kernel,
        grid=(B, D // d_blk, H // h_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2, C, 1), lambda b, d, h: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_blk, h_blk, F, W),
                         lambda b, d, h: (b, d, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * F, 3 * C), lambda b, d, h: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * F, 3 * C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 1, d_blk + 2, h_blk + 2, C, W), x.dtype),
            pltpu.VMEM((d_blk + 2, h_blk + 2, C, W), x.dtype),   # na slabs
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, stat, g)
    dw = dwp.reshape(3, 3, F, 3, C).transpose(3, 1, 0, 4, 2)
    return dw


def _cw_stats(x: jax.Array, eps: float, interpret: bool) -> jax.Array:
    """(B, 2, C, 1) f32 [mean, rstd] over (D, H, W) of x[B, D, H, C, W],
    via the device-verified fused_norm cw stats kernel."""
    from . import fused_norm as fn
    B, D, H, C, W = x.shape
    x4 = x.reshape(B, D * H, C, W)
    block, n_s = fn._grids_cw(D * H)
    sums = pl.pallas_call(
        functools.partial(fn._stats_kernel_cw, S=D * H, block=block),
        grid=(B, n_s),
        in_specs=[fn._row_spec_cw(block, C, W)],
        out_specs=fn._sum_spec_cw(C, W),
        out_shape=jax.ShapeDtypeStruct((B, 2, C, W), jnp.float32),
        interpret=interpret,
    )(x4)
    n = D * H * W
    tot = jnp.sum(sums, axis=3)                       # (B, 2, C)
    mean = tot[:, 0] / n
    var = jnp.maximum(tot[:, 1] / n - mean * mean, 0.0)
    return jnp.stack([mean, jax.lax.rsqrt(var + eps)], axis=1)[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_inorm_act_cw_t(x: jax.Array, w: jax.Array, eps: float,
                        act) -> jax.Array:
    """Trainable fused preact ConvNormAct in NDHCW layout:
    y = conv3x3_same(act(instance_norm(x, eps))), x[B,D,H,C,W],
    w[3,3,3,C,F] -> y[B,D,H,F,W].

    Forward = one stats pass + one conv kernel with the norm+act applied
    per-tile in VMEM (the normed tensor never touches HBM).  Backward:
    dgrad on the upstream gradient (unchanged cw kernel), the na wgrad,
    and the device-verified fused_norm cw backward for dx (which folds the
    stats' own dependence on x — exact InstanceNorm VJP)."""
    from .._backend import is_tpu_backend
    interpret = not is_tpu_backend()
    stat = _cw_stats(x, eps, interpret)
    return conv3d_same_cw_na(x, stat, w.astype(x.dtype), act,
                             interpret=interpret)


def _conv_na_fwd(x, w, eps, act):
    from .._backend import is_tpu_backend
    interpret = not is_tpu_backend()
    stat = _cw_stats(x, eps, interpret)
    y = conv3d_same_cw_na(x, stat, w.astype(x.dtype), act,
                          interpret=interpret)
    return y, (x, w, stat)


def _conv_na_bwd(eps, act, res, g):
    from . import fused_norm as fn
    from .._backend import is_tpu_backend
    interpret = not is_tpu_backend()
    x, w, stat = res
    g = g.astype(x.dtype)
    # dxn: gradient wrt the normed-activated input = SAME conv of g with
    # flip-swapped weights (identical to the plain conv dgrad)
    dxn = conv3d_same_cw(g, _flip_swap(w).astype(x.dtype),
                         interpret=interpret)
    dw = conv3d_wgrad_cw2_na(x, stat, g, act, interpret=interpret)
    B, D, H, C, W = x.shape
    dx = fn._backward_cw(x.reshape(B, D * H, C, W),
                         dxn.reshape(B, D * H, C, W), stat, act,
                         interpret).reshape(x.shape)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv_inorm_act_cw_t.defvjp(_conv_na_fwd, _conv_na_bwd)
