"""Tap-packed Pallas conv2d for small channel counts (the 2D zoo's regime).

Dimension-reduction of the proven conv3d kernels (ops/pallas/conv3d.py):
XLA lowers a stride-1 3x3 NHWC conv as per-tap matmuls with (C_in x C_out)
MXU tiles — 32/128 lanes at the 2D models' base_chan=32.  Packing the
h-axis taps into the contraction gives K = (kh, c) = 3C and leaves only the
kw fold:

    partial[(h, w~), (kw, f)] = sum_{kh, c} xp[h+kh, w~, c] * W2[kh, kw, c, f]
    y[h, w, f] = sum_{kw} partial[(h, w+kw), (kw, f)]

Grouped packing pads each kw block to a 128-lane group so the fold reads
aligned lane groups (same trick as conv3d's _pack_weights_grouped).

Exact-math parity with lax.conv_general_dilated (NHWC, SAME, stride 1) up
to f32 accumulation order; verified by tests/test_pallas_conv2d.py.

Status: interpret-parity tested; NOT yet measured on a real TPU (built
during the round-2 tunnel outage) — dispatch is opt-in via CBIM_PLCONV2D=1
until a device measurement lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv3d import _round_up

_H_BLK2 = 8


def _grp_g2(F: int) -> int:
    """Lane width of one kw-group in the 2D grouped packing."""
    return _round_up(F, 128)


def _use_grouped2(F: int) -> bool:
    return F <= 128


def _pack_weights2(w: jax.Array, grouped: bool) -> jax.Array:
    """w[3, 3, C, F] (kh, kw, c, f) -> W2[(kh, c) = 3C, (kw, f)-packed].

    Flat: columns (kw, f) = 3F.  Grouped: each kw block zero-padded to
    G = roundup(F, 128) so the kernel's kw-fold reads aligned lane groups.
    """
    k3, k3b, C, F = w.shape
    assert (k3, k3b) == (3, 3), w.shape
    wp = jnp.transpose(w, (0, 2, 1, 3)).reshape(3 * C, 3, F)   # (kh c) kw f
    if grouped:
        G = _grp_g2(F)
        wp = jnp.pad(wp, ((0, 0), (0, 0), (0, G - F)))
        return wp.reshape(3 * C, 3 * G)
    return wp.reshape(3 * C, 3 * F)


def _conv_kernel2(xp_hbm, wp_ref, y_ref, xt_ref, sem, *,
                  H: int, W: int, Wp: int, C: int, Cp: int, F: int,
                  h_blk: int, slice_k: bool, grouped: bool):
    b = pl.program_id(0)
    hi = pl.program_id(1)
    n_h = pl.num_programs(1)
    n_total = pl.num_programs(0) * n_h
    idx = b * n_h + hi

    def tile_dma(slot, b_, hi_):
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(b_, 1), pl.ds(hi_ * h_blk, h_blk + 2)],
            xt_ref.at[slot], sem.at[slot])

    slot = jax.lax.rem(idx, 2)

    @pl.when(idx == 0)
    def _():
        tile_dma(0, b, hi).start()

    nxt = idx + 1

    @pl.when(nxt < n_total)
    def _():
        tile_dma(jax.lax.rem(nxt, 2), nxt // n_h,
                 jax.lax.rem(nxt, n_h)).start()

    tile_dma(slot, b, hi).wait()

    M = h_blk * Wp
    # X3: three h-shifted views stacked on the channel axis -> K = (kh, c)
    views = [xt_ref[slot, 0, kh:kh + h_blk].reshape(M, Cp)
             for kh in range(3)]
    if slice_k:
        views = [v[:, :C] for v in views]
    x3 = jnp.concatenate(views, axis=1)

    partial = jnp.dot(x3, wp_ref[:], preferred_element_type=jnp.float32)

    if grouped:
        G = _grp_g2(F)
        p = partial.reshape(h_blk, Wp, 3 * G)
        y_ref[0] = (p[:, 0:W, 0:F]
                    + p[:, 1:1 + W, G:G + F]
                    + p[:, 2:2 + W, 2 * G:2 * G + F]).astype(y_ref.dtype)
        return

    p = partial.reshape(h_blk, Wp, 3 * F)
    y_ref[0] = (p[:, 0:W, 0:F]
                + p[:, 1:1 + W, F:2 * F]
                + p[:, 2:2 + W, 2 * F:3 * F]).astype(y_ref.dtype)


def conv2d_same(x: jax.Array, w: jax.Array,
                interpret: bool | None = None,
                h_blk: int | None = None,
                pad_c: bool | None = None) -> jax.Array:
    """Stride-1 SAME 3x3 conv, NHWC: x[B,H,W,C], w[3,3,C,F] -> y[...,F]."""
    import os
    if interpret is None:
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    B, H, W, C = x.shape
    F = w.shape[-1]
    assert w.shape == (3, 3, C, F), (w.shape, x.shape)
    if h_blk is None:
        h_blk = _H_BLK2
        for cand in (32, 16):     # 2D rows are cheap; bigger tiles amortize
            if H % cand == 0 and 3 * _grp_g2(F) * (cand) * (W + 2) * 4 < 2 ** 22:
                h_blk = cand
                break
    assert H % h_blk == 0, (H, h_blk)

    Wp = _round_up(W + 2, 8)
    if pad_c is None:
        pad_c = not interpret
    Cp = _round_up(C, 128) if pad_c else C
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, Cp - C)))
    grouped = _use_grouped2(F)
    n_w = 3 * _grp_g2(F) if grouped else 3 * F
    wp = _pack_weights2(w, grouped).astype(x.dtype)
    slice_k = os.environ.get("CBIM_PLCONV_SLICEK", "1") == "1"
    if not slice_k and Cp != C:
        wp = wp.reshape(3, C, n_w)
        wp = jnp.pad(wp, ((0, 0), (0, Cp - C), (0, 0))).reshape(3 * Cp, n_w)
    k_dim = 3 * C if slice_k else 3 * Cp

    kernel = functools.partial(
        _conv_kernel2, H=H, W=W, Wp=Wp, C=C, Cp=Cp, F=F,
        h_blk=h_blk, slice_k=slice_k, grouped=grouped)

    y = pl.pallas_call(
        kernel,
        grid=(B, H // h_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # xp stays in HBM
            pl.BlockSpec((k_dim, n_w), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_blk, W, F), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, F), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 1, h_blk + 2, Wp, Cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wp)
    return y


# ---------------------------------------------------------------- backward

def _flip_swap2(w: jax.Array) -> jax.Array:
    """dgrad weights: spatial flip + in/out channel swap."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


def _wgrad_kernel2(xp_hbm, g_ref, dw_ref, xt_ref, sem, *,
                   H: int, W: int, Wp: int, C: int, Cp: int, F: int,
                   h_blk: int, slice_k: bool, grouped: bool):
    b = pl.program_id(0)
    hi = pl.program_id(1)
    n_h = pl.num_programs(1)
    n_total = pl.num_programs(0) * n_h
    idx = b * n_h + hi

    def tile_dma(slot, b_, hi_):
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(b_, 1), pl.ds(hi_ * h_blk, h_blk + 2)],
            xt_ref.at[slot], sem.at[slot])

    slot = jax.lax.rem(idx, 2)

    @pl.when(idx == 0)
    def _():
        tile_dma(0, b, hi).start()

    nxt = idx + 1

    @pl.when(nxt < n_total)
    def _():
        tile_dma(jax.lax.rem(nxt, 2), nxt // n_h,
                 jax.lax.rem(nxt, n_h)).start()

    tile_dma(slot, b, hi).wait()

    M = h_blk * Wp
    views = [xt_ref[slot, 0, kh:kh + h_blk].reshape(M, Cp)
             for kh in range(3)]
    if slice_k:
        views = [v[:, :C] for v in views]
    x3 = jnp.concatenate(views, axis=1)                  # [M, 3C']

    g = g_ref[0]                                         # [h_blk, W, F]
    if grouped:
        G = _grp_g2(F)
        g3 = jnp.concatenate(
            [jnp.pad(g, ((0, 0), (kw, Wp - W - kw), (0, G - F)))
             for kw in range(3)], axis=-1)
    else:
        g3 = jnp.concatenate(
            [jnp.pad(g, ((0, 0), (kw, Wp - W - kw), (0, 0)))
             for kw in range(3)], axis=-1)
    dw = jax.lax.dot_general(x3, g3.reshape(M, -1), (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(idx == 0)
    def _():
        dw_ref[:] = dw

    @pl.when(idx > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw


def conv2d_wgrad(x: jax.Array, g: jax.Array,
                 interpret: bool | None = None,
                 h_blk: int | None = None,
                 pad_c: bool | None = None) -> jax.Array:
    """Weight gradient of the stride-1 SAME 3x3 conv: x[B,H,W,C],
    g[B,H,W,F] -> dW[3,3,C,F] (f32)."""
    import os
    if interpret is None:
        from .._backend import is_tpu_backend
        interpret = not is_tpu_backend()
    B, H, W, C = x.shape
    F = g.shape[-1]
    assert g.shape == (B, H, W, F), (g.shape, x.shape)
    if h_blk is None:
        h_blk = _H_BLK2
        for cand in (32, 16):
            if H % cand == 0 and 3 * _grp_g2(F) * cand * (W + 2) * 4 < 2 ** 22:
                h_blk = cand
                break
    assert H % h_blk == 0, (H, h_blk)

    Wp = _round_up(W + 2, 8)
    if pad_c is None:
        pad_c = not interpret
    Cp = _round_up(C, 128) if pad_c else C
    slice_k = os.environ.get("CBIM_PLCONV_SLICEK", "1") == "1"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, Cp - C)))
    k_dim = 3 * C if slice_k else 3 * Cp
    grouped = _use_grouped2(F) and C <= 64
    n_w = 3 * _grp_g2(F) if grouped else 3 * F

    kernel = functools.partial(
        _wgrad_kernel2, H=H, W=W, Wp=Wp, C=C, Cp=Cp, F=F,
        h_blk=h_blk, slice_k=slice_k, grouped=grouped)

    dwp = pl.pallas_call(
        kernel,
        grid=(B, H // h_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, h_blk, W, F), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_dim, n_w), lambda b, h: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_dim, n_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 1, h_blk + 2, Wp, Cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, g)

    if not slice_k and Cp != C:
        dwp = dwp.reshape(3, Cp, n_w)[:, :C].reshape(3 * C, n_w)
    if grouped:
        G = _grp_g2(F)
        dw = dwp.reshape(3, C, 3, G)[:, :, :, :F]
        return dw.transpose(0, 2, 1, 3)
    # [(kh, c), (kw, f)] -> [kh, kw, c, f]
    return dwp.reshape(3, C, 3, F).transpose(0, 2, 1, 3)


@jax.custom_vjp
def conv2d_same_t(x: jax.Array, w: jax.Array) -> jax.Array:
    """Trainable stride-1 SAME 3x3 conv: Pallas forward, dgrad (same kernel,
    flip-swapped weights) and tap-packed wgrad."""
    return conv2d_same(x, w)


def _conv2d_t_fwd(x, w):
    return conv2d_same(x, w), (x, w)


def _conv2d_t_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = conv2d_same(g, _flip_swap2(w).astype(w.dtype))
    dw = conv2d_wgrad(x, g)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv2d_same_t.defvjp(_conv2d_t_fwd, _conv2d_t_bwd)
