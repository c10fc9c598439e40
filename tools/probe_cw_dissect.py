"""Probe: dissect the NDHCW (cw) Pallas conv kernel phase by phase.

Builds a ladder of kernel variants, each adding one phase, so the on-device
delta between consecutive rungs isolates that phase's cost:

    dma        halo'd tile DMA only (output written from a constant)
    +trans     + the VMEM C<->W transpose + W-halo pad
    +dot       + the [M,3C]x[3C,9F] MXU contraction (no reduce; writes a
               slice of the partial, mathematically wrong on purpose)
    full       + the 9-term shifted reduce + output transpose (the real op)

All variants share the grid, DMA pattern, and output block shape of the
production kernel (ops/pallas/conv3d.py _conv_kernel_cw).  Probe-only:
every rung except `full` produces wrong outputs by design.

Run on the real TPU:  python tools/probe_cw_dissect.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cbim_tpu.ops.pallas.conv3d import _pack_weights, _round_up


def _pack_weights_grouped(w):
    """w[3,3,3,C,F] -> wp[3C, 3*G] with G = roundup(3F,128): column block for
    tap (kh,kw) lives at lane offset G*kh + F*kw (zero-padded to G per group),
    so the kernel's kh-fold reads 128-aligned lane groups."""
    import numpy as _np
    k3, _, _, C, F = w.shape
    G = _round_up(3 * F, 128)
    wp = jnp.transpose(w, (0, 3, 1, 2, 4)).reshape(3 * C, 3, 3 * F)
    wp = jnp.pad(wp, ((0, 0), (0, 0), (0, G - 3 * F)))
    return wp.reshape(3 * C, 3 * G)


def _kernel(xp_hbm, wp_ref, y_ref, xt_ref, sem, *,
            W, Wp, C, F, d_blk, h_blk, phase):
    b = pl.program_id(0)
    di = pl.program_id(1)
    hi = pl.program_id(2)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(2)
    n_total = pl.num_programs(0) * n_d * n_h
    idx = (b * n_d + di) * n_h + hi

    def tile_dma(slot, b_, di_, hi_):
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(b_, 1), pl.ds(di_ * d_blk, d_blk + 2),
                      pl.ds(hi_ * h_blk, h_blk + 2)],
            xt_ref.at[slot], sem.at[slot])

    slot = jax.lax.rem(idx, 2)

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

    if phase == "dma":
        # touch the tile so the DMA isn't dead-code-eliminated (slice, not
        # scalar extract: mosaic only supports 32-bit scalar extracts)
        y_ref[0] = jnp.broadcast_to(xt_ref[slot, 0, 0, 0:1, 0:1, :W],
                                    (d_blk, h_blk, F, W)).astype(y_ref.dtype)
        return

    t = jnp.transpose(xt_ref[slot, 0], (0, 1, 3, 2))
    tp = jnp.pad(t, ((0, 0), (0, 0), (1, Wp - W - 1), (0, 0)))

    if phase == "trans":
        y_ref[0] = jnp.transpose(
            tp[:d_blk, 1:1 + h_blk, 1:1 + W, :1], (0, 1, 3, 2)
        ).astype(y_ref.dtype) + jnp.zeros((d_blk, h_blk, F, W), y_ref.dtype)
        return

    M = d_blk * (h_blk + 2) * Wp
    views = [tp[kd:kd + d_blk].reshape(M, C) for kd in range(3)]
    x3 = jnp.concatenate(views, axis=1)

    if phase in ("grp", "grpr"):
        # grouped packing: three 128-aligned kh groups; fold kh full-width,
        # then only 3 narrow misaligned slice-adds remain (kw)
        G = _round_up(3 * F, 128)
        partial = jnp.dot(x3, wp_ref[:], preferred_element_type=jnp.float32)
        partial = partial.reshape(d_blk, h_blk + 2, Wp, 3 * G)
        T = (partial[:, 0:h_blk, :, 0:G]
             + partial[:, 1:1 + h_blk, :, G:2 * G]
             + partial[:, 2:2 + h_blk, :, 2 * G:3 * G])
        if phase == "grpr":
            # full-width lane rolls instead of misaligned narrow slices
            acc = (T[:, :, 0:W, 0:F]
                   + pltpu.roll(T, G - F, 3)[:, :, 1:1 + W, 0:F]
                   + pltpu.roll(T, G - 2 * F, 3)[:, :, 2:2 + W, 0:F])
        else:
            acc = (T[:, :, 0:W, 0:F]
                   + T[:, :, 1:1 + W, F:2 * F]
                   + T[:, :, 2:2 + W, 2 * F:3 * F])
        y_ref[0] = jnp.transpose(acc, (0, 1, 3, 2)).astype(y_ref.dtype)
        return

    partial = jnp.dot(x3, wp_ref[:], preferred_element_type=jnp.float32)
    partial = partial.reshape(d_blk, h_blk + 2, Wp, 9 * F)

    if phase == "dot":
        y_ref[0] = jnp.transpose(
            partial[:, 1:1 + h_blk, 1:1 + W, :F], (0, 1, 3, 2)
        ).astype(y_ref.dtype)
        return

    acc = jnp.zeros((d_blk, h_blk, W, F), jnp.float32)
    if phase == "red_lane":
        # 9 misaligned 32-lane slices, NO kw sublane shift
        for kh in range(3):
            for kw in range(3):
                j = kh * 3 + kw
                acc = acc + partial[:, kh:kh + h_blk, 1:1 + W,
                                    j * F:(j + 1) * F]
        y_ref[0] = jnp.transpose(acc, (0, 1, 3, 2)).astype(y_ref.dtype)
        return
    if phase == "red_sub":
        # 9 kw sublane shifts, aligned lane block 0 only
        for kh in range(3):
            for kw in range(3):
                acc = acc + partial[:, kh:kh + h_blk, kw:kw + W, :F]
        y_ref[0] = jnp.transpose(acc, (0, 1, 3, 2)).astype(y_ref.dtype)
        return
    if phase == "red_resh":
        # ONE lane->sublane relayout, then all 9 slice-adds are on free axes
        p5 = partial.reshape(d_blk, h_blk + 2, Wp, 9, F)
        for kh in range(3):
            for kw in range(3):
                j = kh * 3 + kw
                acc = acc + p5[:, kh:kh + h_blk, kw:kw + W, j]
        y_ref[0] = jnp.transpose(acc, (0, 1, 3, 2)).astype(y_ref.dtype)
        return
    for kh in range(3):
        for kw in range(3):
            j = kh * 3 + kw
            acc = acc + partial[:, kh:kh + h_blk, kw:kw + W,
                                j * F:(j + 1) * F]
    y_ref[0] = jnp.transpose(acc, (0, 1, 3, 2)).astype(y_ref.dtype)


def build(x, w, phase, d_blk=2, h_blk=8):
    B, D, H, C, W = x.shape
    F = w.shape[-1]
    Wp = _round_up(W + 2, 8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    if phase in ("grp", "grpr"):
        wp = _pack_weights_grouped(w).astype(x.dtype)
        n_w = 3 * _round_up(3 * F, 128)
    else:
        wp = _pack_weights(w).astype(x.dtype)
        n_w = 9 * F
    kernel = functools.partial(_kernel, W=W, Wp=Wp, C=C, F=F,
                               d_blk=d_blk, h_blk=h_blk, phase=phase)
    return pl.pallas_call(
        kernel,
        grid=(B, D // d_blk, H // h_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
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
    )(xp, wp)


def _sync(x):
    np.asarray(x.ravel()[0])


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for (B, D, H, W, C, F) in [(2, 128, 128, 128, 32, 32),
                               (2, 128, 128, 128, 96, 32)]:
        x = jnp.asarray(rng.normal(size=(B, D, H, C, W)), dtype=jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)) * 0.1,
                        dtype=jnp.bfloat16)
        prev = 0.0
        print(f"B{B} {D}x{H}x{W} C{C}->F{F}:")
        for phase in ("dot", "grp", "grpr", "full"):
            fn = jax.jit(lambda x, w, p=phase: build(x, w, p))
            t = timeit(fn, x, w)
            print(f"  {phase:6s} {t:7.2f} ms   (+{t - prev:6.2f})")
            prev = t
        for (db, hb) in ((4, 8), (2, 16), (4, 4)):
            if D % db or H % hb:
                continue
            fn = jax.jit(lambda x, w, db=db, hb=hb: build(x, w, "grp", db, hb))
            try:
                t = timeit(fn, x, w)
                print(f"  grp d{db}h{hb} {t:7.2f} ms")
            except Exception as e:
                print(f"  grp d{db}h{hb} FAILED: {str(e)[:80]}")
        y_full = np.asarray(jax.jit(lambda x, w: build(x, w, "full"))(x, w)
                            .astype(jnp.float32))
        y_grp = np.asarray(jax.jit(lambda x, w: build(x, w, "grp"))(x, w)
                           .astype(jnp.float32))
        print(f"  grp-vs-full max|d| = {np.max(np.abs(y_full - y_grp)):.3e}")


if __name__ == "__main__":
    main()
