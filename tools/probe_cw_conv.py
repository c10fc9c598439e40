"""Probe: NDHCW (cw) Pallas conv vs the NDHWC Pallas conv vs XLA, on-device.

Times the three lowerings of the same stride-1 SAME 3^3 conv at the
MedFormer full-res geometries, including the caller-side pre-pad cost
(which is the point: the cw path's D/H-only dense pad moves 4x less HBM
than the NDHWC path's lane-padded [.., Wp, 128] pre-pad at C=32).

Run on the real TPU:  python tools/probe_cw_conv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cbim_tpu.ops.pallas.conv3d import (conv3d_same, conv3d_same_cw,
                                        conv3d_wgrad, conv3d_wgrad_cw)


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])   # axon: force readback


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
    cases = [
        # (B, D, H, W, C, F) — the full-res stage geometries
        (2, 128, 128, 128, 32, 32),    # inc / up4 interior conv
        (2, 128, 128, 128, 96, 32),    # up4 entry conv (concat input)
        (2, 64, 64, 128, 64, 64),      # hypothetical W=128 64ch stage
    ]
    for B, D, H, W, C, F in cases:
        x = jnp.asarray(rng.normal(size=(B, D, H, W, C)),
                        dtype=jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)) * 0.1,
                        dtype=jnp.bfloat16)
        x_cw = jnp.transpose(x, (0, 1, 2, 4, 3))
        g = jnp.asarray(rng.normal(size=(B, D, H, W, F)), dtype=jnp.bfloat16)
        g_cw = jnp.transpose(g, (0, 1, 2, 4, 3))

        xla = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
        pl_nc = jax.jit(conv3d_same)
        pl_cw = jax.jit(conv3d_same_cw)

        t_xla = timeit(xla, x, w)
        t_nc = timeit(pl_nc, x, w)
        t_cw = timeit(pl_cw, x_cw, w)
        # parity check on-device
        y_nc = np.asarray(pl_nc(x, w).astype(jnp.float32))
        y_cw = np.asarray(jnp.transpose(pl_cw(x_cw, w),
                                        (0, 1, 2, 4, 3)).astype(jnp.float32))
        err = np.max(np.abs(y_nc - y_cw))
        print(f"[fw ] B{B} {D}x{H}x{W} C{C}->F{F}: "
              f"xla {t_xla:7.2f} ms | pl-ndhwc {t_nc:7.2f} ms | "
              f"pl-cw {t_cw:7.2f} ms | max|d| {err:.3e}")

        wg_nc = jax.jit(conv3d_wgrad)
        wg_cw = jax.jit(conv3d_wgrad_cw)
        t_wg_nc = timeit(wg_nc, x, g)
        t_wg_cw = timeit(wg_cw, x_cw, g_cw)
        dw_nc = np.asarray(wg_nc(x, g))
        dw_cw = np.asarray(wg_cw(x_cw, g_cw))
        err_w = np.max(np.abs(dw_nc - dw_cw))
        print(f"[wg ] B{B} {D}x{H}x{W} C{C}->F{F}: "
              f"pl-ndhwc {t_wg_nc:7.2f} ms | pl-cw {t_wg_cw:7.2f} ms | "
              f"max|d| {err_w:.3e}")


if __name__ == "__main__":
    main()
