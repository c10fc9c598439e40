"""Probe: transpose-free cw2 conv kernel vs the production cw kernel.

Times conv3d_same_cw (VMEM lane<->sublane transpose per tile) against
conv3d_same_cw2 (W-on-lanes end to end: sublane<->outer input swap,
aligned kh-fold, +-1 lane-roll kw-fold) at the MedFormer full-res
geometries, and checks parity on device.

Run on the real TPU:  python tools/probe_cw2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cbim_tpu.ops.pallas.conv3d import conv3d_same_cw, conv3d_same_cw2


def _sync(x):
    np.asarray(x.ravel()[0])   # axon: force readback


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for (B, D, H, W, C, F) in [(2, 128, 128, 128, 32, 32),
                               (2, 128, 128, 128, 96, 32),
                               (2, 128, 128, 128, 32, 16),
                               (2, 64, 64, 128, 64, 64)]:
        x = jnp.asarray(rng.normal(size=(B, D, H, C, W)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = (jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32))
             * 0.2).astype(jnp.bfloat16)
        f1 = jax.jit(conv3d_same_cw)
        f2 = jax.jit(conv3d_same_cw2)
        y1 = f1(x, w)
        y2 = f2(x, w)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                    - y2.astype(jnp.float32))))
        t1 = timeit(f1, x, w)
        t2 = timeit(f2, x, w)
        gflop = 2 * 27 * C * F * B * D * H * W / 1e9
        print(f"B{B} {D}x{H}x{W} C{C}->F{F}: cw {t1:6.2f} ms "
              f"({gflop/t1:5.1f} TF/s)  cw2 {t2:6.2f} ms "
              f"({gflop/t2:5.1f} TF/s)  max|d|={err:.3e}", flush=True)


if __name__ == "__main__":
    main()
