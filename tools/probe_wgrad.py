#!/usr/bin/env python
"""Device-time probe: XLA wgrad vs Pallas tap-packed wgrad (conv3d_wgrad).

Shapes: the full-res regimes of the MedFormer-AMOS step.  Timing rules from
ROUND1_NOTES: wall-clock on the tunneled backend lies for sub-ms ops, so
each variant runs in a lax.fori-free loop of REPS dependent calls and is
timed end-to-end after a tiny-readback sync; with REPS large the per-launch
overhead amortizes away.

Usage: python tools/probe_wgrad.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cbim_tpu.ops.pallas.conv3d import conv3d_wgrad

    def xla_wgrad(x, g):
        def f(w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        w0 = jnp.zeros((3, 3, 3, x.shape[-1], g.shape[-1]), x.dtype)
        _, vjp = jax.vjp(f, w0)
        return vjp(g)[0]

    shapes = [
        ((2, 128, 128, 128, 32), 32),   # inc
        ((2, 64, 64, 64, 64), 64),      # down1/up3
        ((2, 128, 128, 128, 96), 32),   # up4 concat conv (wide C)
    ]
    for (shape, F) in shapes:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32)
                        ).astype(jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=shape[:-1] + (F,)).astype(np.float32)
                        ).astype(jnp.bfloat16)

        B, D, H, W, C = shape
        flops = 2 * B * D * H * W * 27 * C * F

        for name, fn in [("xla", xla_wgrad), ("pallas", conv3d_wgrad)]:
            @jax.jit
            def loop(x, g, fn=fn):
                def body(_, carry):
                    acc, g = carry
                    dw = fn(x, g)
                    acc = acc + dw.astype(jnp.float32).sum()
                    g = g + 0 * acc.astype(g.dtype)   # serialize iterations
                    return acc, g
                acc, _ = jax.lax.fori_loop(0, REPS, body,
                                           (jnp.zeros((), jnp.float32), g))
                return acc

            r = loop(x, g)
            np.asarray(r)                 # sync (block_until_ready lies on axon)
            t0 = time.time()
            r = loop(x, g)
            np.asarray(r)
            dt = (time.time() - t0) / REPS
            print(f"{shape} F={F} {name:7s}: {dt * 1e3:8.2f} ms  "
                  f"{flops / dt / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
