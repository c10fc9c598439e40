#!/usr/bin/env python
"""De-risk probe for the round-2 NDHCW conv design (ROUND1_NOTES round-2
plan): measure Mosaic's dot_general contracting dim 0 of BOTH operands —
out[i, j] = sum_k a[k, i] * w[k, j] — which is the transpose-free matmul
form available when activations carry C on sublanes and W on lanes.

Two shapes per grid step, mirroring the planned kernel:
  batched : one dot  [96, 2560] x [96, 288]  (20 slabs packed into lanes)
  slabloop: 20 dots  [96, 128]  x [96, 288]  (per-(d,h) slab)

Prints ms and effective TFLOP/s for a conv's worth of MACs.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLABS = 20
K = 96
N = 288
WLANES = 128


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    TILES = 2048          # one conv's worth at (2, 128^3): 2048 tiles

    def batched_kernel(a_ref, w_ref, o_ref):
        # out [N, SLABS*WLANES] = sum_k w[k, j] * a[k, m] - contract dim0 x dim0
        o_ref[0] = jax.lax.dot_general(
            w_ref[:], a_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    def slabloop_kernel(a_ref, w_ref, o_ref):
        for s in range(SLABS):
            out = jax.lax.dot_general(
                w_ref[:], a_ref[0, :, s * WLANES:(s + 1) * WLANES],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, :, s * WLANES:(s + 1) * WLANES] = out.astype(o_ref.dtype)

    a = jnp.zeros((TILES, K, SLABS * WLANES), jnp.bfloat16)
    w = jnp.zeros((K, N), jnp.bfloat16)

    def make(kernel):
        return jax.jit(lambda a, w: pl.pallas_call(
            kernel,
            grid=(TILES,),
            in_specs=[pl.BlockSpec((1, K, SLABS * WLANES),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((K, N), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, N, SLABS * WLANES),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TILES, N, SLABS * WLANES),
                                           jnp.bfloat16))(
                a.reshape(TILES, K, SLABS * WLANES), w))

    # NB: a is passed 3D already; reshape above is a no-op
    sync = jax.jit(lambda y: jnp.sum(y[0, 0].astype(jnp.float32)))
    flops = 2.0 * TILES * K * N * SLABS * WLANES

    for name, kern in [("batched", batched_kernel),
                       ("slabloop", slabloop_kernel)]:
        try:
            fn = make(kern)
            y = fn(a, w)
            np.asarray(sync(y))
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                y = fn(a, w)
            np.asarray(sync(y))
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:9s} {dt*1e3:7.2f} ms   {flops/dt/1e12:6.1f} TFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"{name:9s} FAILED: {str(e)[:300]}", flush=True)


def big_square():
    """Calibration: can one Pallas dot reach full-chip matmul throughput?"""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import time

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    M = N = Kd = 1024
    TILES = 64

    def kern(a_ref, b_ref, o_ref):
        o_ref[0] = jnp.dot(a_ref[0], b_ref[:],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)

    a = jnp.zeros((TILES, M, Kd), jnp.bfloat16)
    b = jnp.zeros((Kd, N), jnp.bfloat16)
    fn = jax.jit(lambda a, b: pl.pallas_call(
        kern, grid=(TILES,),
        in_specs=[pl.BlockSpec((1, M, Kd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Kd, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES, M, N), jnp.bfloat16))(a, b))
    sync = jax.jit(lambda y: jnp.sum(y[0, 0].astype(jnp.float32)))
    y = fn(a, b); np.asarray(sync(y))
    t0 = time.perf_counter()
    for _ in range(5):
        y = fn(a, b)
    np.asarray(sync(y))
    dt = (time.perf_counter() - t0) / 5
    fl = 2.0 * TILES * M * N * Kd
    print(f"square1k  {dt*1e3:7.2f} ms   {fl/dt/1e12:6.1f} TFLOP/s",
          flush=True)
    # XLA reference for the same workload
    fx = jax.jit(lambda a, b: jnp.einsum("tmk,kn->tmn", a, b,
                                         preferred_element_type=jnp.float32
                                         ).astype(jnp.bfloat16))
    y = fx(a, b); np.asarray(sync(y))
    t0 = time.perf_counter()
    for _ in range(5):
        y = fx(a, b)
    np.asarray(sync(y))
    dt = (time.perf_counter() - t0) / 5
    print(f"xla1k     {dt*1e3:7.2f} ms   {fl/dt/1e12:6.1f} TFLOP/s",
          flush=True)


if __name__ == "__main__":
    main()
    big_square()
