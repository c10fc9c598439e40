#!/usr/bin/env python
"""Micro-probe: achievable HBM bandwidth for elementwise work, by layout.

Cases (all on the same 256 MiB logical bf16 buffer):
  xla128   y = 2x via XLA, shape (B, S/4, 128)  — lane-dense
  xla32    y = 2x via XLA, shape (B, S, 32)     — lane-sparse (C=32 minor)
  pl128    same via a Pallas copy-scale kernel, lane-dense blocks
  pl32     same via Pallas, (block, 32) blocks  — fused_norm's layout
  plbig    pl128 with 4x bigger blocks

Prints ms/pass and effective GB/s (logical bytes: read + write).
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, S, C = 2, 128 * 128 * 128, 32
    nbytes = B * S * C * 2 * 2          # read + write, logical

    def scale_kernel(x_ref, y_ref):
        y_ref[:] = x_ref[:] * jnp.bfloat16(2.0)

    def make_pallas(shape, block_rows):
        bs = (1, block_rows, shape[-1])
        spec = pl.BlockSpec(bs, lambda b, s: (b, s, 0),
                            memory_space=pltpu.VMEM)
        return jax.jit(lambda x: pl.pallas_call(
            scale_kernel,
            grid=(shape[0], pl.cdiv(shape[1], block_rows)),
            in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.bfloat16))(x))

    cases = {}
    x32 = jnp.zeros((B, S, C), jnp.bfloat16)
    x128 = jnp.zeros((B, S // 4, 128), jnp.bfloat16)
    cases["xla32"] = (jax.jit(lambda x: x * jnp.bfloat16(2.0)), x32)
    cases["xla128"] = (jax.jit(lambda x: x * jnp.bfloat16(2.0)), x128)
    cases["pl32"] = (make_pallas((B, S, C), 2048), x32)
    cases["pl128"] = (make_pallas((B, S // 4, 128), 2048), x128)
    cases["plbig"] = (make_pallas((B, S // 4, 128), 8192), x128)

    # does a conv-produced NDHWC C=32 tensor reach a lane-dense pallas view
    # without a relayout copy?  compare pallas-on-[S,32] vs
    # reshape -> pallas-on-[T,128] -> reshape, both sandwiched between convs.
    from flax import linen as nn
    D = Hh = Ww = 128
    xin = jnp.zeros((B, D, Hh, Ww, C), jnp.bfloat16)
    conv = nn.Conv(C, (3, 3, 3), use_bias=False, dtype=jnp.bfloat16)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0), xin)
    pal32 = make_pallas((B, D * Hh * Ww, C), 2048)
    pal128 = make_pallas((B, D * Hh * Ww * C // 128, 128), 2048)

    def via32(p, x):
        h = conv.apply(p, x)
        h = pal32(h.reshape(B, -1, C)).reshape(x.shape)
        return conv.apply(p, h)

    def via128(p, x):
        h = conv.apply(p, x)
        h = pal128(h.reshape(B, -1, 128)).reshape(x.shape)
        return conv.apply(p, h)

    cases["conv32"] = (functools.partial(jax.jit(via32), params), xin)
    cases["conv128"] = (functools.partial(jax.jit(via128), params), xin)

    # sync via an on-device scalar reduce — np.asarray of the full result
    # would drag 256 MB through the axon tunnel and dominate the timing
    sync = jax.jit(lambda y: jnp.sum(y[0, 0].astype(jnp.float32)))

    sel = sys.argv[1:] or list(cases)
    for name in sel:
        fn, x = cases[name]
        y = fn(x)
        np.asarray(sync(y))
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            y = fn(x)
        np.asarray(sync(y))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:8s} {dt*1e3:7.2f} ms   {nbytes/dt/1e9:7.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
