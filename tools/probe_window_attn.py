#!/usr/bin/env python
"""Keep/drop measurement for the fused window-attention Pallas kernel
(ops/pallas/window_attention.py) at the EXACT (windows, heads, N, head_dim)
shapes the zoo's Swin-family models run (VERDICT r3 item 7).

Shapes below are trace-time constants of our model files (verified against
the reference configs):
  - SwinUNETR  (models/swin_unetr.py:28-32): embed 48, heads (3,6,12,24),
    head_dim 16 at every stage, window 7^3 -> N=343; at a 128^3 input the
    per-stage window counts are 10^3/5^3/3^3/2^3 (pad-to-window of 64^3..8^3).
    Ref: /root/reference/model/dim3/swin_unetr.py:384.
  - nnFormer   (models/nnformer.py:228-235): heads (6,12,24,48), head_dim 16,
    windows (4,4,8,4) -> N=64/64/512/64.  Ref: model/dim3/nnformer.py:180.
  - VT-UNet    (models/vtunet.py): embed 96, heads (3,6,12,24), head_dim 32,
    window 7^3 -> N=343.  Ref: model/dim3/vtunet_utils.py:823-860.

For each shape: XLA einsum path vs Pallas kernel, forward and fwd+bwd wall
time (axon sync via readback).  Decision rule per VERDICT r3: Pallas must
beat XLA by >=5% somewhere the zoo actually runs, else the dispatch ambition
is dropped and this measurement recorded in docs/benchmarks.md.

Run:  python tools/probe_window_attn.py
"""

import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


# (label, nW*batch, heads, N, head_dim)
SHAPES = [
    ("swin_unetr s0 (64^3, w7)", 1000, 3, 343, 16),
    ("swin_unetr s1 (32^3, w7)", 125, 6, 343, 16),
    ("swin_unetr s2 (16^3, w7)", 27, 12, 343, 16),
    ("vtunet s0    (48^3, w7)", 343, 3, 343, 32),
    ("vtunet s1    (24^3, w7)", 64, 6, 343, 32),
    ("nnformer s0  (w4: N=64)", 200, 6, 64, 16),
    ("nnformer s2  (w8: N=512)", 16, 24, 512, 16),
]


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from cbim_tpu.ops.pallas.window_attention import (
        fused_window_attention, reference_window_attention)

    interpret = jax.default_backend() != "tpu"
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()}  (interpret={interpret})")
    print(f"{'shape':28s} {'XLA fw':>9s} {'PL fw':>9s} "
          f"{'XLA f+b':>9s} {'PL f+b':>9s}")

    xla_j = jax.jit(reference_window_attention)
    pl_j = jax.jit(lambda q, k, v, b: fused_window_attention(
        q, k, v, b, interpret=interpret))

    def loss_fn(attn):
        return lambda q, k, v, b: jnp.sum(attn(q, k, v, b).astype(jnp.float32) ** 2)

    xla_g = jax.jit(jax.grad(loss_fn(reference_window_attention), argnums=(0, 1, 2)))
    pl_g = jax.jit(jax.grad(
        lambda q, k, v, b: jnp.sum(fused_window_attention(
            q, k, v, b, interpret=interpret).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2)))

    for label, B, H, N, D in SHAPES:
        # crc32, not hash(): PYTHONHASHSEED salts hash() per process, which
        # would make this decision-record tool non-reproducible across runs
        ks = jax.random.split(
            jax.random.fold_in(key, zlib.crc32(label.encode()) % 2**31), 4)
        q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
        kk = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
        bias = jax.random.normal(ks[3], (1, H, N, N), jnp.float32)

        # parity first
        ox = np.asarray(xla_j(q, kk, v, bias), np.float32)
        op = np.asarray(pl_j(q, kk, v, bias), np.float32)
        err = np.abs(ox - op).max()
        tx = timeit(xla_j, q, kk, v, bias)
        tp = timeit(pl_j, q, kk, v, bias)
        try:
            txg = timeit(xla_g, q, kk, v, bias, iters=5)
            tpg = timeit(pl_g, q, kk, v, bias, iters=5)
        except Exception as e:
            txg = tpg = float("nan")
            print(f"  (bwd failed: {str(e).splitlines()[0][:70]})")
        print(f"{label:28s} {tx:8.2f}m {tp:8.2f}m {txg:8.2f}m {tpg:8.2f}m"
              f"   maxdiff {err:.2e}")


if __name__ == "__main__":
    main()
