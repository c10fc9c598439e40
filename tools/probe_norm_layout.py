#!/usr/bin/env python
"""Probe: where do the backward-pass layout copies in the train step come from?

Compiles a small conv+InstanceNorm+act stack (the repeating unit of every
CNN stage) forward+backward at full resolution on the real TPU, and reports
per-variant step time plus the share of 'copy' ops in the optimized HLO.

Variants:
  none     - convs only (control: copies intrinsic to conv grads)
  norm     - ConvNormAct as shipped (f32 two-pass InstanceNorm)
  normfast - reduce directly on bf16 with f32 accumulation (no x.astype(f32))
  gelu     - conv + gelu, no norm (isolates act cost)

Usage: python tools/probe_norm_layout.py [variants...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _step(loss):
    """grad step, or forward-only when PROBE_FWONLY=1 (isolates bw cost)."""
    import jax
    if os.environ.get("PROBE_FWONLY"):
        return jax.jit(loss)
    return jax.jit(jax.grad(loss))


def build_fn(variant: str):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from cbim_tpu.models.layers.convs import Norm, torch_conv_init

    # packed: the space-to-depth equivalent of the 'none' control — the same
    # 128^3x32ch workload expressed as 64^3x256ch with a 2^3 kernel (what a
    # s2d-packed 3^3 conv lowers to).  ~2.37x the FLOPs (structural zeros in
    # the rearranged kernel) but full 128-lane MXU occupancy.
    # wide: the half-res regime (64ch @ 64^3) for util-vs-channel-count data.
    if variant == "packed":
        import jax, jax.numpy as jnp
        from flax import linen as nn
        from cbim_tpu.models.layers.convs import torch_conv_init

        class P(nn.Module):
            @nn.compact
            def __call__(self, x):
                for _ in range(3):
                    x = nn.Conv(256, (2, 2, 2), padding="SAME",
                                use_bias=False, dtype=jnp.bfloat16,
                                kernel_init=torch_conv_init)(x)
                return x

        model = P()
        x = jnp.zeros((2, 64, 64, 64, 256), jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        def loss(params, x):
            return jnp.sum(model.apply(params, x).astype(jnp.float32))

        return _step(loss), params, x

    # outpack: output-tiled conv — the SAME 3^3 32->32 conv expressed with
    # 2x2 output pixels (h,w) packed into channels: kernel (3,4,4), stride
    # (1,2,2), C_out=4*32=128 (weights zero-scattered: 48/27 = 1.78x FLOPs),
    # then depth-to-space back.  Fills all 128 MXU lanes.
    if variant.startswith("outpack"):
        import jax, jax.numpy as jnp
        from flax import linen as nn

        co = 32
        pack = (2, 2, 2) if variant == "outpack3" else (1, 2, 2)

        class OP(nn.Module):
            @nn.compact
            def __call__(self, x):
                pd, ph, pw = pack
                for i in range(3):
                    w = self.param(f"w{i}", nn.initializers.normal(0.02),
                                   (3, 3, 3, x.shape[-1], co), jnp.float32)
                    # scatter the 3^3 taps into a (2+pd, 2+ph, 2+pw) grid per
                    # output-pixel offset (qd, qh, qw)
                    wp = jnp.zeros((2 + pd, 2 + ph, 2 + pw, x.shape[-1],
                                    pd, ph, pw, co), jnp.float32)
                    for qd in range(pd):
                        for qh in range(ph):
                            for qw in range(pw):
                                wp = wp.at[qd:qd + 3, qh:qh + 3, qw:qw + 3,
                                           :, qd, qh, qw, :].add(w)
                    wp = wp.reshape(2 + pd, 2 + ph, 2 + pw, x.shape[-1],
                                    pd * ph * pw * co)
                    B, D, H, W, _ = x.shape
                    y = jax.lax.conv_general_dilated(
                        x.astype(jnp.bfloat16), wp.astype(jnp.bfloat16),
                        window_strides=pack,
                        padding=tuple((1, p) for p in pack),
                        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                    y = y.reshape(B, D // pd, H // ph, W // pw, pd, ph, pw, co)
                    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, D, H, W, co)
                    x = y
                return x

        model = OP()
        x = jnp.zeros((2, 128, 128, 128, 32), jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        def loss(params, x):
            return jnp.sum(model.apply(params, x).astype(jnp.float32))

        return _step(loss), params, x

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            ch, ks = (64, (3, 3, 3)) if variant == "wide" else (32, (3, 3, 3))
            for _ in range(3):
                x = nn.Conv(ch, ks, use_bias=False, dtype=jnp.bfloat16,
                            kernel_init=torch_conv_init)(x)
                if variant == "pallasnorm":
                    from cbim_tpu.ops.pallas.fused_norm import instance_norm_act
                    x = instance_norm_act(x, act="gelu")
                    continue
                if variant == "norm":
                    x = Norm("in", dtype=jnp.bfloat16)(x)
                elif variant == "normfast":
                    axes = tuple(range(1, x.ndim - 1))
                    mean = jnp.mean(x, axis=axes, keepdims=True,
                                    dtype=jnp.float32)
                    var = jnp.mean(
                        jnp.square((x - mean.astype(x.dtype)).astype(jnp.float32)),
                        axis=axes, keepdims=True)
                    scale = jax.lax.rsqrt(var + 1e-4)
                    x = ((x.astype(jnp.float32) - mean) * scale).astype(x.dtype)
                if variant in ("norm", "normfast", "gelu"):
                    x = jax.nn.gelu(x, approximate=False)
            return x

    model = Stack()
    shape = (2, 64, 64, 64, 64) if variant == "wide" else (2, 128, 128, 128, 32)
    x = jnp.zeros(shape, jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def loss(params, x):
        return jnp.sum(model.apply(params, x).astype(jnp.float32))

    return _step(loss), params, x


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    variants = sys.argv[1:] or ["none", "gelu", "norm", "normfast"]
    for v in variants:
        step, params, x = build_fn(v)
        lowered = step.lower(params, x)
        compiled = lowered.compile()
        # copy share from optimized HLO text
        try:
            hlo = compiled.as_text()
            n_copy = sum(1 for line in hlo.splitlines()
                         if " copy(" in line and "128,128" in line)
        except Exception:
            n_copy = -1
        g = compiled(params, x)
        np.asarray(jax.tree.leaves(g)[0]).ravel()[0]  # sync (axon needs readback)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            g = compiled(params, x)
        np.asarray(jax.tree.leaves(g)[0]).ravel()[0]
        dt = (time.perf_counter() - t0) / iters
        print(f"{v:10s}  {dt*1e3:8.1f} ms/step   big-copy-ops={n_copy}",
              flush=True)


if __name__ == "__main__":
    main()
