"""Depthwise conv as an explicit tap-sum (TPU fast path).

Why: XLA lowers ``conv_general_dilated(feature_group_count=C)`` on TPU
through the grouped-convolution path, whose backward (wgrad with
batch_group_count) emits per-group custom calls measured at ~13 ms each at
the flagship's 32^3 C=512 MBConv shapes (tools/profile_step.py, round 4) —
three orders of magnitude off the arithmetic cost (the depthwise 3^3 conv is
~2 GFLOP there).  The same math written as a shift-multiply-accumulate

    y[..., c] = sum_{taps t} x_pad[shifted by t][..., c] * w[t, c]

is a pure elementwise/VPU job in the native channels-last layout: C rides
the lanes untouched, every tap is a static slice XLA folds into one fused
stencil loop, and the automatic VJP gives dgrad (tap-sum with flipped taps)
and wgrad (per-tap reduction) in the same fused form — no grouped-conv
custom calls anywhere.

Semantics match ``nn.Conv(features=C, feature_group_count=C)`` with SAME
k//2 padding and stride 1 exactly (kernel layout (*k, 1, C), f32
accumulation); parity-tested in tests/test_depthwise.py.

Reference counterpart being replaced: the torch ``groups=in_ch`` convs in
model/dim3/conv_layers.py:126-157 (DepthwiseSeparableConv) and :197-238
(MBConv) — cuDNN handles those natively on GPU; this module is the
TPU-native equivalent.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def usable(k: tuple, stride: tuple, dilation: tuple = None) -> bool:
    """Fast path covers stride-1, dilation-1, odd-kernel depthwise convs
    (every depthwise site in the model zoo: 3^d MBConv/DWSep, 7^d ConvNeXt).

    OPT-IN (CBIM_DW=1): on device the backward of the tap-sum at the
    flagship's largest depthwise site (PatchMerging projection,
    bf16[4,64,64,64,256]) fails to fuse — XLA materializes several shifted
    512 MB bf16 temps plus the f32 accumulator and the batch-4 train step
    exceeds HBM by 1.4 GB (v5e 16 GB, 2026-08-20).  The XLA grouped-conv
    lowering stays the default until the stencil is reformulated to fuse
    (or tiled via Pallas)."""
    if os.environ.get("CBIM_DW", "0") != "1":
        return False
    if any(s != 1 for s in stride):
        return False
    if dilation is not None and any(d != 1 for d in dilation):
        return False
    return all(ki % 2 == 1 for ki in k)


def depthwise_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """SAME stride-1 depthwise conv, channels-last.

    x: [B, *spatial, C]; kernel: [*k, 1, C] (the nn.Conv grouped layout, so
    parameter trees and checkpoints are interchangeable with the XLA path).
    Returns [B, *spatial, C] in x.dtype; products accumulate in f32 like the
    XLA TPU conv lowering.
    """
    nd = x.ndim - 2
    k = kernel.shape[:nd]
    assert kernel.shape[nd] == 1 and kernel.shape[nd + 1] == x.shape[-1], (
        kernel.shape, x.shape)
    pads = [(0, 0)] + [(ki // 2, ki // 2) for ki in k] + [(0, 0)]
    xp = jnp.pad(x, pads)
    spatial = x.shape[1:-1]
    w = kernel.reshape(*k, x.shape[-1]).astype(jnp.float32)
    acc = None
    # static tap loop: XLA fuses the shifted reads into one stencil kernel
    for tap in np.ndindex(*k):
        sl = (slice(None),) + tuple(
            slice(t, t + s) for t, s in zip(tap, spatial)) + (slice(None),)
        term = xp[sl].astype(jnp.float32) * w[tap]
        acc = term if acc is None else acc + term
    return acc.astype(x.dtype)
