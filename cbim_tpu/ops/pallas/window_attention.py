"""Fused shifted-window attention kernel (Pallas/TPU).

The windowed-attention inner loop is the Swin family's hot op (SURVEY §2.5,
build plan §9).  The XLA path materialises the (nW·B, heads, N, N) attention
tensor in HBM twice (scores, probabilities); this kernel keeps the whole
(N, N) tile — N = prod(window) ≤ ~512 — in VMEM per (window, head) grid cell
and fuses QKᵀ · scale + bias/mask + softmax + PV into one pass:

    HBM traffic:   q, k, v in; o out.   (vs. + 2·N² per window·head for XLA)

Layout: q, k, v are (B, H, N, D) with B = num_windows·batch; the additive
`bias` (relative-position bias + shift mask, pre-broadcast) is (B, H, N, N)
or (1, H, N, N).  Softmax runs in fp32 regardless of input dtype.

Falls back to the jnp einsum path when Pallas is unavailable (non-TPU
backends run the kernel in interpreter mode inside tests).

Measured on TPU v5e (window 7^3, N=343): XLA's own fusion of the einsum path
is already within ~10-20% of this kernel (686x3 windows: 6.35 ms XLA vs
6.91 ms Pallas; 128x6: 3.38 vs 4.18) — the small head dims (16-32) leave the
MXU underutilised either way and XLA batches the tiny matmuls well.  The
kernel therefore stays OPT-IN (models default to the XLA path); it is the
scaffold for a future blocked multi-window variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas import is safe everywhere; compilation only happens on use
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False


def pallas_available() -> bool:
    if not _PALLAS:
        return False
    try:
        from .._backend import pallas_gates_on
        return pallas_gates_on()
    except Exception:
        return False


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32) * scale          # (N, D)
    k = k_ref[0, 0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0].astype(jnp.float32)           # (N, N)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = jnp.dot(p, v,
                          preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_window_attention(q, k, v, bias, interpret: bool = False):
    """o = softmax(q·kᵀ·scale + bias) · v, fused per (window, head).

    q, k, v: (B, H, N, D); bias: (B or 1, H, N, N).  Returns (B, H, N, D).
    """
    B, H, N, D = q.shape
    scale = D ** -0.5
    bias_b = bias.shape[0]

    grid = (B, H)
    qkv_spec = pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0))
    bias_spec = pl.BlockSpec((1, 1, N, N),
                             (lambda b, h: (0, h, 0, 0)) if bias_b == 1
                             else (lambda b, h: (b, h, 0, 0)))

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def reference_window_attention(q, k, v, bias):
    """jnp fallback with identical semantics (used off-TPU)."""
    D = q.shape[-1]
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (D ** -0.5)
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
