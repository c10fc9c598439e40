"""Pallas fused window-attention kernel vs the jnp reference (interpret mode
on CPU; compiled on TPU)."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from cbim_tpu.ops.pallas.window_attention import (fused_window_attention,
                                                  reference_window_attention)


@pytest.mark.parametrize("B,H,N,D", [(4, 3, 64, 32), (2, 6, 343, 32)])
def test_fused_window_attention_matches_reference(B, H, N, D):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    bias = jnp.asarray(rng.randn(1, H, N, N).astype(np.float32))

    ref = reference_window_attention(q, k, v, bias)
    out = fused_window_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_window_attention_with_mask_rows():
    """-100 shift masks zero out cross-region attention exactly like jnp."""
    rng = np.random.RandomState(1)
    B, H, N, D = 3, 2, 49, 16
    q = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32))
    mask = np.zeros((B, H, N, N), np.float32)
    mask[:, :, :, N // 2:] = -100.0
    bias = jnp.asarray(mask)

    ref = reference_window_attention(q, k, v, bias)
    out = fused_window_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bf16_inputs():
    rng = np.random.RandomState(2)
    B, H, N, D = 2, 4, 64, 32
    q = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
    bias = jnp.zeros((1, H, N, N), jnp.float32)
    ref = reference_window_attention(q, k, v, bias)
    out = fused_window_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
