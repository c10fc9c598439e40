"""Tap-packed 2D Pallas conv: parity vs lax.conv (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _xla_conv2d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


CASES = [
    ((1, 8, 16, 8), 8),
    ((2, 8, 16, 8), 8),        # batch > 1
    ((1, 16, 24, 4), 12),      # C != F, non-multiple-of-8 W handled by Wp
    ((1, 8, 8, 16), 16),       # single-h-tile
    ((1, 32, 20, 8), 130),     # F > 128: flat packing path
]


@pytest.mark.parametrize("shape,F", CASES)
def test_conv2d_matches_lax(shape, F):
    from cbim_tpu.ops.pallas.conv2d import conv2d_same

    rng = np.random.default_rng(2)
    C = shape[-1]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, C, F)).astype(np.float32)) * 0.2
    y = conv2d_same(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_xla_conv2d(x, w)),
                               atol=2e-5, rtol=2e-5)


def test_conv2d_padded_lanes_matches_lax():
    """pad_c=True covers the real-TPU 128-lane padding arithmetic."""
    from cbim_tpu.ops.pallas.conv2d import conv2d_same

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32)) * 0.2
    y = conv2d_same(x, w, interpret=True, pad_c=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_xla_conv2d(x, w)),
                               atol=2e-5, rtol=2e-5)


def test_conv2d_custom_vjp_grads_match_xla():
    from cbim_tpu.ops.pallas.conv2d import conv2d_same_t

    rng = np.random.default_rng(5)
    C, F = 8, 12
    x = jnp.asarray(rng.normal(size=(2, 8, 10, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, C, F)).astype(np.float32) * 0.2)
    t = jnp.asarray(rng.normal(size=(2, 8, 10, F)).astype(np.float32))

    def loss_pl(x, w):
        return jnp.sum((conv2d_same_t(x, w) - t) ** 2)

    def loss_xla(x, w):
        return jnp.sum((_xla_conv2d(x, w) - t) ** 2)

    gx_pl, gw_pl = jax.grad(loss_pl, argnums=(0, 1))(x, w)
    gx_xla, gw_xla = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_pl), np.asarray(gx_xla),
                               atol=2e-3, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_pl), np.asarray(gw_xla),
                               atol=2e-3, rtol=2e-4)
