"""Fused InstanceNorm(+act) Pallas kernel vs the unfused reference lowering.

Runs in interpret mode on the CPU test mesh; compares forward and gradients
against the exact jnp math of cbim_tpu/models/layers/convs.py Norm('in')
followed by the activation (reference conv_layers.py ConvNormAct semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbim_tpu.ops.pallas.fused_norm import instance_norm_act, usable


def _ref(x, eps=1e-4, act=None):
    ax = tuple(range(1, x.ndim - 1))
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=ax, keepdims=True)
    v = jnp.mean(jnp.square(x32 - m), axis=ax, keepdims=True)
    n = (x32 - m) * jax.lax.rsqrt(v + eps)
    if act == "gelu":
        n = jax.nn.gelu(n, approximate=False)
    elif act == "relu":
        n = jax.nn.relu(n)
    return n.astype(x.dtype)


CASES = [
    ((2, 5, 6, 7, 32), "gelu"),     # 3D, C=32 (full-res model regime)
    ((2, 9, 11, 16), "relu"),       # 2D
    ((1, 8, 8, 8, 48), None),       # norm only
    ((2, 2049, 24), "gelu"),        # ragged: S not a multiple of the block
]


@pytest.mark.parametrize("shape,act", CASES)
def test_forward_matches_unfused(shape, act):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 2 + 0.3)
    y = instance_norm_act(x, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(x, act=act)),
                               atol=5e-6, rtol=1e-5)


@pytest.mark.parametrize("shape,act", CASES)
def test_grad_matches_unfused(shape, act):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    g = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def f_fused(x):
        return jnp.sum(instance_norm_act(x, act=act, interpret=True)
                       .astype(jnp.float32) * g)

    def f_ref(x):
        return jnp.sum(_ref(x, act=act).astype(jnp.float32) * g)

    g1 = jax.grad(f_fused)(x)
    g2 = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=5e-6, rtol=1e-5)


def test_bf16_io_dtype_preserved():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 16)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y = instance_norm_act(x, act="gelu", interpret=True)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y.astype(jnp.float32)),
        np.asarray(_ref(x, act="gelu").astype(jnp.float32)),
        atol=0.02, rtol=0.02)   # bf16 rounding


def test_not_usable_on_cpu():
    # tests run on the CPU backend — the trainer must keep the unfused path
    assert not usable("in", "gelu")
    assert not usable("bn", None)


# ------------------------------------------------------------ NDHCW variant

def _ref_cw(x_cw, eps=1e-4, act=None):
    """Reference: transpose to NDHWC, unfused math, transpose back."""
    x = jnp.transpose(x_cw, (0, 1, 2, 4, 3))
    y = _ref(x, eps=eps, act=act)
    return jnp.transpose(y, (0, 1, 2, 4, 3))


CW_CASES = [
    ((2, 4, 6, 32, 16), "gelu"),    # full-res regime (C=32)
    ((1, 2, 3, 8, 24), "relu"),
    ((1, 5, 7, 16, 8), None),       # ragged: S=35 not a block multiple
]


@pytest.mark.parametrize("shape,act", CW_CASES)
def test_cw_forward_matches_unfused(shape, act):
    from cbim_tpu.ops.pallas.fused_norm import instance_norm_act_cw
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 2 + 0.3)
    y = instance_norm_act_cw(x, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref_cw(x, act=act)),
                               atol=5e-6, rtol=1e-5)


@pytest.mark.parametrize("shape,act", CW_CASES)
def test_cw_grad_matches_unfused(shape, act):
    from cbim_tpu.ops.pallas.fused_norm import instance_norm_act_cw
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    g = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def f_fused(x):
        return jnp.sum(instance_norm_act_cw(x, act=act, interpret=True)
                       .astype(jnp.float32) * g)

    def f_ref(x):
        return jnp.sum(_ref_cw(x, act=act).astype(jnp.float32) * g)

    g1 = jax.grad(f_fused)(x)
    g2 = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-5, rtol=2e-5)


def test_cw_bf16_io_dtype_preserved():
    from cbim_tpu.ops.pallas.fused_norm import instance_norm_act_cw
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 8, 16)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y = instance_norm_act_cw(x, act="relu", interpret=True)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y.astype(jnp.float32)),
        np.asarray(_ref_cw(x.astype(jnp.float32), act="relu")),
        atol=0.05, rtol=0.05)
