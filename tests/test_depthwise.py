"""Tap-sum depthwise conv (ops/depthwise.py) vs the XLA grouped-conv lowering.

The fast path must be a drop-in for nn.Conv(features=C, feature_group_count=C)
— same parameter tree, same outputs, same gradients — because checkpoints and
torch transplants address the kernel as Conv_0/kernel with the grouped layout.
Reference semantics being reproduced: torch groups=in_ch convs in
model/dim3/conv_layers.py:126-157 (DepthwiseSeparableConv) and :197-238
(MBConv).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cbim_tpu.models.layers.convs import (ConvNeXtBlock, ConvNormAct,
                                          DepthwiseSeparableConv, MBConv,
                                          torch_conv_init)
from cbim_tpu.ops.depthwise import depthwise_conv, usable


def _xla_depthwise(x, kernel):
    C = x.shape[-1]
    nd = x.ndim - 2
    k = kernel.shape[:nd]
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,) * nd,
        padding=[(ki // 2, ki // 2) for ki in k],
        feature_group_count=C,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC") if nd == 3
        else ("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,k", [
    ((2, 6, 8, 10, 16), (3, 3, 3)),
    ((1, 8, 8, 8, 24), (3, 3, 3)),
    ((2, 12, 10, 8), (7, 7)),        # ConvNeXt 2D 7x7
])
def test_forward_matches_xla(shape, k):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, shape, jnp.float32)
    kernel = jax.random.normal(kw, (*k, 1, shape[-1]), jnp.float32) * 0.2
    got = depthwise_conv(x, kernel)
    want = _xla_depthwise(x, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla():
    kx, kw, kg = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (2, 6, 6, 8, 8), jnp.float32)
    kernel = jax.random.normal(kw, (3, 3, 3, 1, 8), jnp.float32) * 0.2
    ct = jax.random.normal(kg, x.shape, jnp.float32)

    def loss(fn, x, kernel):
        return jnp.sum(fn(x, kernel) * ct)

    gx1, gk1 = jax.grad(lambda a, b: loss(depthwise_conv, a, b),
                        argnums=(0, 1))(x, kernel)
    gx2, gk2 = jax.grad(lambda a, b: loss(_xla_depthwise, a, b),
                        argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("module,kwargs,shape", [
    (DepthwiseSeparableConv, dict(out_ch=12, kernel_size=3), (1, 6, 8, 8, 8)),
    (MBConv, dict(out_ch=8, expansion=2, kernel_size=3, norm="in",
                  act="gelu"), (1, 6, 8, 8, 8)),
    (ConvNeXtBlock, dict(out_ch=8, kernel_size=7), (1, 12, 12, 8)),
    (ConvNormAct, dict(out_ch=8, kernel_size=3, groups=8, norm="in",
                       act="gelu", preact=True), (1, 6, 8, 8, 8)),
])
def test_module_parity_with_grouped_conv(monkeypatch, module, kwargs, shape):
    """Same init params (tree AND values), same outputs, fast path on vs off."""
    x = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32)

    monkeypatch.setenv("CBIM_DW", "1")
    m_fast = module(**kwargs)
    v_fast = m_fast.init(jax.random.PRNGKey(3), x, False)
    y_fast = m_fast.apply(v_fast, x, False)

    monkeypatch.setenv("CBIM_DW", "0")
    m_xla = module(**kwargs)
    v_xla = m_xla.init(jax.random.PRNGKey(3), x, False)
    y_xla = m_xla.apply(v_xla, x, False)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v_fast, v_xla)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_xla),
                               rtol=2e-5, atol=2e-5)


def test_usable_gates(monkeypatch):
    monkeypatch.setenv("CBIM_DW", "1")
    assert usable((3, 3, 3), (1, 1, 1))
    assert usable((7, 7), (1, 1))
    assert not usable((3, 3, 3), (2, 2, 2))      # strided -> XLA path
    assert not usable((4, 4), (1, 1))            # even kernel
    assert not usable((3, 3, 3), (1, 1, 1), (2, 2, 2))  # dilated
    # opt-in: default (unset) is the XLA grouped-conv lowering — the tap-sum
    # backward OOMs HBM at the flagship PatchMerging shape (docstring)
    monkeypatch.delenv("CBIM_DW")
    assert not usable((3, 3, 3), (1, 1, 1))
