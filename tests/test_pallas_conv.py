"""Tap-packed Pallas conv3d vs lax.conv_general_dilated (interpret mode).

The kernel (cbim_tpu/ops/pallas/conv3d.py) reorganizes a stride-1 SAME 3^3
NDHWC conv into one [M, 3C] @ [3C, 9F] matmul per tile plus a 9-term shifted
reduce; these tests pin exact-math parity against XLA's conv on shapes that
exercise tile boundaries, C != F, and batch > 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbim_tpu.ops.pallas.conv3d import conv3d_same


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


CASES = [
    ((1, 4, 8, 16, 8), 8),      # minimal tile multiple
    ((2, 4, 8, 16, 8), 8),      # batch > 1 (exercises grid linearization)
    ((1, 6, 16, 24, 4), 12),    # C != F, non-square spatial
    ((1, 2, 8, 8, 16), 16),     # single-depth-tile volume
]


@pytest.mark.parametrize("shape,F", CASES)
def test_matches_lax_conv(shape, F):
    rng = np.random.default_rng(0)
    C = shape[-1]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32)) * 0.2
    y = conv3d_same(x, w, interpret=True)
    y_ref = _xla_conv(x, w)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)


def test_zero_padding_semantics():
    # SAME zero padding: a delta at the corner must convolve with the
    # corner-clipped kernel only
    C = 8
    x = jnp.zeros((1, 4, 8, 16, C), jnp.float32).at[0, 0, 0, 0, 0].set(1.0)
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=(3, 3, 3, C, C)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(conv3d_same(x, w, interpret=True)),
                               np.asarray(_xla_conv(x, w)),
                               atol=1e-6, rtol=1e-6)


def test_bf16_io():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 16, 8)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 8)).astype(np.float32) * 0.2
                    ).astype(jnp.bfloat16)
    y = conv3d_same(x, w, interpret=True)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y.astype(jnp.float32)),
        np.asarray(_xla_conv(x, w).astype(jnp.float32)),
        atol=0.05, rtol=0.05)


@pytest.mark.parametrize("slice_k", [True, False])
def test_padded_lane_arithmetic_in_interpret(slice_k):
    """Force Cp=round_up(C,128) in interpret mode: covers the real-TPU-only
    padded-lane paths (slice_k lane slicing of padded views, zero-row weight
    padding) that default interpret runs skip (ADVICE r1)."""
    from cbim_tpu.ops.pallas.conv3d import _conv3d_same_pallas

    rng = np.random.default_rng(5)
    C, F = 8, 8
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 10, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32) * 0.2)
    y = _conv3d_same_pallas(x, w, interpret=True, slice_k=slice_k, pad_c=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_xla_conv(x, w)),
                               atol=2e-5, rtol=2e-5)


def test_custom_vjp_grads_match_xla():
    """conv3d_same_t gradients (Pallas dgrad via flip-swap, XLA wgrad) must
    match jax.grad of the plain XLA conv."""
    from cbim_tpu.ops.pallas.conv3d import conv3d_same_t

    rng = np.random.default_rng(9)
    C, F = 8, 8
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 10, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32) * 0.2)
    t = jnp.asarray(rng.normal(size=(2, 4, 8, 10, F)).astype(np.float32))

    def loss_pl(x, w):
        return jnp.sum((conv3d_same_t(x, w) - t) ** 2)

    def loss_xla(x, w):
        return jnp.sum((_xla_conv(x, w) - t) ** 2)

    gx_pl, gw_pl = jax.grad(loss_pl, argnums=(0, 1))(x, w)
    gx_xla, gw_xla = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_pl), np.asarray(gx_xla),
                               atol=2e-3, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_pl), np.asarray(gw_xla),
                               atol=2e-3, rtol=2e-4)


def test_train_path_flag_enables_pallas_conv(monkeypatch):
    """CBIM_PLCONV=1 + CBIM_PLCONV_TRAIN=1: ConvNormAct trains through the
    custom-VJP conv; params update and loss is finite."""
    # force the dispatch (its backend gate would reject CPU) so the Pallas
    # train path — conv3d_same_t in interpret mode — is genuinely taken
    from cbim_tpu.models.layers import convs
    monkeypatch.setattr(convs, "_pallas_conv_usable",
                        lambda *a, **k: True)
    from cbim_tpu.models.layers.convs import ConvNormAct

    m = ConvNormAct(8, kernel_size=3, stride=1, norm="in", act="relu")
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 4, 8, 16, 8)).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=True)

    def loss(params):
        return jnp.sum(m.apply({"params": params}, x, train=True) ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree.leaves(g)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


@pytest.mark.parametrize("shape,F", CASES)
def test_cw_matches_lax_conv(shape, F):
    """NDHCW kernel: same math as the NDHWC kernel on transposed data."""
    from cbim_tpu.ops.pallas.conv3d import conv3d_same_cw

    rng = np.random.default_rng(21)
    C = shape[-1]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32)) * 0.2
    x_cw = jnp.transpose(x, (0, 1, 2, 4, 3))
    y_cw = conv3d_same_cw(x_cw, w, interpret=True)
    y = jnp.transpose(y_cw, (0, 1, 2, 4, 3))
    np.testing.assert_allclose(np.asarray(y), np.asarray(_xla_conv(x, w)),
                               atol=2e-5, rtol=2e-5)


def test_cw_custom_vjp_grads_match_xla():
    from cbim_tpu.ops.pallas.conv3d import conv3d_same_cw_t

    rng = np.random.default_rng(23)
    C, F = 8, 12
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 10, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32) * 0.2)
    t = jnp.asarray(rng.normal(size=(2, 4, 8, 10, F)).astype(np.float32))
    x_cw = jnp.transpose(x, (0, 1, 2, 4, 3))
    t_cw = jnp.transpose(t, (0, 1, 2, 4, 3))

    def loss_pl(x_cw, w):
        return jnp.sum((conv3d_same_cw_t(x_cw, w) - t_cw) ** 2)

    def loss_xla(x, w):
        return jnp.sum((_xla_conv(x, w) - t) ** 2)

    gx_pl, gw_pl = jax.grad(loss_pl, argnums=(0, 1))(x_cw, w)
    gx_xla, gw_xla = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(gx_pl, (0, 1, 2, 4, 3))),
        np.asarray(gx_xla), atol=2e-3, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_pl), np.asarray(gw_xla),
                               atol=2e-3, rtol=2e-4)


@pytest.mark.parametrize("pad_c", [False, True])
def test_wgrad_kernel_matches_xla(pad_c):
    from cbim_tpu.ops.pallas.conv3d import conv3d_wgrad

    rng = np.random.default_rng(13)
    C, F = 8, 8
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 10, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.normal(size=(2, 4, 8, 10, F)).astype(np.float32))

    _, w_vjp = jax.vjp(lambda wt: _xla_conv(x, wt), w)
    want, = w_vjp(g)
    got = conv3d_wgrad(x, g, interpret=True, pad_c=pad_c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("shape,F", CASES)
def test_cw2_matches_lax_conv(shape, F):
    """Transpose-free NDHCW kernel: parity with the XLA conv."""
    from cbim_tpu.ops.pallas.conv3d import conv3d_same_cw2

    rng = np.random.default_rng(29)
    C = shape[-1]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32)) * 0.2
    x_cw = jnp.transpose(x, (0, 1, 2, 4, 3))
    y_cw = conv3d_same_cw2(x_cw, w, interpret=True)
    y = jnp.transpose(y_cw, (0, 1, 2, 4, 3))
    np.testing.assert_allclose(np.asarray(y), np.asarray(_xla_conv(x, w)),
                               atol=2e-5, rtol=2e-5)


def test_cw2_custom_vjp_grads_match_xla():
    from cbim_tpu.ops.pallas.conv3d import conv3d_same_cw2_t

    rng = np.random.default_rng(31)
    C, F = 8, 12
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 10, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32) * 0.2)
    t = jnp.asarray(rng.normal(size=(2, 4, 8, 10, F)).astype(np.float32))
    x_cw = jnp.transpose(x, (0, 1, 2, 4, 3))
    t_cw = jnp.transpose(t, (0, 1, 2, 4, 3))

    def loss_pl(x_cw, w):
        return jnp.sum((conv3d_same_cw2_t(x_cw, w) - t_cw) ** 2)

    def loss_xla(x, w):
        return jnp.sum((_xla_conv(x, w) - t) ** 2)

    gx_pl, gw_pl = jax.grad(loss_pl, argnums=(0, 1))(x_cw, w)
    gx_xla, gw_xla = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(gx_pl, (0, 1, 2, 4, 3))),
        np.asarray(gx_xla), atol=2e-3, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_pl), np.asarray(gw_xla),
                               atol=2e-3, rtol=2e-4)


@pytest.mark.parametrize("shape,F", CASES)
def test_halo_ndhwc_matches_lax_conv(shape, F):
    """NDHWC halo mode (no caller pre-pad; used when C % 128 == 0)."""
    from cbim_tpu.ops.pallas.conv3d import _conv3d_same_pallas

    rng = np.random.default_rng(37)
    C = shape[-1]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32)) * 0.2
    y = _conv3d_same_pallas(x, w, interpret=True, halo=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_xla_conv(x, w)),
                               atol=2e-5, rtol=2e-5)


def test_halo_ndhwc_wgrad_matches_xla():
    from cbim_tpu.ops.pallas.conv3d import conv3d_wgrad

    rng = np.random.default_rng(41)
    C, F = 8, 12
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 10, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.normal(size=(2, 4, 8, 10, F)).astype(np.float32))
    dw = conv3d_wgrad(x, g, interpret=True, halo=True)
    _, vjp = jax.vjp(lambda wt: _xla_conv(x, wt), w)
    dw_ref, = vjp(g)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               atol=2e-4, rtol=2e-4)


def test_cw2_wgrad_matches_xla():
    from cbim_tpu.ops.pallas.conv3d import conv3d_wgrad_cw2

    rng = np.random.default_rng(43)
    for (B, D, H, W, C, F) in [(2, 4, 8, 10, 8, 12), (1, 2, 8, 16, 16, 8)]:
        x = jnp.asarray(rng.normal(size=(B, D, H, W, C)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32)
                        * 0.2)
        g = jnp.asarray(rng.normal(size=(B, D, H, W, F)).astype(np.float32))
        dw = conv3d_wgrad_cw2(jnp.transpose(x, (0, 1, 2, 4, 3)),
                              jnp.transpose(g, (0, 1, 2, 4, 3)),
                              interpret=True)
        _, vjp = jax.vjp(lambda wt: _xla_conv(x, wt), w)
        dw_ref, = vjp(g)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                                   atol=2e-4, rtol=2e-4)


def _inorm_act_ref(x_cw, eps, act):
    """Unfused reference of the fused preact chain in NDHCW layout:
    f32 InstanceNorm over (D, H, W) + exact-erf act, on [B, D, H, C, W]."""
    import jax
    x32 = x_cw.astype(jnp.float32)
    axes = (1, 2, 4)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    n = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if act == "gelu":
        n = jax.nn.gelu(n, approximate=False)
    elif act == "relu":
        n = jax.nn.relu(n)
    return n


@pytest.mark.parametrize("act", [None, "relu", "gelu"])
def test_conv_inorm_act_cw_forward(act):
    """Fused preact ConvNormAct == act(InstanceNorm(x)) -> conv, incl. the
    SAME zero padding applying to the NORMED input (the halo re-zeroing)."""
    from cbim_tpu.ops.pallas.conv3d import (_cw_stats, conv3d_same_cw_na,
                                            to_cw, from_cw)
    rng = np.random.default_rng(3)
    B, D, H, W, C, F = 2, 4, 8, 16, 8, 8
    x = jnp.asarray(rng.normal(size=(B, D, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32)) * 0.2
    x_cw = to_cw(x)
    eps = 1e-4
    stat = _cw_stats(x_cw, eps, interpret=True)
    y = from_cw(conv3d_same_cw_na(x_cw, stat, w, act, interpret=True))
    xn = from_cw(_inorm_act_ref(x_cw, eps, act))
    y_ref = _xla_conv(xn.astype(jnp.float32), w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_conv_inorm_act_cw_grads_match_unfused():
    """custom VJP of the fused op == autodiff through the unfused chain
    (norm stats' dependence on x included)."""
    from cbim_tpu.ops.pallas.conv3d import conv_inorm_act_cw_t, to_cw

    rng = np.random.default_rng(4)
    B, D, H, W, C, F = 1, 4, 8, 16, 8, 8
    x = jnp.asarray(rng.normal(size=(B, D, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, F)).astype(np.float32)) * 0.2
    eps, act = 1e-4, "gelu"
    x_cw = to_cw(x)

    def loss_fused(xc, wt):
        return jnp.sum(conv_inorm_act_cw_t(xc, wt, eps, act) ** 2)

    def loss_ref(xc, wt):
        xn = _inorm_act_ref(xc, eps, act)
        y = _xla_conv(jnp.transpose(xn, (0, 1, 2, 4, 3)), wt)
        return jnp.sum(y ** 2)

    lf, (dxf, dwf) = jax.value_and_grad(loss_fused, argnums=(0, 1))(x_cw, w)
    lr, (dxr, dwr) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x_cw, w)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dwf), np.asarray(dwr),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dxf), np.asarray(dxr),
                               rtol=2e-4, atol=2e-4)


def test_conv_na_dispatch_in_convnormact(monkeypatch):
    """CBIM_CONV_NA=1 routes the preact cw ConvNormAct through the fused
    module with an UNCHANGED parameter tree, and matches the unfused path."""
    from flax import linen as nn

    from cbim_tpu.models.layers.convs import ConvNormAct

    monkeypatch.setenv("CBIM_CONV_NA", "1")
    monkeypatch.setenv("CBIM_CW_FORCE", "1")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 128)).astype(np.float32))
    m = ConvNormAct(8, 3, 1, norm="in", act="gelu", preact=True, cw=True,
                    dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    monkeypatch.setenv("CBIM_CONV_NA", "0")
    m2 = ConvNormAct(8, 3, 1, norm="in", act="gelu", preact=True, cw=True,
                     dtype=jnp.float32)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    y2 = m2.apply(v2, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                               rtol=2e-4, atol=2e-4)
