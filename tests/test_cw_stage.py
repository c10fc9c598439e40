"""NDHCW ("cw") stage layout: numerical parity with the channels-last path.

The cw layout (cbim_tpu/models/layers/convs.py _stage_cw_ok) stores full-res
stage tensors as [B, D, H, C, W] so W rides the 128 lanes densely; the conv
blocks run through the Pallas cw kernels (interpret mode here) or transpose
islands.  Parameter trees are identical to the channels-last path, so the
same params must produce the same outputs (up to f32 accumulation order).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from cbim_tpu.models.layers.convs import BasicBlock, ConvNormAct, SingleConv


def _pair(module_kwargs, shape, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    cls = module_kwargs.pop("cls")
    m_plain = cls(**module_kwargs, cw=False)
    m_cw = cls(**module_kwargs, cw=True)
    params = m_plain.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    y_plain = m_plain.apply({"params": params}, x)
    x_cw = jnp.transpose(x, (0, 1, 2, 4, 3))
    y_cw = m_cw.apply({"params": params}, x_cw)
    y_cw = jnp.transpose(y_cw, (0, 1, 2, 4, 3))
    return np.asarray(y_plain), np.asarray(y_cw)


@pytest.mark.parametrize("cls,kw,shape", [
    (ConvNormAct, dict(out_ch=8, norm="in", act="relu", preact=True),
     (1, 4, 8, 16, 8)),
    (SingleConv, dict(out_ch=8, norm="in", act="gelu"), (1, 4, 8, 16, 8)),
    (BasicBlock, dict(out_ch=8, norm="in", act="relu"), (2, 4, 8, 16, 8)),
    # in_ch != out_ch: exercises the shortcut conv in cw
    (BasicBlock, dict(out_ch=8, norm="in", act="relu"), (1, 4, 8, 16, 16)),
    # in_ch not %8: cw kernel ineligible -> transpose-island XLA conv
    (BasicBlock, dict(out_ch=8, norm="in", act="relu"), (1, 4, 8, 16, 12)),
])
def test_cw_block_matches_plain(cls, kw, shape):
    y_plain, y_cw = _pair(dict(cls=cls, **kw), shape)
    np.testing.assert_allclose(y_cw, y_plain, atol=3e-5, rtol=3e-5)


def test_cw_block_grads_match_plain():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 16, 8)).astype(np.float32))
    m_plain = BasicBlock(8, norm="in", act="relu", cw=False)
    m_cw = BasicBlock(8, norm="in", act="relu", cw=True)
    params = m_plain.init({"params": jax.random.PRNGKey(1)}, x)["params"]

    def loss_plain(p):
        return jnp.sum(m_plain.apply({"params": p}, x) ** 2)

    def loss_cw(p):
        x_cw = jnp.transpose(x, (0, 1, 2, 4, 3))
        return jnp.sum(m_cw.apply({"params": p}, x_cw) ** 2)

    g_plain = jax.grad(loss_plain)(params)
    g_cw = jax.grad(loss_cw)(params)
    flat_p, _ = jax.flatten_util.ravel_pytree(g_plain)
    flat_c, _ = jax.flatten_util.ravel_pytree(g_cw)
    np.testing.assert_allclose(np.asarray(flat_c), np.asarray(flat_p),
                               atol=5e-4, rtol=5e-4)


@pytest.mark.slow
def test_medformer_stage_cw_gate(monkeypatch):
    """With the gate forced open, the MedFormer3D forward routes its
    full-res stages through cw and still matches the plain forward."""
    from cbim_tpu.models import medformer as mf

    kw = dict(num_classes=3, base_ch=8, map_size=(1, 2, 2),
              conv_block="BasicBlock", conv_num=(1, 1, 0, 0, 0, 1, 1, 1),
              trans_num=(0, 0, 1, 1, 1, 1, 0, 0),
              chan_num=(16, 32, 64, 80, 64, 32, 16, 8),
              num_heads=(1, 1, 2, 2, 2, 2, 1, 1),
              fusion_depth=1, fusion_dim=32, fusion_heads=2,
              norm="in", act="gelu", kernel_size=[(3, 3, 3)] * 5,
              scale=[(2, 2, 2)] * 4, aux_loss=False)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))

    model = mf.MedFormer3D(**kw)
    params = model.init({"params": jax.random.PRNGKey(2)}, x)["params"]
    y_plain = model.apply({"params": params}, x)

    # force the stage gate open for these (tiny, W%128!=0) shapes: cw blocks
    # fall back to interpret kernels / transpose islands on CPU
    real_gate = mf._stage_cw_ok
    monkeypatch.setattr(mf, "_stage_cw_ok",
                        lambda x, norm, k, force=False: x.ndim == 5)
    y_cw = model.apply({"params": params}, x)
    assert not np.allclose(0, np.asarray(y_plain))  # nontrivial output
    np.testing.assert_allclose(np.asarray(y_cw), np.asarray(y_plain),
                               atol=5e-5, rtol=5e-5)
    monkeypatch.setattr(mf, "_stage_cw_ok", real_gate)


def test_cw2_block_matches_plain(monkeypatch):
    """CBIM_CW2=1 routes _PallasConvCW through the transpose-free kernels;
    outputs and grads must match the channels-last path."""
    monkeypatch.setenv("CBIM_CW2", "1")
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 16, 8)).astype(np.float32))
    m_plain = BasicBlock(8, norm="in", act="relu", cw=False)
    m_cw = BasicBlock(8, norm="in", act="relu", cw=True)
    params = m_plain.init({"params": jax.random.PRNGKey(1)}, x)["params"]

    y_plain = m_plain.apply({"params": params}, x)
    x_cw = jnp.transpose(x, (0, 1, 2, 4, 3))
    y_cw = jnp.transpose(m_cw.apply({"params": params}, x_cw),
                         (0, 1, 2, 4, 3))
    np.testing.assert_allclose(np.asarray(y_cw), np.asarray(y_plain),
                               atol=3e-5, rtol=3e-5)

    def loss_plain(p):
        return jnp.sum(m_plain.apply({"params": p}, x) ** 2)

    def loss_cw(p):
        return jnp.sum(m_cw.apply({"params": p}, x_cw) ** 2)

    g1, _ = jax.flatten_util.ravel_pytree(jax.grad(loss_plain)(params))
    g2, _ = jax.flatten_util.ravel_pytree(jax.grad(loss_cw)(params))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=2e-3, rtol=2e-3)
