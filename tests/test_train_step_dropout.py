"""Regression: training models with dropout / stochastic depth ACTIVE.

The reference trains nnFormer with drop_path_rate=0.2 and TransUNet with
dropout=0.1 active (reference train.py:188-216); round 1's train step never
supplied a "dropout" PRNG so `python train.py --model nnformer` crashed at
step 1 with flax.errors.InvalidRngError. make_train_step now derives a
"dropout" key from the step counter and threads it through model.apply.
"""
import numpy as np

import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from cbim_tpu.config import config_from_dict
from cbim_tpu.training.train_state import create_train_state, make_train_step


def _train_cfg(**kw):
    base = dict(
        dataset="x", classes=4, in_chan=1, weight=[0.5, 1, 1, 1], rlt=1,
        optimizer="adamw", base_lr=1e-3, betas=[0.9, 0.999],
        weight_decay=0.01, ema=True, ema_alpha=0.99, split_seed=0)
    base.update(kw)
    return config_from_dict(base)


def _one_step(model, cfg, img, lab):
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), img[:1])
    step = jax.jit(make_train_step(model, tx, cfg))
    state2, loss = step(state, img, lab, 1e-3)
    assert np.isfinite(float(loss)), float(loss)
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(state.params),
                                jax.tree.leaves(state2.params)))
    assert moved
    return state, state2, step


@pytest.mark.slow
def test_nnformer_trains_with_drop_path_active():
    from cbim_tpu.models.nnformer import NNFormer

    cfg = _train_cfg(model="nnformer", dimension="3d", aux_loss=True,
                     aux_weight=[0.57, 0.29, 0.14])
    model = NNFormer(num_classes=4, crop_size=(16, 32, 32), embedding_dim=24,
                     num_heads=(2, 4, 8, 16), patch_size=(2, 4, 4),
                     window_size=(4, 4, 4, 4), deep_supervision=True,
                     drop_path_rate=0.2)
    img = jnp.ones((2, 16, 32, 32, 1))
    lab = jnp.zeros((2, 16, 32, 32), jnp.int32)
    _one_step(model, cfg, img, lab)


@pytest.mark.slow
def test_transunet_trains_with_dropout_active():
    from cbim_tpu.models.transunet import TransUNet

    cfg = _train_cfg(model="transunet", dimension="2d", aux_loss=False,
                     aux_weight=[1.0])
    model = TransUNet(num_classes=4, img_size=64, grid=(4, 4), hidden_size=96,
                      mlp_dim=192, num_layers=2, num_heads=4, dropout=0.1)
    img = jnp.ones((2, 64, 64, 1))
    lab = jnp.zeros((2, 64, 64), jnp.int32)
    _one_step(model, cfg, img, lab)


def test_dropout_key_varies_by_step():
    """Two consecutive steps must draw different dropout masks (fold_in(step))."""
    from cbim_tpu.models.layers.convs import DropPath
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Dense(4)(x)
            h = DropPath(0.5)(h, train=train)
            return nn.Dense(4)(h)

    cfg = _train_cfg(model="tiny", dimension="2d", classes=4, aux_loss=False,
                     aux_weight=[1.0], weight=[1, 1, 1, 1])
    model = Tiny()
    img = jnp.ones((8, 4, 4, 4))
    lab = jnp.zeros((8, 4, 4), jnp.int32)

    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), img[:1])
    step = jax.jit(make_train_step(model, tx, cfg))
    s1, loss1 = step(state, img, lab, 0.0)    # lr=0: params frozen
    s2, loss2 = step(s1, img, lab, 0.0)
    # With lr=0 the params are identical both steps, so a loss change can only
    # come from a different stochastic-depth mask.
    assert float(loss1) != float(loss2)
