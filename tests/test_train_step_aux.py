"""Regression: train step with deep supervision and no BatchNorm state.

(The flax `mutable=[]` pitfall returned (out, {}) and corrupted the
deep-supervision head list — caught by the TPU bench, fixed in
train_state.make_train_step.)
"""
import numpy as np

import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from cbim_tpu.config import config_from_dict
from cbim_tpu.models import get_model
from cbim_tpu.training.train_state import create_train_state, make_train_step


@pytest.mark.slow
def test_aux_loss_train_step_without_batch_stats():
    cfg = config_from_dict(dict(
        dataset="x", model="medformer", dimension="3d", classes=3, in_chan=1,
        base_chan=8, conv_block="BasicBlock", norm="in", act="gelu",
        map_size=[2, 2, 2], conv_num=[1, 0, 0, 0, 0, 0, 1, 1],
        trans_num=[0, 1, 1, 1, 1, 1, 0, 0], num_heads=[1, 2, 2, 2, 2, 2, 1, 1],
        expansion=2, fusion_depth=1, fusion_dim=32, fusion_heads=2,
        attn_drop=0.0, proj_drop=0.0, proj_type="depthwise", aux_loss=True,
        aux_weight=[0.5, 0.5], down_scale=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
        kernel_size=[[1, 3, 3]] * 2 + [[3, 3, 3]] * 3,
        weight=[0.5, 1, 1], rlt=1, optimizer="adamw", base_lr=1e-3,
        betas=[0.9, 0.999], weight_decay=0.01, ema=True, ema_alpha=0.99,
        training_size=[8, 16, 16]))
    model = get_model(cfg)
    img = jnp.ones((2, 8, 16, 16, 1))
    lab = jnp.zeros((2, 8, 16, 16), jnp.int32)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), img[:1])
    assert not state.batch_stats     # InstanceNorm only: no BN state
    step = jax.jit(make_train_step(model, tx, cfg))
    state2, loss = step(state, img, lab, 1e-3)
    assert np.isfinite(float(loss))
    # params actually moved
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(state.params),
                                jax.tree.leaves(state2.params)))
    assert moved
