"""Orbax checkpoint backend: same latest/best API as msgpack, directory
checkpoints, async writes via orbax's own machinery, sharded-array restore.

The msgpack backend stays the default (master-only file writes are correct
while params are replicated); ``ckpt_backend: orbax`` switches to collective
directory checkpoints — the multi-host-safe path once state is sharded
(reference counterpart: torch.save dicts, train.py:104-128).
"""
import os

import numpy as np
import pytest

import conftest as cf  # noqa: F401

import jax
import jax.numpy as jnp

from cbim_tpu.config import config_from_dict

pytest.importorskip("orbax.checkpoint")


def _cfg(tmp_path, **kw):
    base = dict(
        dataset="synthetic", model="unet", dimension="3d", classes=3,
        in_chan=1, base_chan=4, block="SingleConv", norm="in",
        down_scale=[[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]],
        kernel_size=[[1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]],
        training_size=[8, 16, 16], synthetic_cases=5,
        synthetic_shape=[10, 24, 24],
        affine_pad_size=[2, 4, 4], scale=[0.1, 0.2, 0.2], rotate=[10, 0, 0],
        translate=[0, 0, 0], gaussian_noise_std=0.02,
        additive_brightness_std=0.5, gamma_range=[0.7, 1.4],
        optimizer="adamw", base_lr=1e-3, betas=[0.9, 0.999],
        weight_decay=0.01,
        weight=[0.5, 1, 1], rlt=1, epochs=2, iter_per_epoch=2, print_freq=10,
        batch_size=2, ema=True, ema_alpha=0.99, val_freq=2,
        sliding_window=True, window_size=[8, 16, 16], k_fold=5,
        cp_path=str(tmp_path / "exp"), log_path=str(tmp_path / "log"),
        unique_name="t")
    base.update(kw)
    return config_from_dict(base)


def _make_state(cfg, seed):
    from cbim_tpu.models import get_model
    from cbim_tpu.training.train_state import create_train_state

    model = get_model(cfg)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(seed),
                                  jnp.zeros((1, 8, 16, 16, 1)))
    return state


def test_orbax_roundtrip(tmp_path):
    from cbim_tpu.training.checkpoint import (load_checkpoint,
                                              save_checkpoint, wait_pending)

    cfg = _cfg(tmp_path)
    state = _make_state(cfg, 0).replace(step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, epoch=3, backend="orbax")
    wait_pending()
    assert os.path.isdir(path + ".orbax")
    assert not os.path.exists(path)  # no msgpack file in orbax mode

    restored, epoch = load_checkpoint(path, _make_state(cfg, 1))
    assert epoch == 3 and int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_params_for_eval(tmp_path):
    from cbim_tpu.training.checkpoint import (load_params_for_eval,
                                              save_checkpoint, wait_pending)

    cfg = _cfg(tmp_path)
    state = _make_state(cfg, 0)
    # make ema distinguishable from params
    state = state.replace(
        ema_params=jax.tree.map(lambda p: p + 1.0, state.params))
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, epoch=1, backend="orbax")
    wait_pending()

    tpl = _make_state(cfg, 1).params
    got = load_params_for_eval(path, tpl, prefer_ema=False)
    got_ema = load_params_for_eval(path, tpl, prefer_ema=True)
    for a, b, e in zip(jax.tree.leaves(state.params), jax.tree.leaves(got),
                       jax.tree.leaves(got_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a) + 1.0, np.asarray(e))


def test_orbax_sharded_restore(tmp_path):
    """Save replicated, restore with a sharding-annotated template: the
    restored leaves carry the template's NamedSharding (the multi-host
    promise of the backend, exercised on the virtual mesh)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cbim_tpu.training.checkpoint import (load_checkpoint,
                                              save_checkpoint, wait_pending)

    cfg = _cfg(tmp_path)
    state = _make_state(cfg, 0)
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, epoch=2, backend="orbax")
    wait_pending()

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    repl = NamedSharding(mesh, P())
    tpl_state = _make_state(cfg, 1)
    tpl_state = tpl_state.replace(
        params=jax.tree.map(lambda p: jax.device_put(p, repl),
                            tpl_state.params))
    restored, epoch = load_checkpoint(path, tpl_state)
    assert epoch == 2
    leaf = jax.tree.leaves(restored.params)[0]
    assert leaf.sharding.is_equivalent_to(repl, leaf.ndim)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_trainer_orbax_backend(tmp_path):
    """train_net with ckpt_backend=orbax writes orbax dirs, and resume
    restores from them."""
    from cbim_tpu.training.trainer import train_net

    cfg = _cfg(tmp_path, ckpt_backend="orbax")
    dice, asd, hd = train_net(cfg, fold_idx=0)
    ckpt_dir = os.path.join(cfg.cp_path, "synthetic", "t")
    assert os.path.isdir(os.path.join(ckpt_dir, "fold_0_latest.ckpt.orbax"))
    assert os.path.isdir(os.path.join(ckpt_dir, "fold_0_best.ckpt.orbax"))
    assert not os.path.exists(os.path.join(ckpt_dir, "fold_0_latest.ckpt"))

    cfg2 = _cfg(tmp_path, ckpt_backend="orbax", epochs=3,
                load=os.path.join(ckpt_dir, "fold_0_latest.ckpt"))
    dice2, _, _ = train_net(cfg2, fold_idx=0)
    assert np.all(np.isfinite(dice2))
