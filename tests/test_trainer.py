"""End-to-end trainer tests on the synthetic dataset (CPU, tiny shapes)."""
import os

import numpy as np
import pytest

import conftest as cf

import jax
import jax.numpy as jnp

from cbim_tpu.config import config_from_dict


def _cfg(tmp_path, **kw):
    base = dict(
        dataset="synthetic", model="unet", dimension="3d", classes=3,
        in_chan=1, base_chan=4, block="SingleConv", norm="in",
        down_scale=[[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]],
        kernel_size=[[1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]],
        training_size=[8, 16, 16], synthetic_cases=5, synthetic_shape=[10, 24, 24],
        affine_pad_size=[2, 4, 4], scale=[0.1, 0.2, 0.2], rotate=[10, 0, 0],
        translate=[0, 0, 0], gaussian_noise_std=0.02,
        additive_brightness_std=0.5, gamma_range=[0.7, 1.4],
        optimizer="adamw", base_lr=1e-3, betas=[0.9, 0.999], weight_decay=0.01,
        weight=[0.5, 1, 1], rlt=1, epochs=2, iter_per_epoch=2, print_freq=10,
        batch_size=2, ema=True, ema_alpha=0.99, val_freq=2,
        sliding_window=True, window_size=[8, 16, 16], k_fold=5,
        cp_path=str(tmp_path / "exp"), log_path=str(tmp_path / "log"),
        unique_name="t")
    base.update(kw)
    return config_from_dict(base)


def test_train_net_end_to_end(tmp_path):
    from cbim_tpu.training.trainer import train_net

    cfg = _cfg(tmp_path)
    dice, asd, hd = train_net(cfg, fold_idx=0)
    assert dice.shape == (2,)
    assert np.all(np.isfinite(dice))
    ckpt_dir = os.path.join(cfg.cp_path, "synthetic", "t")
    assert os.path.exists(os.path.join(ckpt_dir, "fold_0_latest.ckpt"))
    assert os.path.exists(os.path.join(ckpt_dir, "fold_0_best.ckpt"))


def test_checkpoint_roundtrip(tmp_path):
    from cbim_tpu.models import get_model
    from cbim_tpu.training.checkpoint import load_checkpoint, save_checkpoint
    from cbim_tpu.training.train_state import create_train_state

    cfg = _cfg(tmp_path)
    model = get_model(cfg)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 8, 16, 16, 1)))
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, epoch=3)

    state2, _ = create_train_state(model, cfg, jax.random.PRNGKey(1),
                                   jnp.zeros((1, 8, 16, 16, 1)))
    restored, epoch = load_checkpoint(path, state2)
    assert epoch == 3 and int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lr_schedule_matches_reference():
    """Pure-function schedule vs the reference's in-place version."""
    from cbim_tpu.training.schedules import exp_lr_scheduler_with_warmup

    # reference math, transcribed (training/utils.py:77-93)
    def ref(init_lr, epoch, warmup, maxe):
        if 0 <= epoch <= warmup and warmup != 0:
            if epoch == warmup:
                return init_lr
            return init_lr * 2.718 ** (10 * (float(epoch) / float(warmup) - 1.0))
        return init_lr * (1 - epoch / maxe) ** 0.9

    for e in range(0, 150, 7):
        assert abs(exp_lr_scheduler_with_warmup(1e-3, e, 5, 150)
                   - ref(1e-3, e, 5, 150)) < 1e-12


def test_sliding_window_grid_matches_reference():
    """split_idx + grid enumeration parity with inference/utils.py:29-43."""
    from cbim_tpu.inference.engines import _grid_starts, split_idx

    # reference split_idx transcription
    def ref_split(half, size, i):
        s = half * i
        e = s + half * 2
        if e > size:
            s = size - half * 2
            e = size
        return s, e

    for size, win in [(37, 16), (16, 16), (100, 32), (48, 16)]:
        half = win // 2
        for i in range(size // half):
            assert split_idx(half, size, i) == ref_split(half, size, i)

    starts = _grid_starts((20, 37, 48), (16, 16, 16))
    assert starts.shape[1] == 3
    assert starts.min() >= 0
    assert (starts[:, 0] + 16 <= 20).all()
    assert (starts[:, 1] + 16 <= 37).all()


def test_sliding_window_uniform_fusion_exact():
    """A constant-logit 'model' must produce uniform probs after fusion, and
    window_batch must not change results."""
    from cbim_tpu.inference.engines import InferenceEngine

    C = 3

    def apply_fn(x):
        # deterministic pseudo-model: logits depend on input mean
        base = jnp.mean(x, axis=tuple(range(1, x.ndim)), keepdims=False)
        return jnp.stack([base, base * 2, base * 3], axis=-1)[:, None, None, None, :] \
            * jnp.ones((*x.shape[:-1], C))

    img = jnp.asarray(np.random.RandomState(0).rand(1, 20, 24, 24, 1), jnp.float32)
    e1 = InferenceEngine(apply_fn, C, window_size=(16, 16, 16), window_batch=1)
    e2 = InferenceEngine(apply_fn, C, window_size=(16, 16, 16), window_batch=4)
    p1 = np.asarray(e1.sliding_window(img))
    p2 = np.asarray(e2.sliding_window(img))
    np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-6)
    # probabilities sum to one everywhere (counter division exact)
    np.testing.assert_allclose(p1.sum(-1), 1.0, rtol=1e-5)


def test_sliding_window_matches_numpy_oracle():
    """Full fusion semantics vs a naive numpy scatter-add oracle
    (pad -> enumerate windows -> softmax -> prob-sum + visit-counter ->
    divide; reference inference3d.py:44-90), with a non-constant model."""
    from cbim_tpu.inference.engines import InferenceEngine, _grid_starts

    C = 4
    win = (16, 16, 16)
    rng = np.random.RandomState(7)
    w = jnp.asarray(rng.randn(1, C), jnp.float32)

    def apply_fn(x):                      # (B, *win, 1)
        f = x @ w
        return f + 0.2 * jnp.roll(f, 2, axis=2)

    for shape in [(20, 24, 28), (12, 16, 16)]:   # second one needs padding
        img = jnp.asarray(rng.rand(1, *shape, 1), jnp.float32)
        e = InferenceEngine(apply_fn, C, window_size=win, window_batch=2)
        got = np.asarray(e.sliding_window(img))

        pads = [(0, max(0, wn - s)) for s, wn in zip(shape, win)]
        img_np = np.pad(np.asarray(img), [(0, 0)] + pads + [(0, 0)])
        pd = img_np.shape[1:4]
        acc = np.zeros((*pd, C), np.float64)
        cnt = np.zeros((*pd, 1), np.float64)
        for s in _grid_starts(pd, win):
            sl = tuple(slice(int(o), int(o) + wn) for o, wn in zip(s, win))
            logits = np.asarray(apply_fn(img_np[(slice(None), *sl)]))[0]
            ex = np.exp(logits - logits.max(-1, keepdims=True))
            acc[sl] += ex / ex.sum(-1, keepdims=True)
            cnt[sl] += 1.0
        ref = (acc / cnt)[: shape[0], : shape[1], : shape[2]]
        np.testing.assert_allclose(got[0], ref, rtol=1e-4, atol=1e-5)


def test_async_checkpoint_roundtrip(tmp_path):
    """Async save (background serialize+write) then load restores exactly;
    load joins the in-flight writer."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cbim_tpu.config import config_from_dict
    from cbim_tpu.models.layers.convs import SingleConv
    from cbim_tpu.training.checkpoint import (load_checkpoint,
                                              save_checkpoint, wait_pending)
    from cbim_tpu.training.train_state import create_train_state

    cfg = config_from_dict(dict(
        dataset="synthetic", model="unet", dimension="2d", classes=2,
        weight=[1, 1], rlt=1, optimizer="adamw", base_lr=1e-3,
        betas=[0.9, 0.999], weight_decay=0.01, ema=True, ema_alpha=0.99))
    model = SingleConv(4, norm="in", act="relu")
    x = jnp.zeros((1, 8, 8, 1), jnp.float32)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), x)

    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, epoch=3)          # async by default
    # immediately load: must join the writer, not read a torn file
    restored, start = load_checkpoint(path, state)
    assert start == 3
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    wait_pending()                                  # idempotent
