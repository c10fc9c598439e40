"""2D slice-batch sliding-window engine tests (reference inference2d.py:27-71).

The reference forwards ALL slices of a volume as the batch at each window
position and fuses with a uniform visit counter; the numpy oracle below
transcribes that loop exactly.
"""
import numpy as np

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from cbim_tpu.inference.engines import InferenceEngine, split_idx


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _make_apply(C, seed=3):
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.randn(1, C), jnp.float32)

    def apply_fn(x):                       # (B, wh, ww, 1) -> (B, wh, ww, C)
        f = x @ w
        return f + 0.3 * jnp.roll(f, 1, axis=1)

    return apply_fn, np.asarray(w)


def _oracle(img, C, win, apply_np):
    """Transcription of reference inference2d.py:36-71 (no padding branch)."""
    B, H, W, _ = img.shape
    wh, ww = win
    acc = np.zeros((B, H, W, C), np.float64)
    cnt = np.zeros((B, H, W, 1), np.float64)
    for i in range(H // (wh // 2)):
        for j in range(W // (ww // 2)):
            hs, he = split_idx(wh // 2, H, i)
            ws, we = split_idx(ww // 2, W, j)
            probs = _softmax(apply_np(img[:, hs:he, ws:we]))
            acc[:, hs:he, ws:we] += probs
            cnt[:, hs:he, ws:we] += 1.0
    return acc / cnt


def test_sliding_window_slices_matches_numpy_oracle():
    C, win = 4, (16, 16)
    apply_fn, w = _make_apply(C)

    def apply_np(x):
        f = x @ w
        return f + 0.3 * np.roll(f, 1, axis=1)

    rng = np.random.RandomState(11)
    for shape in [(5, 24, 28), (3, 16, 16)]:
        img = rng.rand(*shape, 1).astype(np.float32)
        e = InferenceEngine(apply_fn, C, window_size=win)
        got = np.asarray(e.sliding_window_slices(jnp.asarray(img)))
        want = _oracle(img, C, win, apply_np)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_sliding_window_slices_pads_small_inputs():
    """Inputs smaller than the window (the reference 2D path would fail)."""
    C, win = 3, (16, 16)
    apply_fn, _ = _make_apply(C)
    img = jnp.asarray(np.random.RandomState(0).rand(4, 10, 12, 1), jnp.float32)
    e = InferenceEngine(apply_fn, C, window_size=win)
    got = np.asarray(e.sliding_window_slices(img))
    assert got.shape == (4, 10, 12, C)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_sliding_window_slices_sharded_matches():
    from jax.sharding import Mesh

    C, win = 3, (16, 16)
    apply_fn, _ = _make_apply(C)
    img = jnp.asarray(np.random.RandomState(2).rand(5, 24, 24, 1), jnp.float32)
    e = InferenceEngine(apply_fn, C, window_size=win)
    single = np.asarray(e.sliding_window_slices(img))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    sharded = np.asarray(e.sliding_window_slices_sharded(img, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_validate_routes_2d_sliding_window(monkeypatch):
    """cfg.dimension=2d + sliding_window=True must take the 2D window sweep."""
    from cbim_tpu.config import config_from_dict
    from cbim_tpu.data.factory import get_dataset
    from cbim_tpu.models import get_model
    from cbim_tpu.training import validation as V
    from cbim_tpu.training.train_state import create_train_state

    cfg = config_from_dict(dict(
        dataset="synthetic", model="unet", dimension="2d", classes=3,
        in_chan=1, base_chan=8, block="SingleConv", norm="in", act="relu",
        training_size=[16, 16], synthetic_cases=2, synthetic_shape=[4, 24, 24],
        split_seed=0, k_fold=2, sliding_window=True, window_size=[16, 16],
        optimizer="adamw", base_lr=1e-3, betas=[0.9, 0.999], weight_decay=0.0,
        weight=[1, 1, 1], rlt=1, ema=False, ema_alpha=0.99))
    testset = get_dataset(cfg, mode="test", fold_idx=0)
    model = get_model(cfg)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 16, 16, 1)))

    called = {}
    orig = V.make_engine

    def spy_engine(*a, **k):
        eng = orig(*a, **k)
        orig_sw = eng.sliding_window_slices

        def wrapped(img):
            called["sw2d"] = True
            return orig_sw(img)

        eng.sliding_window_slices = wrapped
        return eng

    monkeypatch.setattr(V, "make_engine", spy_engine)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dice, asd, hd = V.validate(model, variables, testset, cfg,
                               compute_distance=False)
    assert called.get("sw2d"), "2D sliding-window path was not taken"
    assert dice.shape == (cfg.classes - 1,)
