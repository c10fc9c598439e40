"""The multiplicity-weighted dedup vs the reference's duplicate-accumulating
triple loop (reference inference/inference3d.py:61-88, utils.py:29-43).

The reference's clamped grid revisits a start whenever an axis size is a
multiple of the half-window (the last index clamps flush to the border and
lands on an existing start).  The engine runs each unique window once and
scales by the integer multiplicity (engines._dedup_starts); this test
transcribes the reference loop — duplicates and all — as a numpy oracle and
checks the engine matches on a 3D shape that duplicates along every axis.
"""

import jax.numpy as jnp
import numpy as np

from cbim_tpu.inference.engines import InferenceEngine, split_idx


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def test_dedup_matches_reference_duplicate_loop_3d():
    C = 4
    win = (32, 32, 32)
    # 32x48x48: D = window (the clamped second index duplicates start 0),
    # H/W = 1.5x window (the clamped third index duplicates start 16)
    shape = (32, 48, 48)

    def apply_np(x):
        """Content-dependent pseudo-model, identical in numpy and jax."""
        base = x[..., 0]
        return np.stack([base, -base, 0.5 * base + 0.1, base * base], axis=-1)

    def apply_jax(x):
        base = x[..., 0]
        return jnp.stack([base, -base, 0.5 * base + 0.1, base * base], axis=-1)

    rng = np.random.RandomState(7)
    vol = rng.rand(1, *shape, 1).astype(np.float32)

    # ---- numpy oracle: the reference triple loop WITH duplicates ----------
    halves = [w // 2 for w in win]
    acc = np.zeros((*shape, C), np.float64)
    cnt = np.zeros(shape, np.float64)
    n_visits = 0
    for i in range(shape[0] // halves[0]):
        d0, d1 = split_idx(halves[0], shape[0], i)
        for j in range(shape[1] // halves[1]):
            h0, h1 = split_idx(halves[1], shape[1], j)
            for k in range(shape[2] // halves[2]):
                w0, w1 = split_idx(halves[2], shape[2], k)
                patch = vol[0, d0:d1, h0:h1, w0:w1]
                probs = _softmax(apply_np(patch[None])[0])
                acc[d0:d1, h0:h1, w0:w1] += probs
                cnt[d0:d1, h0:h1, w0:w1] += 1.0
                n_visits += 1
    oracle = acc / cnt[..., None]

    # the chosen shape really does duplicate: 2*3*3 visits, fewer uniques
    assert n_visits == 18

    engine = InferenceEngine(apply_jax, C, window_size=win, window_batch=1)
    # engine runs only unique windows
    img_p, starts, valid, *_ = engine._prepare_windows(jnp.asarray(vol))
    assert int((np.asarray(valid) > 0).sum()) < n_visits
    assert float(np.asarray(valid).sum()) == float(n_visits)  # multiplicity

    got = np.asarray(engine.sliding_window(jnp.asarray(vol)))[0]
    np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-6)


def test_dedup_matches_reference_duplicate_loop_3d_window_batched():
    """Same oracle with window_batch='auto' (non-trivial grouping)."""
    C = 2
    win = (16, 16, 16)
    shape = (16, 24, 32)  # duplicates along D (16) and W (32)

    def apply_jax(x):
        base = x[..., 0]
        return jnp.stack([base, 1.0 - base], axis=-1)

    rng = np.random.RandomState(3)
    vol = rng.rand(1, *shape, 1).astype(np.float32)

    halves = [w // 2 for w in win]
    acc = np.zeros((*shape, C), np.float64)
    cnt = np.zeros(shape, np.float64)
    for i in range(shape[0] // halves[0]):
        d0, d1 = split_idx(halves[0], shape[0], i)
        for j in range(shape[1] // halves[1]):
            h0, h1 = split_idx(halves[1], shape[1], j)
            for k in range(shape[2] // halves[2]):
                w0, w1 = split_idx(halves[2], shape[2], k)
                patch = vol[0, d0:d1, h0:h1, w0:w1]
                base = patch[..., 0]
                logits = np.stack([base, 1.0 - base], axis=-1)
                acc[d0:d1, h0:h1, w0:w1] += _softmax(logits)
                cnt[d0:d1, h0:h1, w0:w1] += 1.0
    oracle = acc / cnt[..., None]

    engine = InferenceEngine(apply_jax, C, window_size=win,
                             window_batch="auto")
    got = np.asarray(engine.sliding_window(jnp.asarray(vol)))[0]
    np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-6)
