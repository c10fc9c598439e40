"""Gaussian window-fusion option tests."""
import numpy as np

import conftest  # noqa: F401

import jax.numpy as jnp

from cbim_tpu.inference.engines import InferenceEngine


def _const_model(C):
    def apply_fn(x):
        base = jnp.mean(x, axis=tuple(range(1, x.ndim)))
        return jnp.ones((*x.shape[:-1], C)) * base[:, None, None, None, None]
    return apply_fn


def test_gaussian_fusion_probabilities_normalized():
    C = 3
    img = jnp.asarray(np.random.RandomState(0).rand(1, 20, 24, 24, 1), jnp.float32)
    e = InferenceEngine(_const_model(C), C, window_size=(16, 16, 16),
                        window_batch=2, fusion="gaussian")
    p = np.asarray(e.sliding_window(img))
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)


def test_gaussian_and_uniform_agree_for_constant_model():
    """For a model with constant softmax output the fusion mode is irrelevant."""
    C = 3
    img = jnp.asarray(np.random.RandomState(1).rand(1, 20, 20, 20, 1), jnp.float32)
    eu = InferenceEngine(_const_model(C), C, window_size=(16, 16, 16))
    eg = InferenceEngine(_const_model(C), C, window_size=(16, 16, 16),
                         fusion="gaussian")
    pu = np.asarray(eu.sliding_window(img))
    pg = np.asarray(eg.sliding_window(img))
    np.testing.assert_allclose(pu, pg, rtol=1e-5, atol=1e-6)
