"""Device-parallel sliding-window inference (window sweep sharded over the
mesh, fused with one psum) must match the single-device engine exactly up to
fp summation order — on any window grid, window_batch, and fusion mode.
Runs on the 8-device virtual CPU mesh (conftest)."""
import numpy as np

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from cbim_tpu.inference.engines import InferenceEngine


def _toy_model(C, seed=0):
    """Deterministic non-constant voxelwise model: logits depend on the input
    through a fixed random per-channel projection + spatial shift, so window
    placement errors change the output."""
    w = jnp.asarray(np.random.RandomState(seed).randn(1, C), jnp.float32)

    def apply_fn(x):                       # (B, *win, Cin)
        feats = x @ w                      # (B, *win, C)
        return feats + 0.1 * jnp.roll(feats, 1, axis=1)

    return apply_fn


def _mesh(n, axes=("data",), shape=None):
    devs = np.asarray(jax.devices()[:n])
    if shape is None:
        shape = (n,)
    return Mesh(devs.reshape(shape), axes)


def test_sharded_matches_single_device():
    C = 4
    img = jnp.asarray(np.random.RandomState(0).rand(1, 20, 24, 28, 1),
                      jnp.float32)
    e = InferenceEngine(_toy_model(C), C, window_size=(16, 16, 16),
                        window_batch=1)
    ref = np.asarray(e.sliding_window(img))
    got = np.asarray(e.sliding_window_sharded(img, _mesh(8)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_sharded_window_batch_and_gaussian():
    C = 3
    img = jnp.asarray(np.random.RandomState(1).rand(1, 20, 20, 20, 1),
                      jnp.float32)
    e = InferenceEngine(_toy_model(C, seed=1), C, window_size=(16, 16, 16),
                        window_batch=2, fusion="gaussian")
    ref = np.asarray(e.sliding_window(img))
    got = np.asarray(e.sliding_window_sharded(img, _mesh(4)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_sharded_more_devices_than_windows():
    """Grid smaller than the device count: padded groups must be inert."""
    C = 2
    img = jnp.asarray(np.random.RandomState(2).rand(1, 16, 16, 16, 1),
                      jnp.float32)   # exactly one window
    e = InferenceEngine(_toy_model(C, seed=2), C, window_size=(16, 16, 16))
    ref = np.asarray(e.sliding_window(img))
    got = np.asarray(e.sliding_window_sharded(img, _mesh(8)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_sharded_on_2d_axis_of_larger_mesh():
    """Works when 'data' is one axis of a 2D mesh (spatial axis unused)."""
    C = 3
    img = jnp.asarray(np.random.RandomState(3).rand(1, 20, 24, 24, 1),
                      jnp.float32)
    mesh = _mesh(8, axes=("data", "spatial"), shape=(4, 2))
    e = InferenceEngine(_toy_model(C, seed=3), C, window_size=(16, 16, 16))
    ref = np.asarray(e.sliding_window(img))
    got = np.asarray(e.sliding_window_sharded(img, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_validate_uses_sharded_path(monkeypatch):
    """validate(mesh=...) routes 3D sliding-window through the sharded engine."""
    from cbim_tpu.config import config_from_dict
    from cbim_tpu.data import get_dataset
    from cbim_tpu.models import get_model
    from cbim_tpu.training.validation import validate

    cfg = config_from_dict(dict(
        dataset="synthetic", model="unet", dimension="3d", classes=3,
        in_chan=1, base_chan=4, block="SingleConv", norm="in", act="relu",
        kernel_size=[[3, 3, 3]] * 5, down_scale=[[2, 2, 2]] * 4,
        training_size=[16, 16, 16], sliding_window=True,
        window_size=[16, 16, 16],
        synthetic_cases=2, synthetic_shape=[24, 24, 24], k_fold=2,
        ema=False))
    testset = get_dataset(cfg, mode="test", fold_idx=0)
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 16, 1), jnp.float32),
                           train=False)

    calls = {"sharded": 0}
    orig = InferenceEngine.sliding_window_sharded

    def spy(self, img, mesh, axis="data"):
        calls["sharded"] += 1
        return orig(self, img, mesh, axis)

    monkeypatch.setattr(InferenceEngine, "sliding_window_sharded", spy)

    d0, a0, h0 = validate(model, variables, testset, cfg,
                          compute_distance=False)
    d1, a1, h1 = validate(model, variables, testset, cfg,
                          compute_distance=False, mesh=_mesh(8))
    assert calls["sharded"] == len(testset)
    np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-6)


def test_whole_image_sharded_matches():
    """Batch-sharded whole-image == single-device, incl. non-divisible batch."""
    C = 3
    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.randn(1, C), jnp.float32)

    def apply_fn(x):                      # (B, H, W, 1) -> (B, H, W, C)
        f = x @ w
        return f + 0.3 * jnp.roll(f, 1, axis=1)

    e = InferenceEngine(apply_fn, C, window_size=None)
    for B in (8, 5, 1):                   # divisible, padded, tiny
        img = jnp.asarray(rng.rand(B, 24, 24, 1), jnp.float32)
        ref = np.asarray(e.whole_image(img))
        got = np.asarray(e.whole_image_sharded(img, _mesh(8)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
