"""jax.export serving artifacts: roundtrip parity with the live engines.

The exported program must be bit-identical to the in-process inference it
freezes (same jitted computation, constants baked), and must be runnable
from the serialized bytes alone.
"""
import numpy as np
import pytest

import conftest as cf  # noqa: F401

import jax
import jax.numpy as jnp

from cbim_tpu.config import config_from_dict


def _cfg(**kw):
    base = dict(
        dataset="synthetic", model="unet", dimension="3d", classes=3,
        in_chan=1, base_chan=4, block="SingleConv", norm="in",
        down_scale=[[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]],
        kernel_size=[[1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]],
        training_size=[8, 16, 16], batch_size=1, ema=False,
        sliding_window=True, window_size=[8, 16, 16])
    base.update(kw)
    return config_from_dict(base)


def _model_vars(cfg):
    from cbim_tpu.models import get_model

    model = get_model(cfg)
    nd = 3 if cfg.dimension == "3d" else 2
    sample = jnp.zeros((1, *cfg.training_size[:nd], cfg.in_chan))
    variables = model.init({"params": jax.random.PRNGKey(0)}, sample,
                           train=False)
    return model, variables


@pytest.mark.slow
def test_window_forward_roundtrip():
    from cbim_tpu.inference.export import (export_window_forward,
                                           load_exported)

    cfg = _cfg()
    model, variables = _model_vars(cfg)
    data = export_window_forward(model, variables, (8, 16, 16), 1, batch=2)
    assert isinstance(data, bytes) and len(data) > 0

    fn = load_exported(data)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 16, 16, 1)),
                    jnp.float32)
    got = np.asarray(fn(x))
    want = np.asarray(jax.nn.softmax(
        model.apply(variables, x, train=False).astype(jnp.float32), axis=-1))
    # vs the UNJITTED apply: fusion differences allow ~1e-6 rel drift
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    assert got.shape == (2, 8, 16, 16, 3)


def test_sliding_window_roundtrip_matches_engine():
    from cbim_tpu.inference.engines import make_engine
    from cbim_tpu.inference.export import (export_sliding_window,
                                           load_exported)

    cfg = _cfg()
    model, variables = _model_vars(cfg)
    vol = (10, 20, 24)  # needs padding on no axis, multiple windows
    data = export_sliding_window(model, variables, cfg, vol, window_batch=2)
    fn = load_exported(data)

    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, *vol, 1)),
                    jnp.float32)
    got = np.asarray(fn(x))
    engine = make_engine(model, variables, cfg, window_batch=2)
    want = np.asarray(engine.sliding_window(x))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (1, *vol, 3)


def test_sliding_window_export_pads_small_volume():
    """A raw volume smaller than the window is padded inside the program
    and cropped back (reference inference3d.py:44-54 semantics)."""
    from cbim_tpu.inference.engines import make_engine
    from cbim_tpu.inference.export import (export_sliding_window,
                                           load_exported)

    cfg = _cfg()
    model, variables = _model_vars(cfg)
    vol = (6, 12, 20)  # smaller than the window on two axes
    fn = load_exported(
        export_sliding_window(model, variables, cfg, vol, window_batch=1))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, *vol, 1)),
                    jnp.float32)
    got = np.asarray(fn(x))
    want = np.asarray(make_engine(model, variables, cfg,
                                  window_batch=1).sliding_window(x))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (1, *vol, 3)


@pytest.mark.slow
def test_export_cli(tmp_path):
    """tools/export_model.py end-to-end from a saved checkpoint."""
    import subprocess
    import sys
    import os

    from cbim_tpu.training.checkpoint import save_checkpoint, wait_pending
    from cbim_tpu.training.train_state import create_train_state
    from cbim_tpu.models import get_model

    # a checkpoint to export from, via a config the CLI can load
    cfgdir = tmp_path / "configs" / "synthetic"
    cfgdir.mkdir(parents=True)
    (cfgdir / "unet_3d.yaml").write_text(
        "classes: 3\nin_chan: 1\nbase_chan: 4\nblock: SingleConv\n"
        "norm: in\nema: false\nsliding_window: true\n"
        "training_size: [8, 16, 16]\nwindow_size: [8, 16, 16]\n"
        "down_scale: [[1,2,2],[2,2,2],[2,2,2],[2,2,2]]\n"
        "kernel_size: [[1,3,3],[3,3,3],[3,3,3],[3,3,3],[3,3,3]]\n"
        "optimizer: adamw\nbase_lr: 0.001\nbetas: [0.9, 0.999]\n"
        "weight_decay: 0.01\nweight: [0.5, 1, 1]\n")
    cfg = _cfg(optimizer="adamw", base_lr=1e-3, betas=[0.9, 0.999],
               weight_decay=0.01, weight=[0.5, 1, 1], ema=True)
    model = get_model(cfg)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 8, 16, 16, 1)))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, state, epoch=1)
    wait_pending()

    out = str(tmp_path / "m.jaxexp")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "export_model.py"),
         "--dataset", "synthetic", "--model", "unet", "--dimension", "3d",
         "--load", ckpt, "--out", out, "--platform", "cpu",
         "--config_root", str(tmp_path / "configs")],
        capture_output=True, timeout=600, env=env, cwd=repo)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    fn = jax.export.deserialize(open(out, "rb").read()).call
    x = jnp.zeros((1, 8, 16, 16, 1), jnp.float32)
    probs = np.asarray(fn(x))
    assert probs.shape == (1, 8, 16, 16, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
