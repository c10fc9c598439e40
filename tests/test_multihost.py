"""2-process jax.distributed CPU test (VERDICT r1 missing-4).

Launches two real processes that form a distributed JAX cluster, each
evaluating a strided half of the synthetic test volumes; the per-class sums
are reduced with ``process_allgather`` (validation.py:112-124).  The result
must equal a single-process evaluation of the full test set.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import conftest  # noqa: F401


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_validation_matches_single(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    out = tmp_path / "multi.json"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # no virtual device mesh in workers
    env["JAX_PLATFORMS"] = "cpu"

    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, "2", str(pid), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        outputs.append(stdout.decode())
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, text[-3000:]
    multi = json.loads(out.read_text())

    # single-process oracle in-process (conftest's 8-device mesh is fine:
    # process_count() is 1 so the allgather path is skipped)
    import jax
    import jax.numpy as jnp
    from cbim_tpu.config import config_from_dict
    from cbim_tpu.data import get_dataset
    from cbim_tpu.models import get_model
    from cbim_tpu.training.train_state import create_train_state
    from cbim_tpu.training.validation import validate

    cfg = config_from_dict(dict(
        dataset="synthetic", model="unet", dimension="3d", classes=3,
        in_chan=1, base_chan=4, block="SingleConv", norm="in",
        down_scale=[[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]],
        kernel_size=[[1, 3, 3]] + [[3, 3, 3]] * 4,
        training_size=[8, 16, 16], synthetic_cases=6,
        synthetic_shape=[10, 24, 24], split_seed=0, k_fold=3,
        sliding_window=True, window_size=[8, 16, 16],
        optimizer="adamw", base_lr=1e-3, betas=[0.9, 0.999],
        weight_decay=0.0, weight=[1, 1, 1], rlt=1, ema=False,
        ema_alpha=0.99))
    testset = get_dataset(cfg, mode="test", fold_idx=0)
    assert len(testset) == multi["n_test"] and len(testset) >= 2
    model = get_model(cfg)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 8, 16, 16, 1)))
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    dice, _, _ = validate(model, variables, testset, cfg,
                          compute_distance=False)

    np.testing.assert_allclose(np.asarray(multi["dice"]), np.asarray(dice),
                               rtol=1e-5, atol=1e-6)
