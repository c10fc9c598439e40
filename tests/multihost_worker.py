"""Worker for the 2-process jax.distributed CPU test (test_multihost.py).

Each process initializes the distributed runtime, evaluates a strided subset
of the synthetic test volumes, and reduces per-class metric sums with
``process_allgather`` — the exact multi-host path of
cbim_tpu/training/validation.py:112-124.  Process 0 writes the result.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator = sys.argv[1]
    num_procs = int(sys.argv[2])
    pid = int(sys.argv[3])
    out_path = sys.argv[4]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs, process_id=pid)
    assert jax.process_count() == num_procs

    import numpy as np
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
    model = get_model(cfg)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 8, 16, 16, 1)))
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    dice, asd, hd = validate(model, variables, testset, cfg,
                             compute_distance=False)
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"dice": np.asarray(dice).tolist(),
                       "n_test": len(testset)}, f)
    print(f"proc {pid} done", flush=True)


if __name__ == "__main__":
    main()
