"""The training runtime (reference train.py:51-135 train_net / train_epoch).

One fold: build datasets + on-device pipeline + model + optimizer, run the
epoch loop with per-epoch LR, jitted (CE+Dice+EMA) train steps, latest/best
checkpointing, and periodic sliding-window validation.

Distribution: pass a ``jax.sharding.Mesh`` (see cbim_tpu.parallel) and the
batch is sharded over the 'data' axis; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import get_dataset
from ..data.pipeline import TrainPipeline
from ..models import get_model
from ..utils.logging import (AverageMeter, MetricWriter, ProgressMeter,
                             log_evaluation_result)
from .checkpoint import load_checkpoint, save_checkpoint
from .schedules import exp_lr_scheduler_with_warmup
from .train_state import (create_train_state, eval_variables, make_train_step)
from .validation import filter_validation_results, validate


def train_net(cfg, fold_idx: int = 0, mesh=None):
    """Train one fold; returns (best_dice, best_hd, best_asd) arrays."""
    trainset = get_dataset(cfg, mode="train", fold_idx=fold_idx)
    testset = get_dataset(cfg, mode="test", fold_idx=fold_idx)
    logging.info("Created Dataset and Pipeline")

    shard_fn = None
    if mesh is not None:
        from ..parallel.mesh import shard_batch
        shard_fn = lambda x: shard_batch(x, mesh)  # noqa: E731

    pipeline = TrainPipeline(trainset, cfg, seed=cfg.split_seed + fold_idx,
                             batch_shard_fn=shard_fn, mesh=mesh)

    model = get_model(cfg)
    rng = jax.random.PRNGKey(cfg.split_seed + 1000 * fold_idx)
    sample = jnp.zeros((1, *pipeline.crop_size, cfg.in_chan), jnp.float32)
    state, tx = create_train_state(model, cfg, rng, sample)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    logging.info("Created Model (%s, %.2fM params)", cfg.model, n_params / 1e6)

    step_fn = make_train_step(model, tx, cfg)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        # optional spatial axis (cfg mesh_axes: [data, spatial]): shards the
        # volume's H axis — the volumetric sequence-parallel analogue
        # (SURVEY §5.7); XLA inserts the conv halo exchanges.
        sp = dict(mesh.shape).get("spatial", 1) > 1
        # The Pallas kernels assume full-extent H/W tiles (they do their
        # own halo DMA) and a pallas_call carries no GSPMD partitioning
        # rule, so they must not be traced into an H-sharded program.
        # This flips every dispatch gate for the process (see
        # ops/_backend.py pallas_gates_on); set unconditionally so a
        # data-parallel-only run after a spatial one re-enables them.
        from ..ops._backend import set_pallas_disabled
        set_pallas_disabled(sp)
        if sp:
            logging.info("Spatial axis > 1: Pallas kernels disabled "
                         "(GSPMD handles conv halo exchange)")
        if sp:
            is3d = cfg.dimension == "3d"
            h = cfg.training_size[1 if is3d else 0]
            assert h % mesh.shape["spatial"] == 0, \
                (h, mesh.shape["spatial"], "H must divide the spatial axis")
            h_axis = 2 if is3d else 1          # img: (B, D, H, W, C)/(B, H, W, C)
            img_spec = [None] * (5 if is3d else 4)
            img_spec[0], img_spec[h_axis] = "data", "spatial"
            bsh_img = NamedSharding(mesh, P(*img_spec))
            bsh_lab = NamedSharding(mesh, P(*img_spec[:-1]))
            logging.info("Spatial sharding: H axis over %d devices",
                         mesh.shape["spatial"])
        else:
            bsh_img = NamedSharding(mesh, P("data"))
            bsh_lab = bsh_img
        if sp:
            # the pipeline emits 'data'-sharded batches; committed shardings
            # must match the jit spec exactly, so reshard (a device-local
            # all-to-all over the H axis, no host roundtrip)
            _reshard = lambda im, lb: (jax.device_put(im, bsh_img),   # noqa: E731
                                       jax.device_put(lb, bsh_lab))
        else:
            _reshard = None
        state = jax.device_put(state, repl)
        train_step = jax.jit(step_fn,
                             in_shardings=(repl, bsh_img, bsh_lab, None),
                             out_shardings=(repl, repl),
                             donate_argnums=0)
    else:
        from ..ops._backend import set_pallas_disabled
        set_pallas_disabled(False)
        train_step = jax.jit(step_fn, donate_argnums=0)

    ckpt_dir = os.path.join(cfg.cp_path, cfg.dataset, cfg.unique_name)
    os.makedirs(ckpt_dir, exist_ok=True)
    writer = MetricWriter(os.path.join(cfg.log_path, cfg.dataset,
                                       cfg.unique_name, f"fold_{fold_idx}"))

    start_epoch = cfg.start_epoch
    if cfg.resume and cfg.load:
        state, start_epoch = load_checkpoint(cfg.load, state)
        logging.info("Resumed from %s at epoch %d", cfg.load, start_epoch)
    elif cfg.pretrain and cfg.get("init_model"):
        # initialize from a PyTorch-reference checkpoint (.pth) — or, for
        # transunet, the official R50+ViT-B_16 backbone .npz (the reference's
        # model/utils.py:52 pretrain path) — via the numerically-verified
        # transplants (utils/torch_import.py)
        from ..utils.torch_import import import_for_model, load_torch_state_dict
        cur_vars = {"params": state.params, "batch_stats": state.batch_stats}
        if str(cfg.init_model).endswith(".npz") and cfg.model == "transunet":
            import numpy as _np
            from ..utils.torch_import import import_transunet_npz
            new_vars = import_transunet_npz(_np.load(cfg.init_model), cur_vars)
        elif cfg.model == "swinunet":
            import torch as _torch
            ckpt = _torch.load(cfg.init_model, map_location="cpu",
                               weights_only=False)
            if isinstance(ckpt, dict) and "model" in ckpt:
                # official swin-tiny ImageNet checkpoint (reference
                # model/utils.py:64 load_from path)
                from ..utils.torch_import import import_swinunet_pth
                new_vars = dict(cur_vars)
                new_vars["params"] = import_swinunet_pth(
                    ckpt, cur_vars["params"])
            else:
                sd = load_torch_state_dict(cfg.init_model)
                new_vars = import_for_model(cfg, sd, cur_vars)
        elif cfg.model == "swin_unetr":
            import torch as _torch
            ckpt = _torch.load(cfg.init_model, map_location="cpu",
                               weights_only=False)
            inner = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) \
                else ckpt
            if isinstance(inner, dict) and \
                    any(str(k).startswith("module.") for k in inner):
                # ssl-pretrained swin-vit backbone (model_swinvit.pt format,
                # reference model/utils.py:107-115 load_from path)
                from ..utils.torch_import import import_swin_unetr_ssl
                new_vars = dict(cur_vars)
                new_vars["params"] = import_swin_unetr_ssl(
                    ckpt, cur_vars["params"])
            else:
                sd = load_torch_state_dict(cfg.init_model)
                new_vars = import_for_model(cfg, sd, cur_vars)
        else:
            sd = load_torch_state_dict(cfg.init_model)
            new_vars = import_for_model(cfg, sd, cur_vars)
        import jax.numpy as _jnp
        params = new_vars["params"]
        stats = new_vars.get("batch_stats", state.batch_stats)
        state = state.replace(params=jax.tree.map(_jnp.asarray, params),
                              batch_stats=jax.tree.map(_jnp.asarray, stats))
        if cfg.ema and state.ema_params is not None:
            state = state.replace(
                ema_params=jax.tree.map(_jnp.asarray, params),
                ema_batch_stats=(jax.tree.map(_jnp.asarray, stats)
                                 if state.ema_batch_stats is not None else None))
        logging.info("Initialized from torch checkpoint %s", cfg.init_model)

    if cfg.dimension == "2d":
        # epoch length matches the reference DataLoader (slice_count/batch);
        # sampling draws from a host-side per-epoch permutation without
        # replacement, the reference DataLoader's shuffle semantics
        # (pipeline._draw_indices; docs/benchmarks.md "2D epoch semantics")
        iters = max(1, len(trainset.images) // cfg.batch_size)
    else:
        iters = cfg.iter_per_epoch

    best_dice = np.zeros(cfg.classes)
    best_hd = np.ones(cfg.classes) * 1000
    best_asd = np.ones(cfg.classes) * 1000
    # scalar-mean comparison exactly as the reference (train.py:87,117):
    # initial best is mean(zeros)=0, and >= makes the first eval always win
    best_mean = 0.0

    global_step = int(state.step)
    # one engine per fold: weights are traced arguments of its compiled
    # programs, so per-epoch evals swap them without recompiling
    from ..inference.engines import make_engine
    eval_engine = make_engine(model, eval_variables(state, cfg.ema), cfg)
    for epoch in range(start_epoch, cfg.epochs):
        lr = exp_lr_scheduler_with_warmup(cfg.base_lr, epoch, warmup_epoch=5,
                                          max_epoch=cfg.epochs)
        logging.info("Starting epoch %d/%d (lr %.4e)", epoch + 1, cfg.epochs, lr)

        batch_time = AverageMeter("Time", ":6.2f")
        epoch_loss = AverageMeter("Loss", ":.2f")
        progress = ProgressMeter(iters, [batch_time, epoch_loss],
                                 prefix=f"Epoch: [{epoch + 1}]")

        # profiler hook (SURVEY §5.1): one traced epoch when cfg.profile_dir set
        profiling = bool(cfg.get("profile_dir")) and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(cfg.get("profile_dir"))

        tic = time.time()
        img, lab = pipeline.next_batch(cfg.batch_size)
        if mesh is not None and _reshard is not None:
            img, lab = _reshard(img, lab)
        for it in range(iters):
            state, loss = train_step(state, img, lab, lr)
            if it + 1 < iters:
                # prefetch: host work + H2D overlap the dispatched step
                img, lab = pipeline.next_batch(cfg.batch_size)
                if mesh is not None and _reshard is not None:
                    img, lab = _reshard(img, lab)
            if it % cfg.print_freq == 0:
                # loss fetch syncs the device; only pay it when printing
                epoch_loss.update(float(loss), cfg.batch_size)
                batch_time.update(time.time() - tic)
                progress.display(it)
            tic = time.time()
            global_step += 1

        if profiling:
            jax.block_until_ready(loss)
            jax.profiler.stop_trace()
            logging.info("Profile trace written to %s", cfg.get("profile_dir"))

        # throughput meter (volumes/sec/chip — the BASELINE.json north star)
        if batch_time.count:
            vols_per_sec = cfg.batch_size / max(batch_time.avg, 1e-9)
            writer.add_scalar("Perf/volumes_per_sec_per_chip",
                              vols_per_sec / max(jax.device_count(), 1),
                              epoch + 1)

        writer.add_scalar("Train/Loss", epoch_loss.avg, epoch + 1)
        writer.add_scalar("LR", lr, epoch + 1)

        # cfg.save_ckpt=False skips both latest and best saves: the
        # device->host state snapshot is NOT cheap on a tunneled/remote
        # backend (~GBs per epoch for the large transformer models), and
        # metric-only runs (convergence parity, benchmarking) don't need it.
        save_ckpt = cfg.get("save_ckpt", True)
        if save_ckpt:
            save_checkpoint(
                os.path.join(ckpt_dir, f"fold_{fold_idx}_latest.ckpt"),
                state, epoch + 1,
                backend=getattr(cfg, "ckpt_backend", "msgpack"))

        if (epoch + 1) % cfg.val_freq == 0:
            variables = eval_variables(state, cfg.ema)
            dice, asd, hd = validate(model, variables, testset, cfg,
                                     mesh=mesh, engine=eval_engine)
            dice, asd, hd = filter_validation_results(dice, asd, hd, cfg)
            log_evaluation_result(writer, dice, asd, hd, "test", epoch)
            if np.nanmean(dice) >= best_mean:
                best_mean = float(np.nanmean(dice))
                best_dice = dice
                best_hd = hd
                best_asd = asd
                if save_ckpt:
                    save_checkpoint(
                        os.path.join(ckpt_dir, f"fold_{fold_idx}_best.ckpt"),
                        state, epoch + 1,
                        backend=getattr(cfg, "ckpt_backend", "msgpack"))
            logging.info("Evaluation Done")
            logging.info("Dice: %.4f / Best Dice: %.4f",
                         np.nanmean(dice), best_mean)

    from .checkpoint import wait_pending
    wait_pending()          # flush the async ckpt writer before fold teardown
    writer.close()
    return best_dice, best_hd, best_asd


def write_cross_validation(cfg, dice_list, hd_list, asd_list):
    """cross_validation.txt aggregation (reference train.py:347-383)."""
    total_dice = np.vstack(dice_list)
    total_hd = np.vstack(hd_list)
    total_asd = np.vstack(asd_list)
    out_dir = os.path.join(cfg.cp_path, cfg.dataset, cfg.unique_name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "cross_validation.txt"), "w") as f:
        np.set_printoptions(precision=4, suppress=True)
        for name, per_fold, total in [("Dice", dice_list, total_dice),
                                      ("HD", hd_list, total_hd),
                                      ("ASD", asd_list, total_asd)]:
            f.write(f"{name}\n")
            for i, row in enumerate(per_fold):
                f.write(f"Fold {i}: {row}\n")
            f.write(f"Each Class {name} Avg: {np.mean(total, axis=0)}\n")
            f.write(f"Each Class {name} Std: {np.std(total, axis=0)}\n")
            f.write(f"All classes {name} Avg: {total.mean()}\n")
            f.write(f"All classes {name} Std: {np.mean(total, axis=1).std()}\n")
            f.write("\n")
