"""Train state and the jitted train step.

TPU-native translation of the reference's epoch hot loop (train.py:138-231):
forward, CE+Dice (+deep-supervision weighting), backward, optimizer step, and
the per-step EMA update (training/utils.py:98-105) are one fused XLA program
(``value_and_grad`` inside ``jax.jit``).  bf16 compute needs no GradScaler —
parameters, gradients, and optimizer state stay fp32.

Under GSPMD data parallelism the same step function is jitted with sharded
batch inputs; gradient all-reduce over the mesh is inserted by the compiler
(no DDP wrapper — SURVEY §2.7, §5.8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.losses import deep_supervision_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any            # {} when the model has no BatchNorm
    ema_params: Any             # None when EMA disabled
    ema_batch_stats: Any


def create_train_state(model, cfg, rng, sample_input) -> tuple[TrainState, Any]:
    """Initialize parameters and optimizer; returns (state, tx).

    The whole initialization is ONE jitted program: flax's eager init would
    otherwise dispatch one tiny XLA computation per parameter, which is
    pathologically slow on remote-compiled TPU backends.
    """
    from .optim import get_optimizer

    tx = get_optimizer(cfg)
    ema = bool(getattr(cfg, "ema", False))

    @jax.jit
    def _init(rng):
        variables = model.init({"params": rng}, sample_input, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            batch_stats=batch_stats,
            ema_params=jax.tree.map(jnp.array, params) if ema else None,
            ema_batch_stats=jax.tree.map(jnp.array, batch_stats) if ema else None,
        )

    return _init(rng), tx


def make_train_step(model, tx, cfg):
    """Build the jitted train step: (state, img, lab, lr) -> (state, loss)."""
    class_weights = jnp.asarray(cfg.weight, jnp.float32) if cfg.get("weight") \
        else None
    aux_weight = list(cfg.aux_weight) if cfg.aux_loss else None
    rlt = float(cfg.rlt)
    ema_alpha = float(cfg.ema_alpha)
    use_ema = bool(cfg.ema)
    # Stochastic-regularization RNG (dropout / stochastic depth): the
    # reference trains nnFormer with drop_path 0.2 and TransUNet with
    # dropout 0.1 active (reference train.py:188-216); flax modules pull
    # from the "dropout" stream, so every train-mode apply gets a key
    # derived deterministically from the step counter.
    base_key = jax.random.PRNGKey(int(cfg.get("split_seed", 0) or 0))

    def loss_fn(params, batch_stats, img, lab, step):
        variables = {"params": params}
        rngs = {"dropout": jax.random.fold_in(base_key, step)}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            out, updated = model.apply(variables, img, train=True,
                                       mutable=["batch_stats"], rngs=rngs)
            new_stats = updated["batch_stats"]
        else:
            # NOTE: mutable=[] would make flax return (out, {}) — do not pass it
            out = model.apply(variables, img, train=True, rngs=rngs)
            new_stats = batch_stats
        outs = out if isinstance(out, (list, tuple)) else [out]
        if aux_weight is not None:
            loss = deep_supervision_loss(outs, lab, aux_weight, class_weights, rlt)
        else:
            loss = deep_supervision_loss(outs[:1], lab, [1.0], class_weights, rlt)
        return loss, new_stats

    def train_step(state: TrainState, img, lab, lr):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, img, lab, state.step)

        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        if use_ema:
            # alpha = min(1 - 1/(step+1), ema_alpha) (training/utils.py:98-105)
            alpha = jnp.minimum(1.0 - 1.0 / (state.step.astype(jnp.float32) + 1.0),
                                ema_alpha)
            ema_params = jax.tree.map(
                lambda e, p: e * alpha + p * (1.0 - alpha),
                state.ema_params, params)
            ema_stats = jax.tree.map(lambda s: s, new_stats)  # buffers copied
        else:
            ema_params = None
            ema_stats = None

        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, batch_stats=new_stats,
                                  ema_params=ema_params,
                                  ema_batch_stats=ema_stats)
        return new_state, loss

    return train_step


def eval_variables(state: TrainState, use_ema: bool):
    """Variables dict for evaluation (EMA net when enabled, train.py:101)."""
    if use_ema and state.ema_params is not None:
        v = {"params": state.ema_params}
        if state.ema_batch_stats:
            v["batch_stats"] = state.ema_batch_stats
    else:
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
    return v
