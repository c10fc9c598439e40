"""Optimizers (reference training/utils.py:8-14) as optax transforms.

The LR is injected per step (inject_hyperparams) so the per-epoch schedule
does not trigger recompilation.  Matching torch semantics:
- SGD: momentum buffer update v = mu*v + g, param step -lr*v
  (optax.sgd with nesterov=False, accumulator_dtype default)
- Adam/AdamW: betas from config; AdamW eps=1e-5 (reference uses a larger eps
  for mixed-precision stability) and decoupled weight decay applied to ALL
  parameters (torch AdamW does not mask biases/norms; neither do we).
"""

from __future__ import annotations

import optax


def _make(cfg):
    name = cfg.optimizer
    if name == "sgd":
        return lambda learning_rate: optax.sgd(
            learning_rate, momentum=cfg.momentum, nesterov=False)
    if name == "adam":
        b1, b2 = cfg.betas
        wd = cfg.weight_decay
        # torch Adam's weight_decay is L2 (added to the grad BEFORE the
        # moment updates), not decoupled:
        def adam(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8),
                optax.scale_by_learning_rate(learning_rate))
        return adam
    if name == "adamw":
        b1, b2 = cfg.betas
        return lambda learning_rate: optax.adamw(
            learning_rate, b1=b1, b2=b2, eps=1e-5,
            weight_decay=cfg.weight_decay)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def get_optimizer(cfg) -> optax.GradientTransformation:
    return optax.inject_hyperparams(_make(cfg))(learning_rate=cfg.base_lr)
