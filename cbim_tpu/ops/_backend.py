"""Shared backend dispatch: is the default backend a real TPU?

"axon" is the tunneled single-chip TPU runtime used in this environment; it
compiles through the same Mosaic/XLA-TPU stack as "tpu", so every
TPU-only fast path (Pallas kernels, tiled gathers) must treat both the same.
A single predicate here keeps the gates from drifting (they did in round 1:
ops/resample.py checked only "tpu" and silently lost its 4x tiled path on
axon).
"""

from __future__ import annotations

import jax


def is_tpu_backend() -> bool:
    return jax.default_backend() in ("tpu", "axon")


# Process-global Pallas kill switch for sharded tracing contexts.
#
# The Pallas conv/norm kernels assume FULL-extent H/W tiles and do their own
# halo DMA; a pallas_call has no GSPMD partitioning rule, so tracing one into
# a jit whose operands are sharded along H (the trainer's optional 'spatial'
# mesh axis) would be wrong — XLA either fails or forces a full all-gather
# around the opaque custom call.  The trainer sets this flag before tracing
# the sharded step (training/trainer.py), and every dispatch gate consults
# pallas_gates_on() below, so the kernels provably cannot appear in a
# spatially-sharded program.  Verified by tests/test_parallel.py
# (test_spatial_sharding_disables_pallas).
_pallas_disabled: bool = False


def set_pallas_disabled(value: bool) -> None:
    global _pallas_disabled
    _pallas_disabled = bool(value)


def pallas_disabled() -> bool:
    return _pallas_disabled


def pallas_gates_on() -> bool:
    """Backend condition shared by all Pallas dispatch gates: a real TPU
    backend AND no spatial (H-axis) sharding active in this process."""
    return not _pallas_disabled and is_tpu_backend()
