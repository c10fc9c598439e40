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
