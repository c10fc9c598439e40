"""Persistent XLA compilation cache.

On a remote-compiled TPU backend the dominant fixed cost is XLA compilation
(~minutes for the 3D train step, plus one sliding-window program per distinct
test-volume shape during validation).  The persistent cache amortizes that
across invocations and across folds/epochs of one run — the reference has no
analogue (torch re-JITs per process; cuDNN autotune is its only cache).

Called by the CLIs (train.py, prediction.py, bench.py, tools/*) before the
first jit.  ``JAX_CACHE_DIR`` overrides the location.
"""

from __future__ import annotations

import os


def enable_compile_cache(default_dir: str = "/tmp/jax_cache_tpu") -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", default_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
