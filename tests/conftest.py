"""Test env: force an 8-device virtual CPU mesh before jax is imported.

This is the TPU-native analogue of "no real cluster needed" (SURVEY.md §4):
all sharding/collective tests run on a host-platform device mesh.
"""
import os
import sys

# NOTE: the environment may pre-set JAX_PLATFORMS (e.g. to a remote TPU
# platform); tests must run on the local virtual CPU mesh, so override it.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # belt and braces vs env overrides

# persistent compilation cache: repeated test runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The PyTorch reference implementation, used as the golden oracle for parity
# tests (never imported by the framework itself).
REFERENCE_ROOT = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
