"""GSPMD device-mesh utilities — the TPU-native replacement for the
reference's DDP/NCCL stack (train_ddp.py; SURVEY §2.7, §5.8).

Single-program data parallelism: one process per host, a ``Mesh`` over all
devices with a 'data' axis, batches sharded along it with NamedSharding.
Gradient all-reduce is inserted by the XLA partitioner (riding ICI within a
slice, DCN across slices) — there is no DDP wrapper, no SyncBatchNorm
conversion (3D configs use InstanceNorm), and no DistributedSampler padding
bookkeeping (eval volumes are iterated per process index with a host gather).

An optional second 'spatial' axis shards the volume's H axis — the volumetric
analogue of sequence/context parallelism (SURVEY §5.7) for whole-volume work
that exceeds one chip's HBM.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(cfg=None) -> None:
    """Multi-host rendezvous (replaces dist.init_process_group, train_ddp.py:321).

    On single-host runs this is a no-op; on multi-host TPU pods
    ``jax.distributed.initialize()`` picks up the coordinator from the TPU
    environment automatically.
    """
    try:
        if jax.process_count() > 1:
            return  # already initialized by the runtime
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process run


def make_mesh(cfg=None, devices=None) -> Mesh:
    """Build the device mesh from config (mesh_axes/mesh_shape) or defaults."""
    devices = devices if devices is not None else jax.devices()
    axes = tuple(getattr(cfg, "mesh_axes", ["data"])) if cfg else ("data",)
    shape = getattr(cfg, "mesh_shape", None) if cfg else None
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def shard_batch(x, mesh: Mesh):
    """Place a host array on the mesh, sharded along axis 0 ('data')."""
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
