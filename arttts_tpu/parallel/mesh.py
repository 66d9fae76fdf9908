"""Mesh/topology management — the framework's "distributed backend".

The reference's distributed layer is NCCL DDP: `mp.spawn` per-GPU processes,
`init_process_group("nccl")`, `DistributedSampler` rank slicing, and explicit
`all_reduce` of losses (`/root/reference/src/train_v1_1_dist.py:60-321`).
TPU-native, all of that collapses into *sharding annotations*: one jitted SPMD
program over a `jax.sharding.Mesh`, with XLA emitting the gradient/metric
all-reduces over ICI. This module owns mesh construction and host->device
batch placement; there is deliberately no hand-written communication code.

Axes:
  data     — batch sharding (DP). The only axis the reference exercises.
  model    — reserved for tensor parallelism (unused at these model sizes,
             SURVEY.md §2.10); kept in the mesh so shardings can adopt it
             without re-plumbing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding.

    Single-process only: the whole global batch must be addressable. For
    multi-host, each process holds only its rows — use
    `assemble_global_batch`."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def assemble_global_batch(mesh: Mesh, local_batch, num_hosts: Optional[int] = None):
    """Stitch per-process row slices into one globally batch-sharded pytree.

    Every process passes its `global_batch/num_hosts` local rows of the SAME
    global batch (the BucketBatcher multi-host contract); JAX places them on
    the process's addressable devices and records the global shape — no data
    ever crosses hosts (`jax.make_array_from_process_local_data`). On a
    single process this degenerates to `shard_batch`.
    """
    num_hosts = num_hosts if num_hosts is not None else jax.process_count()
    if num_hosts <= 1:
        return shard_batch(mesh, local_batch)
    s = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * num_hosts,) + x.shape[1:]
        return jax.make_array_from_process_local_data(s, x, global_shape)

    return jax.tree_util.tree_map(put, local_batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated (params, opt state)."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
