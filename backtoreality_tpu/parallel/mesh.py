"""Mesh construction and data-parallel sharding.

The TPU-native equivalent of the reference's parallelism stack
(SURVEY.md §2.5): nn.DataParallel / NCCL DDP + DistributedSampler
become a `jax.sharding.Mesh` with a 'data' axis; the train step is
jitted with the batch sharded over 'data' and the state replicated.
XLA inserts the gradient all-reduce (psum over ICI) automatically, and
batch-norm statistics are computed over the *global* batch — the
built-in equivalent of SyncBatchNorm (`detector.py:124-125`).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`;
per-host input pipelines shard the scan list by `jax.process_index()`
(see `process_shard_info`), mirroring DistributedSampler.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis_name: str = "data"
              ) -> Mesh:
    """1-D data-parallel mesh over all (or the first N) devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully-replicated on the mesh. Multi-process:
    every process must hold the same values (deterministic init from a
    shared seed / restored checkpoint — true for the drivers)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            jax.device_get(tree), mesh, P())
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch dict with the leading dim sharded over
    `axis_name`. Single-process: the dict is the global batch.
    Multi-process: each process passes its LOCAL batch (its loader
    shard) and the global batch is their concatenation along the
    leading dim — the DistributedSampler contract."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            batch, mesh, P(axis_name))
    return jax.device_put(batch, NamedSharding(mesh, P(axis_name)))


def local_rows(x) -> np.ndarray:
    """This process's rows of a batch-sharded global array, as numpy
    (device order == local batch order). For fully-replicated or
    single-process arrays this is just the whole array."""
    if jax.process_count() == 1 or x.is_fully_replicated:
        return np.asarray(jax.device_get(x))
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def local_rows_tree(tree):
    """`local_rows` over a pytree. Single-process: ONE batched
    `jax.device_get` of the whole tree (a per-leaf loop costs one
    30-80 ms tunnel round-trip per leaf on remote TPUs); multi-process:
    per-leaf shard reassembly."""
    if jax.process_count() == 1:
        host = jax.device_get(tree)
        return jax.tree.map(np.asarray, host)
    return jax.tree.map(local_rows, tree)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_shard_info() -> tuple[int, int]:
    """(num_shards, shard_index) for per-host input pipelines."""
    return jax.process_count(), jax.process_index()
