"""Device-mesh utilities: the TPU-native replacement for the reference's
Lightning DDP/NCCL stack (trainer/train_refinement.py:347).

Model: a 1-D (or 2-D) jax.sharding.Mesh; batches are sharded over the 'data'
axis, parameters are replicated, and XLA inserts the gradient all-reduce over
ICI during pjit compilation — there is no explicit collective code anywhere
in the trainers. The retrieval database may additionally be sharded over the
same axis (ops/knn.sharded_exact_knn), which is this workload's natural
tensor-parallel analog (SURVEY §2.7).

Multi-host: call jax.distributed.initialize() before get_mesh(); the same
code paths then span hosts with DCN between slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def mesh_for_batch(batch_size: int, axis_name: str = "data") -> Mesh | None:
    """Data-parallel mesh over the largest device count that divides the
    per-host batch (a batch axis sharded over N devices must be divisible by
    N). Returns None when that count is 1 — callers then run single-device.
    The reference's Lightning DDP sized the world to the GPUs and left batch
    divisibility to the user; here the mesh adapts to the batch instead of
    crashing at the first device_put."""
    if jax.process_count() > 1:
        # every process must participate in a global mesh; only divisibility
        # of the GLOBAL batch (process_count x per-host batch) can be checked
        total = len(jax.devices())
        if (batch_size * jax.process_count()) % total != 0:
            raise ValueError(
                f"global batch {batch_size}x{jax.process_count()} processes is "
                f"not divisible by {total} devices; adjust batch_size")
        return get_mesh(None, axis_name)
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n <= 1:
        return None
    if n < len(jax.devices()):
        print(f"[mesh] batch_size {batch_size} not divisible by "
              f"{len(jax.devices())} devices; using a {n}-device mesh")
    return get_mesh(n, axis_name)


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place every array leaf with its leading axis sharded over the mesh.
    Non-array entries (names, counts) pass through untouched."""
    sharding = NamedSharding(mesh, P(axis_name))
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def data_parallel_jit(fn, mesh: Mesh, axis_name: str = "data", donate_argnums=()):
    """jit a step whose inputs carry their shardings (state replicated via
    `replicate`, batch sharded via `shard_batch`); XLA propagates them and
    inserts the gradient all-reduce — no explicit collectives."""
    del mesh, axis_name  # shardings travel on the arguments themselves
    return jax.jit(fn, donate_argnums=donate_argnums)


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host bring-up: call once per host before get_mesh(); afterwards
    jax.devices() spans all hosts and the same pjit code paths run with ICI
    inside a slice and DCN across slices. (The reference's analog was
    Lightning's DDP spawn + NCCL env plumbing, util/arguments.py:10-16.)"""
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def process_local_batch_slice(global_batch_size: int) -> tuple[int, int]:
    """(start, size) of this host's slice of a globally-sharded batch."""
    import jax
    per = global_batch_size // jax.process_count()
    return jax.process_index() * per, per


def make_global_batch(local_batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Multi-host: assemble per-host numpy batches into global jax.Arrays
    sharded over the mesh's data axis (jax.make_array_from_process_local_data).
    Single-host falls back to shard_batch."""
    import jax
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh, axis_name)
    sharding = NamedSharding(mesh, P(axis_name))
    out = {}
    for k, v in local_batch.items():
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
        else:
            out[k] = v
    return out
