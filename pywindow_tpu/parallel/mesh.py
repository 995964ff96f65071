"""Device-mesh helpers for frame-parallel analysis.

Frames (and molecules within a system) are completely independent — the
reference exploits this with ``multiprocessing.Pool`` over frames
(reference: trajectory.py:553-586); the TPU-native equivalent is a 1-D
``frames`` mesh axis: batches are sharded across devices and each device
vmaps over its shard.  No collectives are needed in the math itself; XLA
inserts the final all-gather of the small per-frame property vectors.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def frame_mesh(devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices, axis name 'frames'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=("frames",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (frame/molecule) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec("frames"))


def replicated(mesh: Mesh) -> NamedSharding:
    """A sharding that replicates an array on every device of *mesh*."""
    return NamedSharding(mesh, PartitionSpec())


def pad_batch_to_devices(n: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= n (shard-evenly padding)."""
    return ((n + n_devices - 1) // n_devices) * n_devices


def host_device_mesh(devices=None, n_hosts: int | None = None) -> Mesh:
    """A ('hosts', 'frames') mesh for multi-host trajectory sharding.

    The outer axis follows process boundaries (DCN), the inner axis the
    per-host devices (ICI).  Frames have no cross-coupling, so batches
    shard over the *flattened* mesh (PartitionSpec(('hosts','frames')))
    and the only cross-host traffic is the trailing gather of property
    vectors.  With a single process this degenerates to
    :func:`frame_mesh` semantics.

    ``n_hosts`` overrides the process count (single-process testing can
    fold a virtual device pool into a fake hosts x frames grid).
    """
    if devices is None:
        devices = jax.devices()
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    per_host = len(devices) // n_hosts
    grid = np.asarray(devices)[: n_hosts * per_host].reshape(
        n_hosts, per_host
    )
    return Mesh(grid, axis_names=("hosts", "frames"))


def host_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading axis over both mesh axes (hosts x frames)."""
    return NamedSharding(mesh, PartitionSpec(("hosts", "frames")))
