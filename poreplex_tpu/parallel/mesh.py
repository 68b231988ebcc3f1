"""Device mesh construction.

The workload is embarrassingly data-parallel over reads (models are tiny and
replicated — SURVEY.md §2.3: TP/SP/EP not needed), so the canonical mesh is
1-D over the batch axis. Multi-host pods extend the same axis over all
global devices; ingest stays host-local (see distributed.py).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = 'batch'


def local_devices(platform=None):
    if platform:
        return jax.local_devices(backend=platform)
    return jax.local_devices()


def make_mesh(devices=None, axis_name=BATCH_AXIS):
    """1-D data-parallel mesh. ``devices`` defaults to all addressable
    devices of the default backend."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name=BATCH_AXIS):
    """Shard axis 0 (reads) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(n, m):
    return ((n + m - 1) // m) * m
