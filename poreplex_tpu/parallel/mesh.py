"""Device mesh construction.

The workload is embarrassingly data-parallel over reads (models are tiny and
replicated — SURVEY.md §2.3: TP/SP/EP not needed), so the canonical mesh is
1-D over the batch axis. Multi-host pods extend the same axis over all
global devices; ingest stays host-local (see distributed.py).
"""

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = 'batch'


def local_devices(platform=None):
    if platform:
        return jax.local_devices(backend=platform)
    return jax.local_devices()


def preferred_platform():
    """Platform the production programs should run on. Checked in order:
    JAX_PLATFORMS (unless a TPU plugin hijacks it), the pinned default
    device (tests/--cpu pin CPU), then the first visible device."""
    env = os.environ.get('JAX_PLATFORMS', '')
    if env and 'tpu' not in env and 'axon' not in env:
        return env.split(',')[0]
    d = jax.config.jax_default_device
    if d is not None:
        return d.platform
    return jax.devices()[0].platform


def select_devices(config=None):
    """Devices for the production data-parallel mesh: all LOCAL devices of
    the preferred platform, optionally capped by the ``mesh_shape`` config
    knob (int N => first N devices). Host-local on purpose: in a
    multi-host world each host ingests and analyzes its own slice of the
    reads (SURVEY.md §5.8), so batch data differs per host and the
    compute mesh must not span processes — only the final statistics
    reduction is global (distributed.py)."""
    try:
        devices = jax.local_devices(backend=preferred_platform())
    except RuntimeError:
        devices = jax.local_devices()
    n = (config or {}).get('mesh_shape')
    if n:
        devices = devices[:int(n)]
    return devices


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
