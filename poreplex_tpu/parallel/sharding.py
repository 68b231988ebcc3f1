"""Sharded execution of the batched pipeline stages.

Wraps DeviceEngine's fused stage-1 program for a 'batch'-sharded mesh:
inputs are placed with NamedSharding(P('batch')), weights replicate via
closure constants, and XLA partitions every kernel (LSTM scans, Viterbi,
window gathers) along the batch axis with no cross-device communication in
steady state — the collective surface of this workload is only the final
statistics reduction (distributed.py), matching SURVEY.md §5.8.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import BATCH_AXIS, batch_sharding, make_mesh


class ShardedEngine:
    """Data-parallel wrapper around a DeviceEngine for an N-device mesh."""

    def __init__(self, engine, mesh=None):
        self.engine = engine
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = self.mesh.devices.size
        self._sharding = batch_sharding(self.mesh)
        self._jit = jax.jit(
            engine._stage1_impl,
            in_shardings=(self._sharding,) * 4,
            out_shardings=None)

    def run_stage1(self, heads, head_valid, pooled, pooled_len):
        """numpy in -> numpy out; pads the batch to a multiple of the mesh
        size and shards reads across devices."""
        n = heads.shape[0]
        pad = (-n) % self.n_devices
        if pad:
            heads = np.pad(heads, [(0, pad), (0, 0)])
            head_valid = np.pad(head_valid, [(0, pad)])
            pooled = np.pad(pooled, [(0, pad), (0, 0)])
            pooled_len = np.pad(pooled_len, [(0, pad)])

        args = (
            jax.device_put(jnp.asarray(heads, jnp.float32), self._sharding),
            jax.device_put(jnp.asarray(head_valid, bool), self._sharding),
            jax.device_put(jnp.asarray(pooled, jnp.float32), self._sharding),
            jax.device_put(jnp.asarray(pooled_len, jnp.int32),
                           self._sharding),
        )
        with self.mesh:
            out = self._jit(*args)
        return {k: np.asarray(v)[:n] for k, v in out.items()}
