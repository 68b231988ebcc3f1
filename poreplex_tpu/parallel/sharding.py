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
        # compile for where the mesh actually lives (a CPU dry-run mesh on
        # a TPU host must use CPU unroll/kernel settings, and vice versa)
        engine.retarget(self.mesh.devices.flat[0].platform)
        self._sharding = batch_sharding(self.mesh)
        # same u16-packed program as the single-device path so wire format
        # and numerics are identical at any mesh size. shard_map (not bare
        # pjit) so the per-device program is explicit: reads split along
        # 'batch', weights replicated as closure constants, and fused
        # Pallas kernels stay legal inside the sharded region.
        shard_map = getattr(jax, 'shard_map', None)
        if shard_map is not None:
            smapped = shard_map(
                engine._stage1_packed_impl, mesh=self.mesh,
                in_specs=(P(BATCH_AXIS), P(BATCH_AXIS)),
                out_specs=P(BATCH_AXIS), check_vma=False)
        else:
            from jax.experimental.shard_map import shard_map as shard_map_exp
            smapped = shard_map_exp(
                engine._stage1_packed_impl, mesh=self.mesh,
                in_specs=(P(BATCH_AXIS), P(BATCH_AXIS)),
                out_specs=P(BATCH_AXIS), check_rep=False)
        self._jit = jax.jit(smapped)

    def dispatch_stage1(self, packed):
        """Non-blocking sharded dispatch of a pack_stage1 payload: pads the
        batch to a multiple of the mesh size, places shards, and returns
        (handle, n) for collect_stage1."""
        arr, qparams = packed
        n = arr.shape[0]
        pad = (-n) % self.n_devices
        if pad:
            arr = np.pad(arr, [(0, pad), (0, 0)])
            qp = np.pad(qparams, [(0, pad), (0, 0)])
            qp[n:, 1] = 1.0
        else:
            qp = qparams
        args = (jax.device_put(jnp.asarray(arr), self._sharding),
                jax.device_put(jnp.asarray(qp), self._sharding))
        with self.mesh:
            return self._jit(*args), n

    def collect_stage1(self, handle):
        out, n = handle
        return self.engine._unpack_stage1(np.asarray(out)[:n])

    def run_stage1(self, pooled, pooled_len, head_len=None, head_valid=None):
        """numpy in -> numpy out; pads the batch to a multiple of the mesh
        size and shards reads across devices."""
        packed = self.engine.pack_stage1(pooled, pooled_len, head_len,
                                         head_valid)
        return self.collect_stage1(self.dispatch_stage1(packed))
