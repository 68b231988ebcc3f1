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


def shard_batch_arrays(sharding, n_devices, *arrays):
    """Prepare [B, ...] kernel inputs for a batch-sharded mesh: zero-pad the
    leading axis to a multiple of ``n_devices`` and place each array with
    the batch NamedSharding, so jit compiles the kernel SPMD with reads
    split across devices (padded lanes carry zero lengths and are dropped
    by the caller). With no sharding this is a pass-through."""
    if sharding is None or n_devices <= 1:
        return [jnp.asarray(a) for a in arrays]
    n = arrays[0].shape[0]
    pad = (-n) % n_devices
    placed = []
    for a in arrays:
        if pad:
            a = np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        placed.append(jax.device_put(jnp.asarray(a), sharding))
    return placed


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
        self._jit = jax.jit(self._shard_mapped(
            engine._stage1_packed_impl, nargs=2))

        # token-packed transport, sharded: every device gets its own flat
        # frame stream (reads round-robined across devices), stacked on a
        # leading device axis that shard_map splits. Rows stay implicitly
        # addressed: read k of a dispatch lives at device k % D, row k // D.
        D = self.n_devices
        self.rows_per_dev = -(-engine.batch_rows // D)
        self.flat_size_dev = max(engine.wire_frames + 1,
                                 -(-engine.flat_size // D))

        def flat_per_device(flat, aux):
            out = engine._stage1_flat_impl(flat[0], aux[0])
            return out[None]

        self._jit_flat = jax.jit(self._shard_mapped(flat_per_device,
                                                    nargs=2))

    def _shard_mapped(self, fn, nargs):
        specs = (P(BATCH_AXIS),) * nargs
        shard_map = getattr(jax, 'shard_map', None)
        if shard_map is not None:
            return shard_map(fn, mesh=self.mesh, in_specs=specs,
                             out_specs=P(BATCH_AXIS), check_vma=False)
        from jax.experimental.shard_map import shard_map as shard_map_exp
        return shard_map_exp(fn, mesh=self.mesh, in_specs=specs,
                             out_specs=P(BATCH_AXIS), check_rep=False)

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

    # ------------------------------------------------------------------
    # Token-packed flat transport (sharded): drop-in for DeviceEngine's
    # pack_stage1_flat / dispatch_stage1_flat / collect_stage1 triple, so
    # BatchAnalyzer drives a mesh the same way it drives one chip.

    def pack_stage1_flat(self, reads):
        """reads: list of (pooled_f32_1d, pooled_len, head_len). Assigns
        read k to device k % D and packs each device's frames into its own
        flat stream. Returns (wire, n_packed); assignment is strict
        round-robin, so packing stops at the first read that no longer
        fits its home device (keeping the k <-> (device, row) addressing
        implicit)."""
        eng = self.engine
        D, R = self.n_devices, self.rows_per_dev
        cap = self.flat_size_dev
        aux = np.zeros((D, R, 6), np.float32)
        aux[:, :, 5] = 1.0
        used = np.zeros(D, np.int64)
        chunks = [[] for _ in range(D)]
        n = 0
        for pooled, plen, hlen in reads[:D * R]:
            d = n % D
            stored = min(len(pooled), eng.wire_frames)
            if used[d] + stored > cap:
                break
            aux[d, n // D, :4] = (used[d], min(plen, stored),
                                  min(hlen, stored), 1)
            chunks[d].append(pooled[:stored])
            used[d] += stored
            n += 1

        dtype, qmax = ((np.uint8, 254) if eng.wire_fast
                       else (np.uint16, 65535))
        flat = np.zeros((D, cap), dtype)
        for d in range(D):
            eng._quantize_stream(chunks[d], flat[d], aux[d, :, 4:], qmax)
        return (flat, aux), n

    def dispatch_stage1_flat(self, wire):
        flat, aux = wire
        import jax.numpy as jnp
        args = (jax.device_put(jnp.asarray(flat), self._sharding),
                jax.device_put(jnp.asarray(aux), self._sharding))
        with self.mesh:
            return self._jit_flat(*args)

    def collect_stage1_flat(self, handle):
        """Await a dispatch_stage1_flat handle and restore read order:
        output row (d, r) is read r * D + d."""
        arr = np.asarray(handle)                       # [D, R, C]
        rows = arr.transpose(1, 0, 2).reshape(-1, arr.shape[2])
        return self.engine._unpack_stage1(rows)

    def warmup(self):
        """Compile the sharded token-packed stage-1 program up front
        (mirrors DeviceEngine.warmup)."""
        D, R = self.n_devices, self.rows_per_dev
        dtype = np.uint8 if self.engine.wire_fast else np.uint16
        aux = np.zeros((D, R, 6), np.float32)
        aux[:, :, 5] = 1.0
        wire = (np.zeros((D, self.flat_size_dev), dtype), aux)
        self.collect_stage1_flat(self.dispatch_stage1_flat(wire))
