"""Multi-host coordination.

The reference is single-host only (SURVEY.md §2.3). The TPU-native design:
every host runs its own ingest + writer session over a shard of the input
file list; per-host status/barcode count matrices are reduced with a psum
over the global mesh; host 0 prints the merged final summary (mirroring the
reference's single-process inventory merge, poreplex/io.py:351-371, at pod
scale).
"""

import os
import zlib

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh, preferred_platform


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed bootstrap; no-ops on a single process. On a CPU
    backend (tests, dry runs) the gloo collectives implementation is
    enabled first — without it each process silently sees a 1-process
    world."""
    if num_processes in (None, 1):
        return False
    if preferred_platform() == 'cpu':
        try:
            jax.config.update('jax_cpu_collectives_implementation', 'gloo')
        except Exception:
            pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def initialize_from_config(config):
    """CLI-level bootstrap from the ``num_nodes`` / ``node_rank`` /
    ``coordinator`` config keys (TPU pods auto-detect all three when
    launched through the TPU runtime, in which case plain
    jax.distributed.initialize() suffices)."""
    n = config.get('num_nodes')
    if not n or int(n) <= 1:
        return False
    return initialize(coordinator_address=config.get('coordinator'),
                      num_processes=int(n),
                      process_id=config.get('node_rank'))


def process_info():
    """(process_index, process_count) of the global runtime; (0, 1) when
    jax.distributed was never initialized."""
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def owns_entry(readpath, process_index, process_count):
    """Stable assignment of a (filename, read_id) entry to one host: a
    CRC32 over both components, identical on every host with zero
    coordination — the streaming analogue of shard_file_list for entries
    discovered incrementally (scan + live watch)."""
    if process_count <= 1:
        return True
    key = (readpath[0] + '\0' + readpath[1]).encode()
    return zlib.crc32(key) % process_count == process_index


def shard_file_list(entries, process_index=None, process_count=None):
    """Deterministically assign (filename, read_id) entries to this host:
    round-robin by stable hash order so hosts get balanced work without
    coordination."""
    if process_count is None:
        process_count = jax.process_count()
    if process_index is None:
        process_index = jax.process_index()
    if process_count == 1:
        return list(entries)
    return [e for i, e in enumerate(entries)
            if i % process_count == process_index]


def allreduce_counts(count_matrix, mesh=None):
    """Sum an integer count matrix across all hosts via a psum over the
    global device mesh. count_matrix: numpy int64 [*dims]."""
    if jax.process_count() == 1:
        return np.asarray(count_matrix)
    from jax.experimental import multihost_utils
    summed = multihost_utils.process_allgather(
        jnp.asarray(count_matrix, jnp.int64))
    return np.asarray(summed).sum(axis=0)


# Closed vocabularies of the reference's status lattice / label taxonomy
# (poreplex/io.py:245-260, poreplex/signal_analyzer.py:281-286): count dicts
# are densified onto these axes so the cross-host reduction is one numeric
# allreduce instead of object serialization.
LABEL_VOCAB = ('pass', 'fail', 'artifact')
STATUS_VOCAB = (
    'okay', 'scaler_signal_too_short', 'sequence_too_short',
    'irregular_fast5', 'basecall_table_incomplete', 'adapter_not_detected',
    'not_basecalled', 'scaling_qc_fail', 'disappeared', 'unknown_error',
    'unsplit_read')


def counts_to_matrix(tracker):
    """Densify a FinalSummaryTracker's sparse {(label, barcode, status):
    count} dict into an int64 [label, barcode, status] matrix over the
    canonical vocabularies (barcode axis = tracker.barcode_reporting_order,
    None last)."""
    barcodes = tracker.barcode_reporting_order
    bc_index = {bc: i for i, bc in enumerate(barcodes)}
    unknown = STATUS_VOCAB.index('unknown_error')
    mat = np.zeros((len(LABEL_VOCAB), len(barcodes), len(STATUS_VOCAB)),
                   np.int64)
    for (label, barcode, status), cnt in tracker.counts.items():
        li = LABEL_VOCAB.index(label) if label in LABEL_VOCAB else 1
        bi = bc_index.get(barcode, len(barcodes) - 1)
        si = (STATUS_VOCAB.index(status) if status in STATUS_VOCAB
              else unknown)
        mat[li, bi, si] += cnt
    return mat


def matrix_to_counts(mat, tracker):
    """Inverse of counts_to_matrix: sparse dict of the non-zero cells."""
    barcodes = tracker.barcode_reporting_order
    counts = {}
    for li, bi, si in zip(*np.nonzero(mat)):
        key = (LABEL_VOCAB[li], barcodes[bi], STATUS_VOCAB[si])
        counts[key] = int(mat[li, bi, si])
    return counts


def merge_final_counts(tracker):
    """Reduce a FinalSummaryTracker's count dict across hosts via one dense
    numeric allreduce. Returns a merged {key: count} dict on every host."""
    if jax.process_count() == 1:
        return dict(tracker.counts)
    merged = allreduce_counts(counts_to_matrix(tracker))
    return matrix_to_counts(merged, tracker)
