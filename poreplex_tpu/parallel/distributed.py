"""Multi-host coordination.

The reference is single-host only (SURVEY.md §2.3). The TPU-native design:
every host runs its own ingest + writer session over a shard of the input
file list; per-host status/barcode count matrices are reduced with a psum
over the global mesh; host 0 prints the merged final summary (mirroring the
reference's single-process inventory merge, poreplex/io.py:351-371, at pod
scale).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed bootstrap; no-ops on a single process."""
    if num_processes in (None, 1):
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


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


def merge_final_counts(tracker):
    """Reduce a FinalSummaryTracker's sparse count dict across hosts.
    Returns a merged {key: count} dict on every host."""
    if jax.process_count() == 1:
        return dict(tracker.counts)
    from jax.experimental import multihost_utils
    # serialize sparse keys deterministically: gather as object list
    items = sorted(
        ((str(label), -1 if barcode is None else int(barcode), str(status)),
         int(cnt))
        for (label, barcode, status), cnt in tracker.counts.items())
    gathered = multihost_utils.process_allgather(items, tiled=False) \
        if items else []
    merged = {}
    for host_items in (gathered if isinstance(gathered, list) else [items]):
        for (label, barcode, status), cnt in host_items:
            key = (label, None if barcode == -1 else barcode, status)
            merged[key] = merged.get(key, 0) + cnt
    return merged
