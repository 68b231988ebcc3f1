"""Per-stage timing + optional jax.profiler integration.

The reference had no tracing at all (SURVEY.md §5.1 — one dead
show_memory_usage helper). Here every pipeline stage reports wall time into
a process-wide registry; a session can dump the aggregate to the log, and
``trace()`` wraps a block in a jax.profiler trace for TensorBoard when
POREPLEX_TPU_PROFILE_DIR is set.
"""

import contextlib
import os
import threading
import time
from collections import defaultdict


class StageTimer:

    def __init__(self):
        self.lock = threading.Lock()
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self.lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def snapshot(self):
        with self.lock:
            return {name: {'total_s': round(self.totals[name], 4),
                           'calls': self.counts[name],
                           'mean_ms': round(
                               1000 * self.totals[name] /
                               max(1, self.counts[name]), 3)}
                    for name in sorted(self.totals)}

    def report(self, logger):
        for name, row in self.snapshot().items():
            logger.info('stage %-28s total %8.2fs  calls %6d  mean %8.2fms',
                        name, row['total_s'], row['calls'], row['mean_ms'])


GLOBAL_TIMER = StageTimer()


class WireAccounting:
    """Device-utilization + wire accounting (SURVEY.md §5.1 extension):
    per program family, the bytes uploaded/downloaded and the
    await-start -> ready intervals of every launch. Over the tunnel a
    dispatched computation only progresses while something awaits it, so
    the awaited interval IS the device-busy window; the union of all
    intervals over the session wall bounds how busy the chip was and
    where the remaining wall time goes (host vs device vs idle)."""

    def __init__(self):
        self.lock = threading.Lock()
        self.up_bytes = defaultdict(int)
        self.down_bytes = defaultdict(int)
        self.intervals = defaultdict(list)
        self.launches = defaultdict(int)

    def upload(self, family, nbytes):
        with self.lock:
            self.up_bytes[family] += int(nbytes)

    # bound the per-family interval lists for long-running sessions:
    # compacting a list into its disjoint union is LOSSLESS for every
    # number this class reports (busy_s is the union), so production
    # sessions that never call clear() stay O(1) in memory
    MAX_INTERVALS = 4096

    def await_array(self, family, handle):
        """Await + download one device result, recording the busy
        interval and the downloaded bytes. Returns the numpy array."""
        import numpy as np
        t0 = time.perf_counter()
        arr = np.asarray(handle)
        t1 = time.perf_counter()
        with self.lock:
            self.down_bytes[family] += arr.nbytes
            self.launches[family] += 1
            iv = self.intervals[family]
            iv.append((t0, t1))
            if len(iv) > self.MAX_INTERVALS:
                self.intervals[family] = _merge_intervals(iv)
        return arr

    def clear(self):
        with self.lock:
            self.up_bytes.clear()
            self.down_bytes.clear()
            self.intervals.clear()
            self.launches.clear()

    @staticmethod
    def _union_s(intervals):
        total = 0.0
        end = float('-inf')
        for a, b in sorted(intervals):
            if a > end:
                total += b - a
                end = b
            elif b > end:
                total += b - end
                end = b
        return total

    def snapshot(self):
        """Per-family {upload_mb, download_mb, busy_s, launches} plus the
        cross-family interval union as 'device_busy_s' (families overlap
        when multiple programs are in flight, so the union, not the sum,
        bounds chip occupancy)."""
        with self.lock:
            fams = sorted(set(self.up_bytes) | set(self.intervals))
            out = {fam: {
                'upload_mb': round(self.up_bytes[fam] / 1e6, 2),
                'download_mb': round(self.down_bytes[fam] / 1e6, 2),
                'busy_s': round(self._union_s(self.intervals[fam]), 3),
                'launches': self.launches[fam],
            } for fam in fams}
            allv = [iv for fam in fams for iv in self.intervals[fam]]
            out['device_busy_s'] = round(self._union_s(allv), 3)
        return out


def _merge_intervals(intervals):
    """Disjoint union of intervals (sorted merge) — lossless compaction
    for union-based reporting."""
    out = []
    for a, b in sorted(intervals):
        if out and a <= out[-1][1]:
            if b > out[-1][1]:
                out[-1] = (out[-1][0], b)
        else:
            out.append((a, b))
    return out


WIRE = WireAccounting()


@contextlib.contextmanager
def trace(name):
    """jax.profiler trace context when POREPLEX_TPU_PROFILE_DIR is set."""
    profile_dir = os.environ.get('POREPLEX_TPU_PROFILE_DIR')
    if not profile_dir:
        with GLOBAL_TIMER.stage(name):
            yield
        return
    import jax
    with GLOBAL_TIMER.stage(name):
        with jax.profiler.TraceAnnotation(name):
            yield


def start_profiler_server():
    port = os.environ.get('POREPLEX_TPU_PROFILER_PORT')
    if port:
        import jax
        jax.profiler.start_server(int(port))
