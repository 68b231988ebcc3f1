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
