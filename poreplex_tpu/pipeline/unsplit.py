"""Pseudo-fusion ("unsplit read") detection.

Re-orchestration of the reference's windowed second-HMM scan
(poreplex/signal_analyzer.py:366-443): sliding windows over post-adapter
basecalled events are gathered across ALL reads of a batch, decoded with
the unsplit HMM in one padded device Viterbi call, and the leader->adapter
run analysis + duration cutoffs + high-quality-base counting run on the
host with identical semantics.
"""

import numpy as np

from ..utils.intervals import union_intervals


class UnsplitReadDetector:

    def __init__(self, config, unsplit_model, sharding=None, n_devices=1,
                 batch_rows=128):
        self.config = config['unsplit_read_detection']
        self.model = unsplit_model
        # batch-sharded Viterbi placement on a multi-chip mesh
        self.sharding = sharding
        self.n_devices = n_devices
        # fixed-row device dispatches: window-count changes between batches
        # must not trigger XLA recompiles (only the event-count bucket may)
        self.batch_rows = max(int(batch_rows), n_devices)
        names = unsplit_model.state_names
        self.leaderish = {unsplit_model.state_index[n]
                          for n in ('adapter', 'leader-high', 'leader-low')
                          if n in unsplit_model.state_index}
        self.adapter_idx = unsplit_model.state_index['adapter']

    # ------------------------------------------------------------------
    def collect_windows(self, read, segments, elspan):
        """Build the sliding event windows for one read
        (poreplex/signal_analyzer.py:369-387). Returns list of
        (index_array,) windows or None when not applicable."""
        try:
            payload_start = (segments['adapter'][1] + 1) * elspan
        except (KeyError, IndexError):
            return None, None   # adapter-only read

        config = self.config
        rate = read.sampling_rate
        window_size = int(config['window_size'] * rate)
        window_step = int(config['window_step'] * rate)

        ev = read.events
        starts = ev['start'].to_numpy().astype(np.int64)
        ends = ev['end'].to_numpy().astype(np.int64)
        last_end = int(ends[-1])

        windows = []
        for left in range(payload_start, last_end, window_step):
            sel = np.nonzero((starts >= left) &
                             (starts <= left + window_size))[0]
            if len(sel) < 1:
                break
            windows.append(sel)
        return payload_start, windows

    # event-count buckets for the padded Viterbi shape: coarse on purpose —
    # the decode cost is tiny next to a compile, so three compiled shapes
    # cover everything (larger counts snap to the next power of two)
    EVENT_BUCKETS = (16, 128, 1024)

    @classmethod
    def _event_bucket(cls, n):
        for b in cls.EVENT_BUCKETS:
            if n <= b:
                return b
        return 1 << (n - 1).bit_length()

    # ------------------------------------------------------------------
    def decode_windows_batched(self, jobs):
        """jobs: list of (read, window_index_array). Runs padded fixed-row
        device Viterbi calls over all windows (compiled shape varies only
        with the event-count bucket). All chunks are dispatched before any
        path array is awaited, and only the path crosses back (one
        transfer per chunk); returns list of state paths."""
        if not jobs:
            return []
        from ..parallel.sharding import shard_batch_arrays
        rows = self.batch_rows
        launches = []
        for lo in range(0, len(jobs), rows):
            chunk = jobs[lo:lo + rows]
            emax = self._event_bucket(max(len(sel) for _, sel in chunk))
            x = np.zeros((rows, emax), np.float32)
            lens = np.zeros(rows, np.int32)
            for i, (read, sel) in enumerate(chunk):
                vals = read.events['scaled_mean'].to_numpy()[sel]
                x[i, :len(sel)] = vals
                lens[i] = len(sel)
            xs, ls = shard_batch_arrays(self.sharding, self.n_devices,
                                        x, lens)
            launches.append((len(chunk), lens, self.model._decode_paths(xs, ls)))
        paths = []
        for used, lens, handle in launches:
            path = np.asarray(handle)
            paths.extend(path[i, :lens[i]] for i in range(used))
        return paths

    def warmup(self):
        """Compile the padded Viterbi for every event bucket up front."""
        from ..parallel.sharding import shard_batch_arrays
        for emax in self.EVENT_BUCKETS:
            xs, ls = shard_batch_arrays(
                self.sharding, self.n_devices,
                np.zeros((self.batch_rows, emax), np.float32),
                np.zeros(self.batch_rows, np.int32))
            np.asarray(self.model._decode_paths(xs, ls))

    # ------------------------------------------------------------------
    def analyze_read(self, read, payload_start, windows, paths):
        """Post-Viterbi analysis for one read; returns True when the read is
        an unsplit artifact (poreplex/signal_analyzer.py:388-443)."""
        config = self.config
        rate = read.sampling_rate
        _ = lambda name: int(config[name] * rate)
        strict_duration = _('strict_duration')
        duration_cutoffs = [
            (_('loosen_full_length'), _('loosen_dna_length')),
            (_('strict_full_length'), _('strict_dna_length'))]

        ev = read.events
        starts = ev['start'].to_numpy().astype(np.int64)
        ends = ev['end'].to_numpy().astype(np.int64)

        excessive_adapters = []
        for sel, path in zip(windows, paths):
            leader_start = None
            for first, last, state in _iter_runs(path):
                if state not in self.leaderish:
                    leader_start = None
                    continue
                if leader_start is None:
                    leader_start = first
                if state != self.adapter_idx:
                    continue

                adapter_end = int(ends[sel[last]])
                leader_start_in_read = int(starts[sel[leader_start]])
                total_duration = adapter_end - leader_start_in_read
                adapter_duration = adapter_end - starts[sel[first]]
                total_cutoff, adapter_cutoff = duration_cutoffs[
                    (leader_start_in_read - payload_start) <= strict_duration]

                if (total_duration >= total_cutoff and
                        adapter_duration >= adapter_cutoff):
                    excessive_adapters.append(
                        [leader_start_in_read, 1 + adapter_end])
                leader_start = None

        if not excessive_adapters:
            return False

        adapter_intervals = (
            [[0, payload_start]] + union_intervals(excessive_adapters) +
            [[np.inf, np.inf]])
        basequality_cutoff = config['basecount_quality_limit']

        def count_high_quality_reads(sel):
            if len(sel) == 0:
                return 0
            tbl = ev.iloc[sel]
            return int((tbl.groupby('pos')['p_model_state'].max() >
                        basequality_cutoff).sum())

        subread_lengths = []
        for (_l, left), (right, _r) in zip(adapter_intervals[0:],
                                           adapter_intervals[1:]):
            sel = np.nonzero((starts >= left) & (starts <= right))[0]
            subread_lengths.append(count_high_quality_reads(sel))

        subread_hq_length_total = sum(subread_lengths[1:])
        return (subread_hq_length_total > config['subread_basecount_limit'] or
                (subread_hq_length_total + 1) / (subread_lengths[0] + 1) >
                config['subread_baseratio_limit'])


def _iter_runs(path):
    """Yield (first, last, state) for each contiguous run."""
    t = 0
    n = len(path)
    while t < n:
        s = path[t]
        first = t
        while t + 1 < n and path[t + 1] == s:
            t += 1
        yield first, t, int(s)
        t += 1
