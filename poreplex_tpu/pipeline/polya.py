"""Poly(A) dwell-time measurement: host control flow driving batched device
kernels.

Faithful re-orchestration of the reference's recursive per-read analyzer
(poreplex/polya.py:30-187) as wavefront rounds over a whole batch: every
active read contributes a signal window; event detection runs as ONE
batched device call (ops.event_detection); the interval DP runs as batched
device calls (ops.polya_dp); and the bounded extension/recalibration
decisions advance each read's state machine on the host. Numeric semantics
(window arithmetic, integer truncation, spike bookkeeping, stdv QC,
shifted-signal recalibration) match the reference exactly.
"""

import numpy as np
import jax.numpy as jnp
from scipy.signal import medfilt

from ..ops import event_detection as ed_ops
from ..ops import polya_dp as dp_ops
from ..utils.profiling import trace

# compiled-shape keys already seen by ed/dp dispatches in this process;
# first-time shapes are timed separately so steady-state stage times are
# distinguishable from XLA compilation
_SEEN_SHAPES = set()

_BUCKETS = (2048, 4096, 8192, 16384, 32768, 65536, 131072)


def _bucket_len(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + _BUCKETS[-1] - 1) // _BUCKETS[-1]) * _BUCKETS[-1]


class _Task:
    __slots__ = ('read', 'rough_begin', 'rough_end', 'orig_end_none',
                 'polya_range', 'depth', 'events', 'is_polya', 'signal',
                 'insp_begin', 'insp_end', 'full_length', 'adapter_end')

    def __init__(self, read, rough_begin, rough_end, polya_range, depth):
        self.read = read
        self.rough_begin = rough_begin
        self.rough_end = rough_end
        self.orig_end_none = rough_end is None
        self.polya_range = polya_range
        self.depth = depth


class PolyaAnalyzer:

    CONFIG_SLOTS = [
        'refinement_expansion', 'event_detection', 'polya_stdv_max',
        'polya_stdv_range', 'spike_tolerance', 'spike_weight',
        'openend_expansion', 'recalibrate_shifted_signal', 'polya_mean_dist',
        'polya_mean_z_cutoff', 'polya_mean_trigger_recalibration',
        'maximum_openend_extension', 'median_pre_filter',
    ]

    def __init__(self, config, sharding=None, n_devices=1, use_pallas=False,
                 batch_rows=128):
        for name in self.CONFIG_SLOTS:
            setattr(self, name, config[name])
        # batch-sharded kernel placement on a multi-chip mesh (pass-through
        # single-device otherwise); see parallel.sharding.shard_batch_arrays
        self.sharding = sharding
        self.n_devices = n_devices
        # fused TPU peak-detector kernel (ops/pallas_event_detection)
        self.use_pallas = use_pallas
        # device dispatches always carry this many rows: task-count changes
        # between batches/rounds must not trigger XLA recompiles (only the
        # window-length bucket may vary the compiled shape)
        self.batch_rows = max(int(batch_rows), n_devices)

        mean_loc, mean_scale = config['polya_mean_dist']
        self.polya_mean_cutoff = (
            mean_loc - mean_scale * config['polya_mean_z_cutoff'],
            mean_loc + mean_scale * config['polya_mean_z_cutoff'])
        # (poreplex/polya.py:48) trigger is in units of the dist's sigma
        self.polya_mean_trigger_recalibration = (
            config['polya_mean_trigger_recalibration'] *
            config['polya_mean_dist'][1])

    # ------------------------------------------------------------------
    def process_batch(self, items, stride):
        """items: list of (read, rough_range) where rough_range is
        (begin, end_or_None) in pooled-frame coordinates and ``read`` has
        .scaled_raw (f32 scaled pA signal) and .sampling_rate."""
        tasks = [_Task(read, rng[0], rng[1], None, 0)
                 for read, rng in items]
        rounds = 0
        while tasks and rounds <= self.maximum_openend_extension + 1:
            tasks = self._run_round(tasks, stride)
            rounds += 1

    # ------------------------------------------------------------------
    def _build_window(self, task, stride):
        raw = task.read.scaled_raw
        meu = self.openend_expansion // stride
        rough_begin, rough_end = task.rough_begin, task.rough_end
        if rough_end is None or rough_end - rough_begin < meu:
            rough_end = rough_begin + meu
        task.rough_end = rough_end

        insp_begin = max(0, rough_begin * stride - self.refinement_expansion)
        insp_end = min(len(raw),
                       (rough_end + 1) * stride + self.refinement_expansion)
        task.insp_begin, task.insp_end = insp_begin, insp_end
        task.full_length = len(raw)
        task.adapter_end = task.rough_begin * stride - insp_begin
        sig = raw[insp_begin:insp_end]
        if self.median_pre_filter > 1:
            with trace('C:polya/medfilt'):
                sig = medfilt(sig, self.median_pre_filter)
        task.signal = np.asarray(sig, np.float32)

    def _detect_events_batched(self, tasks):
        """Bucketed batched device event detection over task windows.
        Every dispatch carries exactly ``batch_rows`` rows (groups larger
        than that are chunked), so the only compiled-shape axis is the
        window-length bucket; all chunks are dispatched before any result
        is awaited, overlapping uploads with device compute."""
        ed = self.event_detection
        by_bucket = {}
        for t in tasks:
            by_bucket.setdefault(_bucket_len(len(t.signal)), []).append(t)
        from ..parallel.sharding import shard_batch_arrays
        rows = self.batch_rows
        launches = []
        with trace('C:polya/ed_dispatch'):
            for blen, group in sorted(by_bucket.items()):
                for lo in range(0, len(group), rows):
                    chunk = group[lo:lo + rows]
                    x = np.zeros((rows, blen), np.float32)
                    lens = np.zeros(rows, np.int32)
                    for i, t in enumerate(chunk):
                        x[i, :len(t.signal)] = t.signal
                        lens[i] = len(t.signal)
                    x, lens = shard_batch_arrays(self.sharding,
                                                 self.n_devices, x, lens)
                    out = ed_ops.detect_events(
                        x, lens,
                        window_length1=ed['window_length1'],
                        window_length2=ed['window_length2'],
                        threshold1=float(ed['threshold1']),
                        threshold2=float(ed['threshold2']),
                        peak_height=float(ed['peak_height']),
                        use_pallas=self.use_pallas)
                    launches.append((chunk, blen, out))
        for chunk, blen, out in launches:
            key = ('ed', rows, blen)
            stage = ('C:polya/ed_await' if key in _SEEN_SHAPES
                     else 'C:polya/ed_compile')
            _SEEN_SHAPES.add(key)
            with trace(stage):
                starts = np.asarray(out['start'])
                lengths = np.asarray(out['length'])
                means = np.asarray(out['mean'])
                stdvs = np.asarray(out['stdv'])
                nev = np.asarray(out['n_events'])
            for i, t in enumerate(chunk):
                n = int(nev[i])
                t.events = {
                    'start': starts[i, :n].astype(np.int64),
                    'length': lengths[i, :n],
                    'mean': means[i, :n],
                    'stdv': stdvs[i, :n],
                }
                t.events['end'] = (t.events['start'] +
                                   t.events['length']).astype(np.int64)

    def _dp_wave(self, tasks):
        """Run the interval DP for all tasks in padded fixed-row device
        calls (compiled shape varies only with the event-count bucket).
        Returns list of (start, end) or None per task."""
        if not tasks:
            return []
        results = []
        rows = self.batch_rows
        from ..parallel.sharding import shard_batch_arrays
        for lo in range(0, len(tasks), rows):
            chunk = tasks[lo:lo + rows]
            kmax = max(64, max(len(t.is_polya) for t in chunk))
            kmax = 1 << (kmax - 1).bit_length()
            ip = np.zeros((rows, kmax), bool)
            ln = np.zeros((rows, kmax), np.float32)
            n = np.zeros(rows, np.int32)
            for i, t in enumerate(chunk):
                k = len(t.is_polya)
                ip[i, :k] = t.is_polya
                ln[i, :k] = t.events['length']
                n[i] = k
            ip, ln, n = shard_batch_arrays(self.sharding, self.n_devices,
                                           ip, ln, n)
            s, e, v = dp_ops.find_best_polya_interval(
                ip, ln, n,
                spike_weight=float(self.spike_weight),
                spike_tolerance=int(self.spike_tolerance))
            key = ('dp', rows, kmax)
            stage = ('C:polya/dp_await' if key in _SEEN_SHAPES
                     else 'C:polya/dp_compile')
            _SEEN_SHAPES.add(key)
            with trace(stage):
                s, e, v = np.asarray(s), np.asarray(e), np.asarray(v)
            results.extend(
                (int(s[i]), int(e[i])) if v[i] > 0 else None
                for i in range(len(chunk)))
        return results

    # ------------------------------------------------------------------
    def _run_round(self, tasks, stride):
        with trace('C:polya/window_build'):
            for t in tasks:
                self._build_window(t, stride)
        self._detect_events_batched(tasks)
        for t in tasks:
            rng = t.polya_range or self.polya_mean_cutoff
            m = t.events['mean']
            t.is_polya = (m >= rng[0]) & (m <= rng[1])

        next_tasks = []
        call_tasks = [t for t in tasks if not t.orig_end_none]
        recal_tasks = [t for t in tasks if t.orig_end_none]

        intervals = self._dp_wave(call_tasks)
        for t, interval in zip(call_tasks, intervals):
            outcome = self._call_polya(t, interval, stride)
            if outcome == 'extend':
                next_tasks.append(self._extension_task(t, stride))
            elif outcome == 'recalibrate':
                recal_tasks.append(t)

        # recalibration pass: derive a shifted poly(A) level from anchor
        # events, re-mark, and re-run the DP (poreplex/polya.py:127-148)
        ready = [t for t in recal_tasks if self._recalibrate(t)]
        intervals = self._dp_wave(ready)
        for t, interval in zip(ready, intervals):
            outcome = self._call_polya(t, interval, stride)
            if outcome == 'extend':
                next_tasks.append(self._extension_task(t, stride))
            # a second 'recalibrate' outcome cannot happen: polya_range is set

        return next_tasks

    def _extension_task(self, t, stride):
        nt = _Task(t.read, t.rough_begin,
                   t.rough_end + self.openend_expansion // stride,
                   t.polya_range, t.depth + 1)
        nt.orig_end_none = False
        return nt

    # ------------------------------------------------------------------
    def _call_polya(self, t, interval, stride):
        """Returns 'done', 'extend' or 'recalibrate'
        (logic of poreplex/polya.py:75-125)."""
        ev = t.events
        n = len(ev['mean'])
        if interval is not None:
            s, e = interval
            sel = slice(s, e + 1)
            has_interval = True
        else:
            has_interval = False

        # right-open extension: interval touches the last event and the
        # window does not reach the end of the signal
        if (has_interval and e == n - 1 and t.insp_end < t.full_length and
                t.depth < self.maximum_openend_extension):
            return 'extend'

        def is_shifted():
            w = ev['length'][sel]
            mean_level = float((ev['mean'][sel] * w).sum() / w.sum())
            return (abs(mean_level - self.polya_mean_dist[0]) >
                    self.polya_mean_trigger_recalibration)

        if not has_interval or (t.polya_range is None and is_shifted()):
            return 'recalibrate' if t.polya_range is None else 'done'

        # stdv QC on the longest event in the interval
        rel_longest = int(np.argmax(ev['length'][sel]))
        li = s + rel_longest
        length = int(ev['length'][li])
        b = int(ev['start'][li] + length * self.polya_stdv_range[0])
        fin = int(ev['start'][li] + length * self.polya_stdv_range[1])
        if fin - b > 2:
            longest_stdv = float(t.signal[b:fin].std())
        else:
            longest_stdv = float('nan')

        if longest_stdv < self.polya_stdv_max:
            polya_begin = int(ev['start'][s]) + t.insp_begin
            polya_end = int(ev['start'][e] + ev['length'][e]) + t.insp_begin
            dwell = int(ev['length'][sel][t.is_polya[sel]].sum())
            spikes = []
            for spk in np.where(~t.is_polya[sel])[0]:
                lo = spk - 1
                if lo < 0:
                    neighborhood = ()      # pandas iloc[-1:2] -> empty
                else:
                    # neighbors truncate at the interval edges, matching the
                    # iloc slice over the interval-sliced frame
                    hi = min(s + spk + 2, e + 1)
                    neighborhood = tuple(
                        float(v) for v in ev['mean'][s + lo:hi])
                spikes.append((float(ev['length'][s + spk]),) + neighborhood)
            t.read.set_polya_tail({
                'begin': polya_begin,
                'end': polya_end,
                'dwell_time': dwell / t.read.sampling_rate,
                'spikes': spikes,
            })
            return 'done'
        elif t.polya_range is None:
            return 'recalibrate'
        return 'done'

    # ------------------------------------------------------------------
    def _recalibrate(self, t):
        """Anchor-event recalibration (poreplex/polya.py:127-148).
        Returns True when the task should proceed to a DP re-run."""
        cfg = self.recalibrate_shifted_signal
        ev = t.events
        sel = ((ev['start'] <= t.adapter_end + cfg['max_dist_from_adapter']) &
               (ev['end'] > t.adapter_end) &
               (ev['stdv'] < cfg['max_stdv']))
        if not sel.any():
            return False
        w = ev['length'][sel]
        polya_mean = float((ev['mean'][sel] * w).sum() / w.sum())
        zr = self.polya_mean_dist[1] * self.polya_mean_z_cutoff
        t.polya_range = (polya_mean - zr, polya_mean + zr)
        t.is_polya = ((ev['mean'] >= t.polya_range[0]) &
                      (ev['mean'] <= t.polya_range[1]))
        return float(ev['length'][t.is_polya].sum()) >= cfg['min_length']
