"""Poly(A) dwell-time measurement: host control flow driving batched device
kernels.

Faithful re-orchestration of the reference's recursive per-read analyzer
(poreplex/polya.py:30-187) as wavefront rounds over a whole batch: every
active read contributes a signal window; event detection + tail marking +
the interval DP run fused as ONE batched device call per window bucket
(ops.polya_round — one upload, one launch, one packed download), and the
bounded extension/recalibration decisions advance each read's state machine
on the host (a recalibrated range triggers a standalone DP re-run,
ops.polya_dp). The median pre-filter runs vectorized over the whole batch.
Numeric semantics (window arithmetic, integer truncation, spike
bookkeeping, stdv QC, shifted-signal recalibration) match the reference
exactly.
"""

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from ..ops import polya_dp as dp_ops
from ..ops import polya_round as round_ops
from ..utils.profiling import trace

# compiled-shape keys already seen by round/dp dispatches in this process;
# first-time shapes are timed separately so steady-state stage times are
# distinguishable from XLA compilation
_SEEN_SHAPES = set()

_BUCKETS = (2048, 4096, 8192, 16384, 32768, 65536, 131072)

# cap on rows * window elements per dispatch: bounds both the padded wire
# upload (4 MB f32) and the peak-detector scan length per launch
_MAX_DISPATCH_ELEMS = 1 << 20


def _bucket_len(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + _BUCKETS[-1] - 1) // _BUCKETS[-1]) * _BUCKETS[-1]


class _Task:
    __slots__ = ('read', 'rough_begin', 'rough_end', 'orig_end_none',
                 'polya_range', 'depth', 'events', 'is_polya', 'signal',
                 'insp_begin', 'insp_end', 'full_length', 'adapter_end',
                 'fused_interval')

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
        # device dispatches carry a fixed row count per window bucket:
        # task-count changes between batches/rounds must not trigger XLA
        # recompiles (only the window-length bucket may vary the compiled
        # shape); long-window buckets get proportionally fewer rows so a
        # single dispatch stays bounded (_MAX_DISPATCH_ELEMS)
        self.batch_rows = max(int(batch_rows), n_devices)
        self.max_peaks = 1023

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
        task.signal = np.asarray(sig, np.float32)

    def _rows_for(self, blen):
        """Fixed row count of a device dispatch in the ``blen`` window
        bucket (one compiled shape per bucket)."""
        rows = min(self.batch_rows, max(8, _MAX_DISPATCH_ELEMS // blen))
        # sharded kernels split rows across devices evenly
        return -(-rows // self.n_devices) * self.n_devices

    def _medfilt_tasks(self, tasks):
        """Vectorized zero-padded median pre-filter over all task windows
        (exact scipy.signal.medfilt semantics — the per-read scipy calls
        this replaces were pure host serial time). Tasks are grouped by
        window bucket and chunked so the scratch stays small."""
        k = self.median_pre_filter
        h = k // 2
        groups = {}
        for t in tasks:
            groups.setdefault(_bucket_len(len(t.signal)), []).append(t)
        for blen, group in groups.items():
            step = max(1, _MAX_DISPATCH_ELEMS // blen)
            for lo in range(0, len(group), step):
                chunk = group[lo:lo + step]
                buf = np.zeros((len(chunk), blen + 2 * h), np.float32)
                for i, t in enumerate(chunk):
                    buf[i, h:h + len(t.signal)] = t.signal
                med = np.median(sliding_window_view(buf, k, axis=1), axis=2)
                for i, t in enumerate(chunk):
                    t.signal = np.ascontiguousarray(med[i, :len(t.signal)],
                                                    np.float32)

    def _fused_round_batched(self, tasks):
        """One fused device call per (window bucket, row chunk): event
        detection + per-read tail marking + interval DP, downloaded as one
        packed array (ops.polya_round). All chunks are dispatched before
        any result is awaited, overlapping uploads with device compute.
        Fills t.events, t.is_polya and t.fused_interval."""
        ed = self.event_detection
        by_bucket = {}
        for t in tasks:
            by_bucket.setdefault(_bucket_len(len(t.signal)), []).append(t)
        from ..parallel.sharding import shard_batch_arrays
        launches = []
        with trace('C:polya/dispatch'):
            for blen, group in sorted(by_bucket.items()):
                rows = self._rows_for(blen)
                for lo in range(0, len(group), rows):
                    chunk = group[lo:lo + rows]
                    x = np.zeros((rows, blen), np.float32)
                    lens = np.zeros(rows, np.int32)
                    rlo = np.zeros(rows, np.float32)
                    rhi = np.zeros(rows, np.float32)
                    for i, t in enumerate(chunk):
                        x[i, :len(t.signal)] = t.signal
                        lens[i] = len(t.signal)
                        rng = t.polya_range or self.polya_mean_cutoff
                        rlo[i], rhi[i] = rng
                    x, lens, rlo, rhi = shard_batch_arrays(
                        self.sharding, self.n_devices, x, lens, rlo, rhi)
                    out = round_ops.polya_round(
                        x, lens, rlo, rhi,
                        window_length1=ed['window_length1'],
                        window_length2=ed['window_length2'],
                        threshold1=float(ed['threshold1']),
                        threshold2=float(ed['threshold2']),
                        peak_height=float(ed['peak_height']),
                        max_peaks=self.max_peaks,
                        spike_weight=float(self.spike_weight),
                        spike_tolerance=int(self.spike_tolerance),
                        use_pallas=self.use_pallas)
                    launches.append((chunk, blen, rows, out))
        for chunk, blen, rows, out in launches:
            key = ('round', rows, blen)
            stage = ('C:polya/await' if key in _SEEN_SHAPES
                     else 'C:polya/compile')
            _SEEN_SHAPES.add(key)
            with trace(stage):
                arr = np.asarray(out)
            start, length, mean, stdv, nev, s, e, v = \
                round_ops.unpack_round_output(arr, self.max_peaks)
            for i, t in enumerate(chunk):
                n = int(nev[i])
                t.events = {
                    'start': start[i, :n],
                    'length': length[i, :n],
                    'mean': mean[i, :n],
                    'stdv': stdv[i, :n],
                }
                t.events['end'] = (t.events['start'] +
                                   t.events['length']).astype(np.int64)
                # host-side mask from the downloaded f32 means: the same
                # comparison the kernel ran, bit-identically
                rng = t.polya_range or self.polya_mean_cutoff
                m = t.events['mean']
                t.is_polya = (m >= rng[0]) & (m <= rng[1])
                t.fused_interval = ((int(s[i]), int(e[i]))
                                    if v[i] > 0 else None)

    def warmup(self):
        """Compile every fused-round shape and the recalibration-DP shapes
        before the first real batch; otherwise each new shape's compile
        lands inside batch latency (seconds each over a TPU tunnel)."""
        for blen in _BUCKETS:
            t = _Task(None, 0, 1, None, 0)
            t.signal = np.zeros(blen, np.float32)
            self._fused_round_batched([t])
        from ..parallel.sharding import shard_batch_arrays
        rows = self.batch_rows
        for kmax in (64, 128, 256, 512, 1024):
            ip, ln, n = shard_batch_arrays(
                self.sharding, self.n_devices,
                np.zeros((rows, kmax), bool), np.zeros((rows, kmax),
                                                       np.float32),
                np.zeros(rows, np.int32))
            s, e, v = dp_ops.find_best_polya_interval(
                ip, ln, n, spike_weight=float(self.spike_weight),
                spike_tolerance=int(self.spike_tolerance))
            np.asarray(v)

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
        if self.median_pre_filter > 1:
            with trace('C:polya/medfilt'):
                self._medfilt_tasks(tasks)
        self._fused_round_batched(tasks)

        next_tasks = []
        call_tasks = [t for t in tasks if not t.orig_end_none]
        recal_tasks = [t for t in tasks if t.orig_end_none]

        for t in call_tasks:
            outcome = self._call_polya(t, t.fused_interval, stride)
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
