"""Poly(A) dwell-time measurement: host control flow driving one fused
device call per window bucket and round.

Faithful re-orchestration of the reference's recursive per-read analyzer
(poreplex/polya.py:30-187) as wavefront rounds over a whole batch. Each
round uploads ONE token-packed stream holding every active read's raw
signal window plus a tiny [R, 7] meta table per window bucket
(round_ops.META_COLS), and downloads ~26 decision scalars per read plus
one device-compacted spike stream — the median pre-filter, event
detection, tail marking, interval DP, stdv QC, spike bookkeeping AND the
shifted-signal anchor recalibration all run fused on device
(ops.polya_round). The host replays the reference's decision lattice
(extend / recalibrate / accept / reject) on the returned scalars and
advances each read's state machine; event tables never cross the wire.

The wavefront is SELF-DRIVING: round 1 is dispatched on the calling
(compute) thread, after which a per-analyzer daemon thread downloads each
in-flight round, replays its decisions, and redispatches the extension
stragglers — coalescing active tasks ACROSS batches into shared round
dispatches, so a late chain from batch N rides batch N+1's round trip
instead of paying its own. The compute thread never blocks mid-batch; it
parks (GIL-free) in finish_batch only when the wavefront outlives the
batch's other host work, which keeps both compute threads feeding the
device while rounds are in flight (the r4 profile showed 6.7 thread-s of
a 5.6 s wall parked in synchronous round collection).

Bounded open-end extension (poreplex/polya.py:77-83: re-run with the
window grown by ``openend_expansion``, up to 50 times) is SPECULATED:
each task submits rows for extension depths d..d+K-1 in the same round —
row r is bit-identical to what the reference would compute at depth d+r
(same window, same kernel), and the longer windows are supersets of the
shorter ones so the stream holds each task's signal once. The host walks
the rows while the outcome stays 'extend'; a chain longer than K (or a
mid-chain recalibration, which changes the marking range for subsequent
depths) falls back to a real next round. Extension chains that the
sequential implementation needed N round trips for complete in ceil(N/K).

Numeric semantics (window arithmetic, integer truncation, spike
bookkeeping, stdv QC, shifted-signal recalibration) match the reference;
see ops/polya_round.py for the f32-vs-f64 divergence notes.
"""

import numpy as np

from ..ops import polya_round as round_ops
from ..utils.profiling import trace

# compiled-shape keys already seen by round dispatches in this process;
# first-time shapes are timed separately so steady-state stage times are
# distinguishable from XLA compilation
_SEEN_SHAPES = set()

# window buckets and their fixed dispatch row-count VARIANTS: a bounded
# set of compiled shapes per bucket (task-count changes between rounds
# must not recompile), with the large variant bounding a launch's padded
# compute area at ~2M elements. The small variant exists because the
# fused round kernel's cost scales with the PADDED row count (measured
# ~150-250 ms per 2M-element launch on the tunneled v5e, independent of
# how many rows are real): straggler extension rounds carry a handful of
# tasks and would pay the full-batch kernel + download otherwise.
_BUCKETS = (8192, 16384, 32768, 131072)
_BUCKET_ROWS = {8192: (32, 256), 16384: (16, 128), 32768: (8, 64),
                131072: (4, 16)}

# event-table width per bucket: the round kernel's P-scaled stages (DP
# scan, event-stat gathers) measured ~60 ms per full launch at P=1023 vs
# P=255. The kernel reports rows whose TRUE peak count exceeded the
# width (RoundRow.peaks_truncated) and the wavefront retries exactly
# those tasks in the next-larger bucket, so truncation can never corrupt
# a decision below the top bucket. MEASURED on the bench mix (windows
# include event-dense transcript margin, not just the homopolymer tail):
# width 255 truncated 27% of reads (141/512 — the retry traffic wiped
# out the kernel saving); width 511 truncated zero.
_BUCKET_PEAKS = {8192: 511, 16384: 1023, 32768: 1023, 131072: 1023}

# token-packed stream sizes (f32 elements): the shared window stream is
# padded to the smallest fitting size so each bucket compiles against a
# couple of stream shapes only; rounds larger than the biggest size are
# split into multiple streams
_STREAM_SIZES = (1 << 19, 1 << 21)

# per-pack spike-table capacity: spike_tolerance budgets RESET at every
# poly(A) event, so an accepted interval can legally hold dozens of short
# spikes. 48 balances the download row width (2*(head + 5*capacity) f32
# ≈ 2 KB/row; downloads measured ~60 ms/MB + 25 ms RTT on the tunnel, so
# capacity 128's 5.2 KB rows cost ~35 ms extra per full launch) against
# the ~100 ms host fallback dispatch every overflowing read pays.
# MEASURED on the 2048-read bench mix: capacity 48 overflowed 59 reads
# (2.9%) costing 6.2 s of fallback dispatches — far more than the ~0.3 s
# of download it saved; 128 overflows zero reads there. Do not lower
# without re-measuring C:polya/spike_fallback.
_MAX_SPIKES = 128

# speculative extension depth: rows submitted per task per round —
# balances extra kernel rows per round against chains that outrun the
# speculation and cost another (background) round trip. ADAPTIVE: a
# fresh round-1 task usually accepts at depth 0 (the HMM's rough range
# covers the tail), and with the self-driving driver an extension round
# is off every compute thread's critical path AND coalesces with other
# batches' stragglers — so round 1 ships NO speculative rows (an extra
# row per task would double the round-1 kernel area, ~150-250 ms per
# 2M-element launch, to save a background round trip for the few tasks
# that extend). A task that HAS extended is demonstrably in a chain and
# speculates ahead to finish the chain in fewer (background) rounds.
# Depth 2 (not 4): a round's rows = extenders x depth, and crossing the
# small-row-variant threshold quadruples the launch's kernel area +
# download for speculation the majority of chains never consume.
_SPEC_DEPTH_FIRST = 1
_SPEC_DEPTH = 2

# packing-safe window cap: the interval DP packs (prefix + _VOFF) * kmax + j
# into i32 (ops/polya_dp.py:39-41), which overflows once
# spike_weight * window_length exceeds 2**31 / kmax - _VOFF. With
# kmax = 1024 and spike_weight = 1.5 that bounds windows at ~699k samples;
# cap at the largest safe _BUCKETS[-1] multiple so absurdly long
# right-extensions truncate instead of silently corrupting the argmax.
_PACK_SAFE_LEN = 5 * 131072        # 655,360 < (2**31/1024 - 2**20) / 1.5


def _bucket_len(n):
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + _BUCKETS[-1] - 1) // _BUCKETS[-1]) * _BUCKETS[-1]


_UNSET = object()       # lazy AOT lookup sentinel (None = checked, absent)


class _Task:
    __slots__ = ('read', 'rough_begin', 'rough_end', 'orig_end_none',
                 'polya_range', 'depth', 'signal', 'qaffine', 'insp_begin',
                 'full_length', 'adapter_end', 'spec', 'results',
                 'ticket', 'rounds', 'min_bucket')

    def __init__(self, read, rough_begin, rough_end, polya_range, depth):
        self.read = read
        self.rough_begin = rough_begin
        self.rough_end = rough_end
        self.orig_end_none = rough_end is None
        self.polya_range = polya_range
        self.depth = depth
        self.ticket = None
        self.rounds = 1
        self.min_bucket = 0     # raised on peaks_truncated retries


class _Ticket:
    """Completion handle for one batch's wavefront: counts live tasks and
    releases waiters when the last one settles. ``error`` carries the
    first driver-side failure so finish_batch can surface it on the
    batch's own thread."""

    __slots__ = ('_remaining', '_lock', '_event', 'error')

    def __init__(self, n):
        import threading
        self._remaining = n
        self._lock = threading.Lock()
        self._event = threading.Event()
        self.error = None
        if n <= 0:
            self._event.set()

    def adjust(self, delta, error=None):
        with self._lock:
            if error is not None and self.error is None:
                self.error = error
            self._remaining += delta
            if self._remaining <= 0:
                self._event.set()

    def done(self):
        return self._event.is_set()

    def wait(self, timeout=None):
        return self._event.wait(timeout)


class _WavefrontDriver:
    """Self-driving round engine shared by every batch of one analyzer.

    One daemon thread alternates between (a) downloading + replaying the
    oldest in-flight round and (b) dispatching every currently-pending
    extension task as ONE coalesced round — tasks from different batches
    share the same device launches and round trips. Round 1 of a new
    batch is dispatched by the submitting compute thread (zero added
    latency) and only its collection lands here, so a compute thread
    never parks on a device round trip mid-batch.

    A failure while processing one round settles the tickets of exactly
    the tasks involved (with the error attached) and the driver keeps
    serving other batches; the analyzer degrades those reads to
    no-poly(A) like the previous synchronous orchestration did."""

    IDLE_TIMEOUT = 30.0     # thread exits when idle; resurrected on submit

    def __init__(self, analyzer):
        import collections
        import threading
        self.analyzer = analyzer
        self.lock = threading.Lock()
        self.wake = threading.Condition(self.lock)
        self.inflight = collections.deque()   # (tasks, launches, stride)
        self.pending = []                     # extension tasks to coalesce
        self.pending_stride = None
        self.thread = None

    def submit_inflight(self, tasks, launches, stride):
        """Hand a just-dispatched round to the driver for download +
        replay + (possible) redispatch of its extension chains."""
        with self.lock:
            self.inflight.append((tasks, launches, stride))
            self._ensure_thread()
            self.wake.notify()

    def _ensure_thread(self):
        import threading
        if self.thread is None or not self.thread.is_alive():
            self.thread = threading.Thread(
                target=self._loop, daemon=True, name='polya-wavefront')
            self.thread.start()

    # ------------------------------------------------------------------
    def _loop(self):
        while True:
            with self.lock:
                while not self.inflight and not self.pending:
                    if not self.wake.wait(self.IDLE_TIMEOUT) and \
                            not self.inflight and not self.pending:
                        # re-check under the lock: a submit can land (and
                        # its notify be consumed) in the window where the
                        # timed-out waiter is reacquiring the lock, and
                        # submit_inflight saw a live thread — exiting
                        # without this check would strand that round
                        self.thread = None
                        return
                if self.inflight:
                    # drain downloads before dispatching: extension tasks
                    # keep accumulating in ``pending`` meanwhile, so
                    # multiple batches' stragglers coalesce into one round
                    item, batch = self.inflight.popleft(), None
                else:
                    item = None
                    batch, self.pending = self.pending, []
                    stride = self.pending_stride
            if item is not None:
                self._download_and_replay(*item)
            else:
                self._dispatch_pending(batch, stride)

    @staticmethod
    def _settle(tasks, error):
        import traceback
        traceback.print_exc()
        for t in tasks:
            if t.ticket is not None:
                t.ticket.adjust(-1, error=error)

    def _download_and_replay(self, tasks, launches, stride):
        try:
            from ..utils.profiling import WIRE
            results = [None] * len(launches)
            with trace('C:polya/download'):
                # start every transfer before awaiting any: each awaited
                # download pays a ~27 ms tunnel round trip, and async
                # copies overlap them (measured 8 serial downloads at
                # 214 ms vs 28 ms batched)
                try:
                    for chunk, rows, blen, size, out in launches:
                        for h in out:
                            h.copy_to_host_async()
                except Exception:
                    pass        # sharded/older arrays: plain awaits below
                for i, (chunk, rows, blen, size, out) in enumerate(launches):
                    results[i] = tuple(WIRE.await_array('polya', h)
                                       for h in out)
            next_tasks = self.analyzer._collect_round(
                tasks, launches, stride, results)
            requeue = [nt for nt in next_tasks
                       # safety net; depth caps normally stop chains first
                       if nt.rounds <=
                       self.analyzer.maximum_openend_extension]
        except Exception as exc:
            self._settle(tasks, exc)
            return
        # every input task either continued (its successor inherited the
        # ticket in _replay_chain) or settled; the +1s land before the
        # -1s so a ticket cannot transiently read complete
        for nt in requeue:
            if nt.ticket is not None:
                nt.ticket.adjust(+1)
        for t in tasks:
            if t.ticket is not None:
                t.ticket.adjust(-1)
        if requeue:
            for _ in requeue:           # counter: extension/retry volume
                with trace('C:polya/requeued_task'):
                    pass
            with self.lock:
                self.pending.extend(requeue)
                self.pending_stride = stride
                self.wake.notify()

    def _dispatch_pending(self, tasks, stride):
        try:
            with trace('C:polya/window_build'):
                for t in tasks:
                    self.analyzer._build_window(t, stride)
            with trace('C:polya/dispatch'):
                launches = self.analyzer._dispatch_round(tasks)
        except Exception as exc:
            self._settle(tasks, exc)
            return
        with self.lock:
            self.inflight.append((tasks, launches, stride))
            self.wake.notify()


class PolyaAnalyzer:

    CONFIG_SLOTS = [
        'refinement_expansion', 'event_detection', 'polya_stdv_max',
        'polya_stdv_range', 'spike_tolerance', 'spike_weight',
        'openend_expansion', 'recalibrate_shifted_signal', 'polya_mean_dist',
        'polya_mean_z_cutoff', 'polya_mean_trigger_recalibration',
        'maximum_openend_extension', 'median_pre_filter',
    ]

    def __init__(self, config, sharding=None, n_devices=1, use_pallas=False,
                 batch_rows=128, platform=None, aot_extra_key=''):
        for name in self.CONFIG_SLOTS:
            setattr(self, name, config[name])
        # batch-sharded kernel placement on a multi-chip mesh (pass-through
        # single-device otherwise); see parallel.sharding.shard_batch_arrays
        self.sharding = sharding
        self.n_devices = n_devices
        # fused TPU peak-detector kernel (ops/pallas_event_detection)
        self.use_pallas = use_pallas
        self.max_peaks = 1023
        # AOT executable reuse for the fused round programs (utils/aot.py);
        # warmup installs one executable per (stream size, bucket) so
        # fresh processes load instead of compiling. Single-device only —
        # sharded launches keep the plain jit.
        from ..utils.aot import AotCache
        self._aot = AotCache.for_platform(
            platform if platform is not None else
            ('tpu' if use_pallas else 'cpu'))
        self._aot.extra_key = aot_extra_key
        self._aot_exes = {}
        # self-driving wavefront driver, shared by every batch of this
        # analyzer (coalesces rounds across batches). Created eagerly:
        # two compute threads racing a lazy init would each build one
        # and silently lose the cross-batch coalescing plus the
        # finish_batch liveness backstop for the orphaned driver's
        # batches. The constructor starts no thread (submit does).
        self._driver = _WavefrontDriver(self)

        mean_loc, mean_scale = config['polya_mean_dist']
        self.polya_mean_cutoff = (
            mean_loc - mean_scale * config['polya_mean_z_cutoff'],
            mean_loc + mean_scale * config['polya_mean_z_cutoff'])
        # (poreplex/polya.py:48) trigger is in units of the dist's sigma
        self.polya_mean_trigger_recalibration = (
            config['polya_mean_trigger_recalibration'] *
            config['polya_mean_dist'][1])

        rc = self.recalibrate_shifted_signal
        self._kernel_kwargs = dict(
            window_length1=self.event_detection['window_length1'],
            window_length2=self.event_detection['window_length2'],
            threshold1=float(self.event_detection['threshold1']),
            threshold2=float(self.event_detection['threshold2']),
            peak_height=float(self.event_detection['peak_height']),
            max_peaks=self.max_peaks,
            spike_weight=float(self.spike_weight),
            spike_tolerance=int(self.spike_tolerance),
            max_spikes=_MAX_SPIKES,
            median_pre_filter=int(self.median_pre_filter),
            stdv_lo=float(self.polya_stdv_range[0]),
            stdv_hi=float(self.polya_stdv_range[1]),
            recal_max_dist=int(rc['max_dist_from_adapter']),
            recal_max_stdv=float(rc['max_stdv']),
            recal_zr=float(config['polya_mean_dist'][1] *
                           config['polya_mean_z_cutoff']),
            use_pallas=use_pallas,
            interpret=False,
        )

    # ------------------------------------------------------------------
    def process_batch(self, items, stride):
        """items: list of (read, rough_range) where rough_range is
        (begin, end_or_None) in pooled-frame coordinates and ``read`` has
        .scaled_raw (f32 scaled pA signal) and .sampling_rate."""
        self.finish_batch(self.start_batch(items, stride), stride)

    def start_batch(self, items, stride):
        """Dispatch the first round on THIS thread (so it is in flight
        under the caller's subsequent host work with no added latency)
        and hand it to the self-driving wavefront thread, which downloads
        it, replays the decision lattice, and chains any extension rounds
        without the caller's involvement. Returns a _Ticket for
        advance/finish_batch, or None when there is nothing to do."""
        tasks = [_Task(read, rng[0], rng[1], None, 0)
                 for read, rng in items]
        if not tasks:
            return None
        ticket = _Ticket(len(tasks))
        for t in tasks:
            t.ticket = ticket
        with trace('C:polya/window_build'):
            for t in tasks:
                self._build_window(t, stride)
        with trace('C:polya/dispatch'):
            launches = self._dispatch_round(tasks)
        self._driver.submit_inflight(tasks, launches, stride)
        return ticket

    def advance(self, state, stride):
        """Non-blocking progress poll (the wavefront drives itself on its
        own thread): returns None once the batch's wavefront completed,
        else the state unchanged. Kept so callers can interleave cheap
        completion checks between host phases."""
        if state is None or state.done():
            return None
        return state

    def finish_batch(self, state, stride):
        """Park (GIL-free) until this batch's wavefront settles; raises
        the first driver-side error, matching the synchronous
        orchestration's per-batch failure surface."""
        if state is None:
            return
        with trace('C:polya/await'):
            while not state.wait(60.0):
                drv = self._driver
                if drv is None or drv.thread is None or \
                        not drv.thread.is_alive():
                    # backstop: a driver thread that died outside its own
                    # error handling must not park the batch forever
                    raise RuntimeError(
                        'poly(A) wavefront driver died with work pending')
        if state.error is not None:
            raise RuntimeError(
                'poly(A) wavefront failed: {}'.format(state.error)) \
                from state.error

    # ------------------------------------------------------------------
    def _build_window(self, task, stride):
        """Window arithmetic of poreplex/polya.py:50-63, plus the
        speculative rows: task.spec[r] = (length, insp_end) for extension
        depth task.depth + r; the signal slice covers the LONGEST row.

        Reads expose ``dac_window`` returning a zero-copy integer DAC
        view plus the (a, b) affine onto the scaled pA signal, so the
        host never converts or scales raw samples — the affine folds into
        the wire dequantization and integer windows ship LOSSLESSLY
        (test fakes provide pre-scaled ``scaled_raw`` f32 instead)."""
        read = task.read
        slicer = getattr(read, 'dac_window', None)
        if slicer is None:
            raw = read.scaled_raw
            full = len(raw)
            slicer = lambda a, b: (np.asarray(raw[a:b], np.float32),
                                   np.float32(1.0), np.float32(0.0))
        else:
            full = read.signal_length
        meu = self.openend_expansion // stride
        rough_begin, rough_end = task.rough_begin, task.rough_end
        if rough_end is None or rough_end - rough_begin < meu:
            rough_end = rough_begin + meu
        task.rough_end = rough_end

        insp_begin = max(0, rough_begin * stride - self.refinement_expansion)
        task.insp_begin = insp_begin
        task.full_length = full
        task.adapter_end = rough_begin * stride - insp_begin

        spec = []
        depth_budget = _SPEC_DEPTH if task.depth > 0 else _SPEC_DEPTH_FIRST
        for r in range(depth_budget):
            insp_end = min(full, (rough_end + r * meu + 1) * stride +
                           self.refinement_expansion,
                           insp_begin + _PACK_SAFE_LEN)
            spec.append((insp_end - insp_begin, insp_end))
            # row r+1 is consulted only when row r extends, which requires
            # an uncapped window and remaining extension budget; an
            # end-less rough range goes straight to recalibration where a
            # chain is never walked (the range changes)
            if not (insp_end < full and
                    task.depth + r < self.maximum_openend_extension and
                    not task.orig_end_none):
                break
        task.spec = spec
        task.results = {}
        task.signal, qa, qb = slicer(insp_begin, insp_begin + spec[-1][0])
        task.qaffine = (qa, qb)

    def _row_variants(self, blen):
        """Allowed compiled row counts for a bucket, ascending; sharded
        kernels split rows across devices evenly."""
        return tuple(-(-r // self.n_devices) * self.n_devices
                     for r in _BUCKET_ROWS.get(blen, (8,)))

    # ------------------------------------------------------------------
    def _dispatch_round(self, tasks):
        """Pack every task's window into shared u16-quantized streams
        (ONE copy per task — speculative rows reference the same offset
        with their own lengths) and launch one fused kernel call per
        (stream, window bucket, row chunk). The whole round costs TWO
        uploads per stream: the quantized signal and one concatenated
        meta table, sliced on device per launch. Returns
        [(entries, rows, blen, size, handle)] with every launch dispatched
        before any result is awaited."""
        from .engine import DeviceEngine

        cap = _STREAM_SIZES[-1]
        # integer-DAC windows quantize losslessly, f32 windows via the
        # min/max affine — each kind gets its own stream groups (task
        # order within a round is free; offsets are per-task anyway)
        stream_groups = []          # (total, [task, ...])
        for kind in ('iu', 'f'):
            cur, cur_total = [], 0
            for t in tasks:
                if t.signal.dtype.kind not in kind:
                    continue
                n = len(t.signal)
                if cur and cur_total + n > cap:
                    stream_groups.append((cur_total, cur))
                    cur, cur_total = [], 0
                cur.append(t)
                cur_total += n
            if cur:
                stream_groups.append((cur_total, cur))

        launches = []
        for total, group in stream_groups:
            size = next((s for s in _STREAM_SIZES if s >= total), None)
            if size is None:        # a single oversized window
                size = ((total + cap - 1) // cap) * cap
            stream = np.zeros(size, np.uint16)
            ng = len(group)
            qparams = np.zeros((ng, 2), np.float32)
            qparams[:, 1] = 1.0
            affines = np.empty((ng, 2), np.float32)
            for gi, t in enumerate(group):
                affines[gi] = t.qaffine
            with trace('C:polya/quantize'):
                if group[0].signal.dtype.kind in 'iu':
                    _quantize_dac_stream([t.signal for t in group],
                                         stream, qparams, affines)
                else:
                    DeviceEngine._quantize_stream(
                        [t.signal for t in group], stream, qparams, 65535)
                    # fold the scaled-pA affine into the dequantization
                    qparams[:ng, 0] = (affines[:, 0] * qparams[:ng, 0] +
                                       affines[:, 1])
                    qparams[:ng, 1] *= affines[:, 0]
            by_bucket = {}
            offset = 0
            for gi, t in enumerate(group):
                for r, (length, _) in enumerate(t.spec):
                    blen = max(_bucket_len(length), t.min_bucket)
                    by_bucket.setdefault(blen, []).append(
                        (t, r, offset, length, gi))
                offset += len(t.signal)

            # one concatenated meta table for the whole stream, padded to
            # each launch's fixed row count and sliced on device; the
            # last (or only) chunk of a bucket takes the smallest row
            # variant that fits, so straggler rounds run the cheap shape
            units = []
            for blen, entries in sorted(by_bucket.items()):
                variants = self._row_variants(blen)
                small, big = variants[0], variants[-1]
                lo = 0
                while lo < len(entries):
                    n = len(entries) - lo
                    # several small launches beat one mostly-padding big
                    # launch while their per-launch overhead (~50 rows'
                    # worth of kernel time) stays under the padding saved
                    if small < big and n <= 3 * small:
                        rows = small
                    else:
                        rows = big
                    units.append((blen, rows, entries[lo:lo + rows]))
                    lo += rows
            all_meta = np.zeros((sum(rows for _, rows, _ in units),
                                 round_ops.META_COLS), np.float32)
            all_meta[:, 6] = 1.0
            base = 0
            for blen, rows, chunk in units:
                for i, (t, r, off, length, gi) in enumerate(chunk):
                    all_meta[base + i] = (
                        off, length, t.adapter_end,
                        *(t.polya_range or self.polya_mean_cutoff),
                        qparams[gi, 0], qparams[gi, 1])
                base += rows

            from ..utils.profiling import WIRE
            WIRE.upload('polya', stream.nbytes + all_meta.nbytes)
            stream_dev = self._put_stream(stream)
            sharded = self.sharding is not None and self.n_devices > 1
            if not sharded:
                import jax.numpy as jnp
                meta_all_dev = jnp.asarray(all_meta)
            base = 0
            for blen, rows, chunk in units:
                if sharded:
                    meta_dev, = self._put_meta(
                        all_meta[base:base + rows])
                else:
                    # device-side slice: no extra host->device transfer
                    meta_dev = meta_all_dev[base:base + rows]
                base += rows
                kw = self._bucket_kwargs(blen)
                exe = None
                if not sharded:
                    exe = self._aot_exes.get((size, blen, rows), _UNSET)
                    if exe is _UNSET:   # un-prewarmed session: try a
                        exe = self._aot.load_only(   # load-only pickup
                            'polya_round', stream_dev, meta_dev,
                            blen=blen, **kw)
                        self._aot_exes[(size, blen, rows)] = exe
                if exe is not None:
                    out = exe(stream_dev, meta_dev)
                else:
                    out = round_ops.polya_round(
                        stream_dev, meta_dev, blen=blen, **kw)
                launches.append((chunk, rows, blen, size, out))
        return launches

    def _bucket_kwargs(self, blen):
        """Kernel statics for one bucket: the event-table width scales
        with the window size (_BUCKET_PEAKS)."""
        kw = dict(self._kernel_kwargs)
        kw['max_peaks'] = _BUCKET_PEAKS.get(blen, self.max_peaks)
        return kw

    def _put_stream(self, stream):
        import jax
        import jax.numpy as jnp
        if self.sharding is None or self.n_devices <= 1:
            return jnp.asarray(stream)
        # windows are gathered by sharded row indices, so the stream is
        # replicated across the mesh
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(self.sharding.mesh, P())
        return jax.device_put(jnp.asarray(stream), repl)

    def _put_meta(self, *metas):
        from ..parallel.sharding import shard_batch_arrays
        return shard_batch_arrays(self.sharding, self.n_devices, *metas)

    def warmup_jobs(self):
        """One zero-arg compile job per fused-round shape, so the analyzer
        can overlap them: each compile is minutes of tunnel-server latency
        with the host idle, and concurrent compile requests pipeline."""
        def job(size, blen, rows):
            def run():
                n = min(blen, size)
                stream = np.zeros(size, np.uint16)
                meta = np.zeros((rows, round_ops.META_COLS), np.float32)
                meta[:, 6] = 1.0
                meta[0] = (0, n, 0, *self.polya_mean_cutoff, 0.0, 1.0)
                meta_dev, = self._put_meta(meta)
                stream_dev = self._put_stream(stream)
                sharded = self.sharding is not None and self.n_devices > 1
                kw = self._bucket_kwargs(blen)
                exe = None
                if not sharded:
                    exe = self._aot.load_or_compile(
                        round_ops.polya_round, 'polya_round',
                        stream_dev, meta_dev, blen=blen, **kw)
                if exe is not None:
                    self._aot_exes[(size, blen, rows)] = exe
                    out = exe(stream_dev, meta_dev)
                else:
                    out = round_ops.polya_round(
                        stream_dev, meta_dev, blen=blen, **kw)
                for h in out:
                    np.asarray(h)
                _SEEN_SHAPES.add(('round', rows, blen, size))
            return run
        return [job(size, blen, rows) for size in _STREAM_SIZES
                for blen in _BUCKETS for rows in self._row_variants(blen)]

    def warmup(self):
        """Compile every fused-round shape before the first real batch;
        otherwise each new shape's compile lands inside batch latency
        (seconds each over a TPU tunnel)."""
        for run in self.warmup_jobs():
            run()

    # ------------------------------------------------------------------
    def _collect_round(self, tasks, launches, stride, results=None):
        for li, (chunk, rows, blen, size, out) in enumerate(launches):
            key = ('round', rows, blen, size)
            stage = ('C:polya/await' if key in _SEEN_SHAPES
                     else 'C:polya/compile')
            _SEEN_SHAPES.add(key)
            if results is not None and results[li] is not None:
                heads, spk_stream = results[li]
            else:
                with trace(stage):
                    heads, spk_stream = (np.asarray(h) for h in out)
            decoded = round_ops.unpack_rows(heads, spk_stream, len(chunk),
                                            _MAX_SPIKES)
            for i, entry in enumerate(chunk):
                t, r = entry[0], entry[1]
                decoded[i].blen = blen
                t.results[r] = decoded[i]

        next_tasks = []
        with trace('C:polya/replay'):
            for t in tasks:
                nt = self._replay_chain(t, stride)
                if nt is not None:
                    next_tasks.append(nt)
        return next_tasks

    # ------------------------------------------------------------------
    def _replay_chain(self, t, stride):
        """Walk this task's speculative rows through the reference's
        decision lattice; returns the real extension task for the next
        round when the chain runs past the speculated depth or the
        marking range changes mid-chain."""
        meu = self.openend_expansion // stride
        for r, (length, insp_end) in enumerate(t.spec):
            row = t.results[r]
            depth = t.depth + r
            range_was_set = t.polya_range is not None

            if row.peaks_truncated:
                # the bucket's event-table width truncated this window's
                # event table: decisions from it are unsafe — rerun the
                # task AT THIS DEPTH (earlier speculative rows were all
                # clean extends, already reflected in depth/rough_end)
                # in the next bucket whose table is actually WIDER
                # (padding alone reproduces the identical truncated
                # table); monotone growth bounds the retries. No wider
                # bucket => proceed with the clamped table, the bounded
                # behavior every fixed-width event detector has.
                wider = next(
                    (b for b in _BUCKETS if b > row.blen and
                     _BUCKET_PEAKS.get(b, 1023) >
                     _BUCKET_PEAKS.get(row.blen, 1023)), None)
                if wider is not None:
                    with trace('C:polya/trunc_retry'):
                        pass    # counter: stage_calls tally the retries
                    nt = _Task(t.read, t.rough_begin,
                               t.rough_end + r * meu,
                               t.polya_range, depth)
                    nt.orig_end_none = t.orig_end_none if r == 0 else False
                    nt.ticket = t.ticket
                    nt.rounds = t.rounds + 1
                    nt.min_bucket = wider
                    return nt

            if t.orig_end_none and r == 0:
                # rough range had no end: straight to anchor recalibration
                # (poreplex/polya.py:65-68)
                outcome = self._replay_recal(t, row, depth, insp_end)
            else:
                outcome = self._outcome(t, row.a, range_was_set, depth,
                                        insp_end)
                if outcome == 'recalibrate':
                    outcome = self._replay_recal(t, row, depth, insp_end)
            if outcome != 'extend':
                return None
            # extension: row r+1 IS the reference's depth+1 computation —
            # unless the marking range just changed (the next depth must
            # re-mark with it) or the speculation window is exhausted
            range_changed = (t.polya_range is not None) != range_was_set
            if range_changed or r + 1 >= len(t.spec):
                nt = _Task(t.read, t.rough_begin,
                           t.rough_end + (r + 1) * meu,
                           t.polya_range, depth + 1)
                nt.orig_end_none = False
                nt.ticket = t.ticket
                nt.rounds = t.rounds + 1
                return nt
        return None

    def _replay_recal(self, t, row, depth, insp_end):
        """Anchor-event recalibration decision (poreplex/polya.py:127-148)
        on the kernel's pack-B scalars. Returns the follow-up outcome
        ('done'/'extend')."""
        if not row.anchor_any:
            return 'done'
        if row.recal_marked_len < self.recalibrate_shifted_signal[
                'min_length']:
            return 'done'
        t.polya_range = (row.recal_lo, row.recal_hi)
        return self._outcome(t, row.b, True, depth, insp_end)

    # ------------------------------------------------------------------
    def _outcome(self, t, pack, range_is_set, depth, insp_end):
        """Returns 'done', 'extend' or 'recalibrate'
        (logic of poreplex/polya.py:75-125) from one decision pack."""
        # right-open extension: interval touches the last event and the
        # window does not reach the end of the signal
        if (pack.valid and pack.e_is_last and
                insp_end < t.full_length and
                depth < self.maximum_openend_extension):
            return 'extend'

        if not pack.valid or (
                not range_is_set and
                abs(pack.mean_level - self.polya_mean_dist[0]) >
                self.polya_mean_trigger_recalibration):
            return 'recalibrate' if not range_is_set else 'done'

        # stdv QC on the longest event in the interval; NaN compares False
        if pack.longest_stdv < self.polya_stdv_max:
            if pack.spike_count > _MAX_SPIKES or not pack.spikes_ok:
                with trace('C:polya/spike_fallback'):
                    spikes = self._spikes_fallback(t, pack, insp_end)
            else:
                spikes = pack.spikes()
            t.read.set_polya_tail({
                'begin': pack.begin_rel + t.insp_begin,
                'end': pack.end_rel + t.insp_begin,
                'dwell_time': pack.dwell / t.read.sampling_rate,
                'spikes': spikes,
            })
            return 'done'
        elif not range_is_set:
            return 'recalibrate'
        return 'done'

    # ------------------------------------------------------------------
    def _spikes_fallback(self, t, pack, insp_end):
        """Rare path: more spikes in the accepted interval than the fused
        kernel's bounded table. Re-derive the full event table with the
        standalone detection kernel (identical f32 numerics) and build the
        spike tuples on the host exactly like poreplex/polya.py:109-116."""
        import jax.numpy as jnp
        from ..ops import event_detection as ed

        # quantize the FULL window (the span the dispatch quantized) and
        # slice after, so the affine matches the kernel's bit-for-bit
        sig = _wire_roundtrip(t.signal, t.qaffine)[:insp_end - t.insp_begin]
        sig = _medfilt_host(sig, self.median_pre_filter)
        # pad to the window bucket so the dispatch reuses a bounded set of
        # compiled shapes (length masking makes the padding inert)
        true_len = len(sig)
        blen = _bucket_len(true_len)
        if blen > true_len:
            sig = np.concatenate([sig, np.zeros(blen - true_len,
                                                np.float32)])
        edc = self.event_detection
        out = ed.detect_events(
            jnp.asarray(sig[None]), jnp.asarray([true_len], np.int32),
            window_length1=edc['window_length1'],
            window_length2=edc['window_length2'],
            threshold1=float(edc['threshold1']),
            threshold2=float(edc['threshold2']),
            peak_height=float(edc['peak_height']),
            max_peaks=self.max_peaks, use_pallas=self.use_pallas)
        mean = np.asarray(out['mean'])[0]
        length = np.asarray(out['length'])[0]
        rng = t.polya_range or self.polya_mean_cutoff
        is_polya = (mean >= rng[0]) & (mean <= rng[1])
        s, e = pack.s, pack.e
        spikes = []
        for spk in np.where(~is_polya[s:e + 1])[0]:
            if spk - 1 < 0:
                neighborhood = ()
            else:
                hi = min(s + spk + 2, e + 1)
                neighborhood = tuple(
                    float(v) for v in mean[s + spk - 1:hi])
            spikes.append((float(length[s + spk]),) + neighborhood)
        return spikes


def _quantize_dac_stream(chunks, flat, qparams, affines):
    """Lossless integer wire: 16-bit DAC spans are <= 65535, so
    ``q = dac - min(dac)`` fits u16 exactly (step = 1 DAC) and the
    dequantized signal is an exact f32 function of the instrument's own
    integers — outlier spikes cannot coarsen the step the way a min/max
    f32 affine can. The per-chunk (a, b) affine mapping DAC to scaled pA
    is folded into the dequantization qparams: v = (a*min + b) + q * a."""
    n = len(chunks)
    if n == 0:
        return 0
    lens = np.fromiter((len(c) for c in chunks), np.int64, n)
    total = int(lens.sum())
    a = affines[:, 0]
    b = affines[:, 1]
    if total == 0:
        qparams[:n, 0] = b
        qparams[:n, 1] = a
        return 0
    cat = np.concatenate(chunks) if n > 1 else np.asarray(chunks[0])
    offsets = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    nz = lens > 0
    mins = np.zeros(n, np.int64)
    mins[nz] = np.minimum.reduceat(cat, offsets[nz])
    flat[:total] = (cat - np.repeat(mins, lens)).astype(flat.dtype)
    minf = mins.astype(np.float32)
    qparams[:n, 0] = a * minf + b
    qparams[:n, 1] = a
    return total


def _wire_roundtrip(signal, qaffine=(1.0, 0.0)):
    """Reproduce the wire quantization + device dequantization on the
    host so the spike-overflow fallback sees the exact signal the kernel
    saw: integer DAC windows go through the lossless shift
    (_quantize_dac_stream), f32 windows through the per-window [min, max]
    65535-step affine (DeviceEngine._quantize_stream) with the (a, b)
    scaled-pA fold — all f32 arithmetic, matching the dispatch path
    op-for-op.

    NOTE: the fallback quantizes the task's FULL window (the same span
    the dispatch quantized), then slices — the affine is window-wide."""
    a = np.float32(qaffine[0])
    b = np.float32(qaffine[1])
    if len(signal) == 0:
        return np.asarray(signal, np.float32)
    if signal.dtype.kind in 'iu':
        mn = int(signal.min())
        lo = a * np.float32(mn) + b
        q = (signal.astype(np.int64) - mn).astype(np.float32)
        return (lo + q * a).astype(np.float32)
    lo0 = np.float32(signal.min())
    step0 = np.float32(max((float(signal.max()) - float(lo0)) / 65535, 1e-7))
    q = np.clip(np.round((signal - lo0) / step0), 0, 65535).astype(np.float32)
    lo = a * lo0 + b
    step = a * step0
    return (lo + q * step).astype(np.float32)


def _medfilt_host(signal, k):
    """Zero-padded median filter of one window (scipy.signal.medfilt
    semantics), vectorized numpy — used only by the spike-overflow
    fallback."""
    if k <= 1:
        return signal
    from numpy.lib.stride_tricks import sliding_window_view
    h = k // 2
    buf = np.zeros(len(signal) + 2 * h, np.float32)
    buf[h:h + len(signal)] = signal
    return np.median(sliding_window_view(buf, k), axis=1).astype(np.float32)
