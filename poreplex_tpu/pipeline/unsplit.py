"""Pseudo-fusion ("unsplit read") detection.

Re-orchestration of the reference's windowed second-HMM scan
(poreplex/signal_analyzer.py:366-443): sliding windows over post-adapter
basecalled events are gathered across ALL reads of a batch and decoded
with the unsplit HMM in ONE token-packed device call — every read's
scaled-mean event stream is uploaded once and each window is a
contiguous (lo, hi) slice of it.

The per-window run analysis ALSO runs on device: the reference's
backward-compatible host loop (walk Viterbi state runs, anchor a leader
chain, emit one (leader_start, first, last) trio per adapter run —
poreplex/signal_analyzer.py:388-404) is re-expressed as a vectorized
XLA post-pass over the decoded paths, fused into the same program as the
Viterbi (the Pallas kernel on TPU), so only a [R, K, 3] trio table plus
run counts crosses the wire instead of the full [R, emax] path array.
The duration cutoffs + high-quality-base counting stay on the host with
identical semantics (they need per-event start/end times and qualities
that never leave the host).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.intervals import union_intervals


class UnsplitReadDetector:

    # per-launch window rows (windows-per-read is typically 2-4, so this
    # covers a whole 128-read batch in one dispatch) and the shared
    # event-stream capacity in f32 elements
    ROWS_MULT = 4
    STREAM_SIZE = 1 << 16

    # device-emitted adapter runs per window; windows with more fall back
    # to the full-path decode + host walk (tracked per chunk)
    MAX_RUNS = 16

    def __init__(self, config, unsplit_model, sharding=None, n_devices=1,
                 batch_rows=128, use_pallas=False, platform=None,
                 aot_extra_key=''):
        self.config = config['unsplit_read_detection']
        self.model = unsplit_model
        # batch-sharded Viterbi placement on a multi-chip mesh
        self.sharding = sharding
        self.n_devices = n_devices
        self.use_pallas = use_pallas
        # fixed-row device dispatches: window-count changes between batches
        # must not trigger XLA recompiles (only the event-count bucket may)
        rows = max(int(batch_rows), 1) * self.ROWS_MULT
        self.rows = -(-rows // n_devices) * n_devices
        self.leaderish = {unsplit_model.state_index[n]
                          for n in ('adapter', 'leader-high', 'leader-low')
                          if n in unsplit_model.state_index}
        self.adapter_idx = unsplit_model.state_index['adapter']
        leader_mask = np.zeros(unsplit_model.nstates, bool)
        for i in self.leaderish:
            leader_mask[i] = True
        self._leader_mask = jnp.asarray(leader_mask)
        self._decode_runs = jax.jit(self._decode_runs_impl,
                                    static_argnames=('emax',))
        # AOT executable reuse per event bucket (utils/aot.py); installed
        # by warmup, single-device dispatches only
        from ..utils.aot import AotCache
        self._aot = AotCache.for_platform(
            platform if platform is not None else
            ('tpu' if use_pallas else 'cpu'))
        # the decode bakes the unsplit HMM parameters as constants
        self._aot.extra_key = aot_extra_key
        self._aot_exes = {}

    _UNSET = object()

    def _run_decode(self, stream_dev, meta_dev, emax):
        exe = None
        if self.sharding is None or self.n_devices <= 1:
            key = (stream_dev.shape[0], meta_dev.shape[0], emax)
            exe = self._aot_exes.get(key, self._UNSET)
            if exe is self._UNSET:  # un-prewarmed: load-only pickup
                exe = self._aot.load_only('unsplit_decode_runs',
                                          stream_dev, meta_dev, emax=emax)
                self._aot_exes[key] = exe
        if exe is not None:
            return exe(stream_dev, meta_dev)
        return self._decode_runs(stream_dev, meta_dev, emax=emax)

    # ------------------------------------------------------------------
    def collect_windows(self, read, segments, elspan):
        """Build the sliding event windows for one read
        (poreplex/signal_analyzer.py:369-387). Event starts are sorted, so
        each window is a contiguous [lo, hi) slice of the event table;
        returns a list of (lo, hi) pairs or None when not applicable."""
        try:
            payload_start = (segments['adapter'][1] + 1) * elspan
        except (KeyError, IndexError):
            return None, None   # adapter-only read

        config = self.config
        rate = read.sampling_rate
        window_size = int(config['window_size'] * rate)
        window_step = int(config['window_step'] * rate)

        ev = read.events
        starts = np.asarray(ev['start'], np.int64)
        ends = np.asarray(ev['end'], np.int64)
        last_end = int(ends[-1])

        windows = []
        for left in range(payload_start, last_end, window_step):
            lo = int(np.searchsorted(starts, left, side='left'))
            hi = int(np.searchsorted(starts, left + window_size,
                                     side='right'))
            if hi - lo < 1:
                break
            windows.append((lo, hi))
        return payload_start, windows

    # event-count buckets for the padded Viterbi shape: coarse on purpose —
    # padding is compute-only (the upload is token-packed) and every extra
    # compiled shape costs seconds of tunnel warmup (larger counts snap to
    # the next power of two)
    EVENT_BUCKETS = (128, 1024)

    @classmethod
    def _event_bucket(cls, n):
        for b in cls.EVENT_BUCKETS:
            if n <= b:
                return b
        return 1 << (n - 1).bit_length()

    # ------------------------------------------------------------------
    def _gather_windows(self, stream, meta, emax):
        off = meta[:, 0]
        lens = meta[:, 1]
        j = jnp.arange(emax, dtype=jnp.int32)[None, :]
        idx = jnp.clip(off[:, None] + j, 0, stream.shape[0] - 1)
        x = jnp.where(j < lens[:, None], jnp.take(stream, idx), 0.0)
        return x, lens, j

    def _decode_runs_impl(self, stream, meta, emax):
        """Fused decode + leader->adapter run extraction.

        Device re-expression of the reference's run walk
        (poreplex/signal_analyzer.py:388-404): an adapter run emits the
        trio (leader_start, first, last) where leader_start is the start
        of the contiguous chain of leaderish runs immediately preceding
        (and containing) it — the chain is broken by non-leaderish
        positions and by earlier adapter runs (the host loop resets its
        anchor after every adapter run). Returns [R, K*3 + 1] i32:
        K trios (-1-padded) + the total run count (> K => overflow, the
        caller falls back to the full-path walk for that window)."""
        m = self.model
        x, lens, j = self._gather_windows(stream, meta, emax)
        if self.use_pallas:
            from ..ops import pallas_viterbi
            path, _ = pallas_viterbi.viterbi(
                x, lens, m.log_start, m.log_trans, m.mus, m.sigmas, m.logws)
        else:
            from ..ops import viterbi as vit_ops
            path, _ = vit_ops.viterbi(
                x, lens, m.log_start, m.log_trans, m.mus, m.sigmas, m.logws)

        R = meta.shape[0]
        K = self.MAX_RUNS
        valid = j < lens[:, None]
        is_ad = (path == self.adapter_idx) & valid
        leaderish = self._leader_mask[path] & valid
        prev_ad = jnp.pad(is_ad[:, :-1], ((0, 0), (1, 0)))
        next_ad = jnp.pad(is_ad[:, 1:], ((0, 0), (0, 1)))
        run_start = is_ad & ~prev_ad
        run_end = is_ad & ~next_ad
        # last chain-breaking position strictly before t
        bound = (~leaderish) | is_ad
        lastb = jax.lax.cummax(jnp.where(bound, j, -1), axis=1)
        lastb_excl = jnp.pad(lastb[:, :-1], ((0, 0), (1, 0)),
                             constant_values=-1)
        leader_start = lastb_excl + 1

        rows = jnp.arange(R, dtype=jnp.int32)[:, None]
        sidx = jnp.cumsum(run_start, axis=1) - 1
        eidx = jnp.cumsum(run_end, axis=1) - 1
        sslot = jnp.where(run_start, jnp.minimum(sidx, K), K)
        eslot = jnp.where(run_end, jnp.minimum(eidx, K), K)
        jb = jnp.broadcast_to(j, (R, emax))
        neg = jnp.full((R, K + 1), -1, jnp.int32)
        leads = neg.at[rows, sslot].max(
            jnp.broadcast_to(leader_start, (R, emax)))
        firsts = neg.at[rows, sslot].max(jb)
        lasts = neg.at[rows, eslot].max(jb)
        count = jnp.sum(run_start, axis=1, dtype=jnp.int32)
        trios = jnp.stack([leads[:, :K], firsts[:, :K], lasts[:, :K]],
                          axis=2)
        return jnp.concatenate([trios.reshape(R, 3 * K), count[:, None]],
                               axis=1)

    # ------------------------------------------------------------------
    def start_decode(self, jobs):
        """Dispatch the fused Viterbi + run-extraction for every window
        and start a pump thread awaiting the downloads (over the tunnel,
        dispatched computations only progress while something awaits
        them) — callers interleave host work before finish_decode."""
        if not jobs:
            return None
        import threading
        launches = []
        cursor = 0
        from ..utils.profiling import WIRE
        while cursor < len(jobs):
            chunk, stream, meta, emax = self._pack_chunk(jobs, cursor)
            cursor += len(chunk)
            WIRE.upload('unsplit', stream.nbytes + meta.nbytes)
            stream_dev = self._put_stream(stream)
            meta_dev, = self._put_meta(meta)
            launches.append(
                (chunk, self._run_decode(stream_dev, meta_dev, emax)))
        results = [None] * len(launches)

        def pump():
            try:        # overlap the per-launch download round trips
                for chunk, handle in launches:
                    handle.copy_to_host_async()
            except Exception:
                pass
            for i, (chunk, handle) in enumerate(launches):
                results[i] = WIRE.await_array('unsplit', handle)

        pump_thread = threading.Thread(target=pump, daemon=True)
        pump_thread.start()
        return launches, results, pump_thread

    def finish_decode(self, state):
        """Await the dispatched decodes and return one [k, 3] i64 array
        of (leader_start, first, last) trios per window; overflowing
        windows (> K adapter runs) are re-decoded via the full-path
        kernel."""
        if state is None:
            return []
        launches, results, pump_thread = state
        pump_thread.join()
        runs = []
        overflow = []           # (result slot, job)
        K = self.MAX_RUNS
        base = 0
        for li, (chunk, handle) in enumerate(launches):
            arr = results[li] if results[li] is not None \
                else np.asarray(handle)
            for i, job in enumerate(chunk):
                count = int(arr[i, 3 * K])
                if count > K:
                    runs.append(None)
                    overflow.append((base + i, job))
                else:
                    runs.append(arr[i, :3 * count].reshape(count, 3)
                                .astype(np.int64))
            base += len(chunk)
        for slot, job in overflow:
            path = self.decode_paths_batched([job])[0]
            runs[slot] = self._runs_from_path(path)
        return runs

    def decode_runs_batched(self, jobs):
        """jobs: list of (read, lo, hi) contiguous event-slice windows.
        Uploads each read's scaled_mean stream once + a tiny [R, 2] meta
        table, runs the fused Viterbi + run-extraction (compiled shape
        varies only with the event-count bucket), and downloads the
        [R, K*3+1] trio table (see start_decode/finish_decode for the
        overlapped form)."""
        return self.finish_decode(self.start_decode(jobs))

    def _runs_from_path(self, path):
        """Host fallback: the reference's run walk verbatim
        (poreplex/signal_analyzer.py:388-404)."""
        trios = []
        leader_start = None
        for first, last, state in _iter_runs(path):
            if state not in self.leaderish:
                leader_start = None
                continue
            if leader_start is None:
                leader_start = first
            if state != self.adapter_idx:
                continue
            trios.append((leader_start, first, last))
            leader_start = None
        return np.asarray(trios, np.int64).reshape(-1, 3)

    def decode_paths_batched(self, jobs):
        """Full Viterbi paths for a list of windows (overflow fallback +
        tests). One i8 [R, emax] download."""
        if not jobs:
            return []
        launches = []
        cursor = 0
        while cursor < len(jobs):
            chunk, stream, meta, emax = self._pack_chunk(jobs, cursor)
            cursor += len(chunk)
            stream_dev = self._put_stream(stream)
            meta_dev, = self._put_meta(meta)
            launches.append(
                (len(chunk), meta[:, 1],
                 self.model._decode_paths_flat(stream_dev, meta_dev,
                                               emax=emax)))
        paths = []
        for used, lens, handle in launches:
            path = np.asarray(handle)
            paths.extend(path[i, :lens[i]] for i in range(used))
        return paths

    def _row_variant(self, remaining):
        """Padded row count for a launch: the Viterbi kernel's cost
        scales with the PADDED row count, so a remainder chunk (the tail
        of a batch, or a small batch) takes the quarter-size compiled
        shape instead of paying the full-size kernel + download."""
        small = -(-max(1, self.rows // self.ROWS_MULT) //
                  self.n_devices) * self.n_devices
        return small if remaining <= 3 * small else self.rows

    def _pack_chunk(self, jobs, cursor):
        """Pack jobs[cursor:] into one launch: per-read event streams laid
        end-to-end (each read uploaded once per chunk), bounded by the row
        count and the stream capacity."""
        rows = self._row_variant(len(jobs) - cursor)
        stream = np.zeros(self.STREAM_SIZE, np.float32)
        meta = np.zeros((rows, 2), np.int32)
        offsets = {}        # id(read) -> stream offset
        used = 0
        chunk = []
        emax = 0
        for read, lo, hi in jobs[cursor:]:
            if len(chunk) >= rows:
                break
            key = id(read)
            if key not in offsets:
                vals = np.asarray(read.events['scaled_mean'], np.float32)
                if used + len(vals) > len(stream):
                    if not chunk:
                        # one read larger than the stream: grow it
                        cap = len(stream)
                        need = used + len(vals)
                        stream = np.resize(stream,
                                           ((need + cap - 1) // cap) * cap)
                    else:
                        break
                stream[used:used + len(vals)] = vals
                offsets[key] = used
                used += len(vals)
            meta[len(chunk)] = (offsets[key] + lo, hi - lo)
            emax = max(emax, hi - lo)
            chunk.append((read, lo, hi))
        return chunk, stream, meta, self._event_bucket(emax)

    def _put_stream(self, stream):
        if self.sharding is None or self.n_devices <= 1:
            return jnp.asarray(stream)
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(self.sharding.mesh, P())
        return jax.device_put(jnp.asarray(stream), repl)

    def _put_meta(self, meta):
        from ..parallel.sharding import shard_batch_arrays
        return shard_batch_arrays(self.sharding, self.n_devices, meta)

    def warmup_jobs(self):
        """One zero-arg compile job per event bucket (see
        PolyaAnalyzer.warmup_jobs for why these run concurrently)."""
        def job(emax, rows):
            def run():
                stream = self._put_stream(
                    np.zeros(self.STREAM_SIZE, np.float32))
                meta, = self._put_meta(np.zeros((rows, 2), np.int32))
                if self.sharding is None or self.n_devices <= 1:
                    exe = self._aot.load_or_compile(
                        self._decode_runs, 'unsplit_decode_runs',
                        stream, meta, emax=emax)
                    if exe is not None:
                        self._aot_exes[
                            (stream.shape[0], rows, emax)] = exe
                        np.asarray(exe(stream, meta))
                        return
                np.asarray(self._decode_runs(stream, meta, emax=emax))
            return run
        return [job(emax, rows) for emax in self.EVENT_BUCKETS
                for rows in {self._row_variant(1), self.rows}]

    def warmup(self):
        """Compile the fused decode for every event bucket up front."""
        for run in self.warmup_jobs():
            run()

    # ------------------------------------------------------------------
    def analyze_read(self, read, payload_start, windows, runs):
        """Post-Viterbi analysis for one read from the device-emitted
        (leader_start, first, last) trios; returns True when the read is
        an unsplit artifact (poreplex/signal_analyzer.py:388-443)."""
        config = self.config
        rate = read.sampling_rate
        _ = lambda name: int(config[name] * rate)
        strict_duration = _('strict_duration')
        duration_cutoffs = [
            (_('loosen_full_length'), _('loosen_dna_length')),
            (_('strict_full_length'), _('strict_dna_length'))]

        ev = read.events
        starts = np.asarray(ev['start'], np.int64)
        ends = np.asarray(ev['end'], np.int64)

        excessive_adapters = []
        for (lo, hi), wruns in zip(windows, runs):
            for leader_start, first, last in wruns:
                adapter_end = int(ends[lo + last])
                leader_start_in_read = int(starts[lo + leader_start])
                total_duration = adapter_end - leader_start_in_read
                adapter_duration = adapter_end - starts[lo + first]
                total_cutoff, adapter_cutoff = duration_cutoffs[
                    (leader_start_in_read - payload_start) <=
                    strict_duration]

                if (total_duration >= total_cutoff and
                        adapter_duration >= adapter_cutoff):
                    excessive_adapters.append(
                        [leader_start_in_read, 1 + adapter_end])

        if not excessive_adapters:
            return False

        adapter_intervals = (
            [[0, payload_start]] + union_intervals(excessive_adapters) +
            [[np.inf, np.inf]])
        basequality_cutoff = config['basecount_quality_limit']

        pos_all = np.asarray(ev['pos'])
        qual_all = np.asarray(ev['p_model_state'])

        def count_high_quality_reads(sel):
            # per-position max of p_model_state over the selected events
            # (pandas groupby('pos').max() in the reference,
            # signal_analyzer.py:419-424); pos = cumsum(move) is
            # non-decreasing and sel is a contiguous index range, so the
            # groups are contiguous runs
            if len(sel) == 0:
                return 0
            pos = pos_all[sel]
            qual = qual_all[sel]
            starts_at = np.nonzero(
                np.concatenate([[True], pos[1:] != pos[:-1]]))[0]
            grp_max = np.maximum.reduceat(qual, starts_at)
            return int((grp_max > basequality_cutoff).sum())

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
