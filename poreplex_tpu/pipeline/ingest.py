"""Process-parallel PHASE A ingest.

FAST5 ingest is GIL-bound: h5py never releases the GIL (libhdf5 is not
thread-safe, so h5py serializes every call while holding it), which makes
ingest THREADS useless for parallelism — profiled on the 2-vCPU bench
host, 4 ingest threads report ~70 thread-seconds for ~6 seconds of actual
single-threaded work, all of it GIL contention stealing cycles from the
compute threads' host work. The reference solved the same problem with a
ProcessPoolExecutor around its whole worker (poreplex/pipeline.py:96); we
scope processes to PHASE A only: workers read FAST5s and return compact
numpy payloads (integer DAC signal, pooled means, basecall columns), and
everything device-facing stays in the main process with the persistent
engine.

The workers import only numpy/h5py/scipy — no JAX, no TPU client — and
are started with the 'spawn' context so they never inherit tunnel/grpc
state from the parent. Payloads are picklable dicts; per-stage wall
times measured inside the worker are merged into the main process's
StageTimer so the A:* breakdown reports true (uncontended) ingest cost.
"""

import atexit
import os
import sys
import time
import traceback

import numpy as np

# columns the pipeline consumes from an albacore 14-column Events table
# when full-table dumps are off (see analyzer._load_events, unsplit.py)
MINIMAL_EVENT_COLUMNS = ('mean', 'start', 'move', 'p_model_state')

_WCFG = None


def _init_worker(wcfg):
    global _WCFG
    _WCFG = wcfg
    os.environ.setdefault('CUDA_VISIBLE_DEVICES', '-1')


def _worker_ping():
    return os.getpid()


def load_batch_worker(reads):
    """reads: list of (fast5_filename, read_id).
    Returns (payloads, timers): one payload dict per read + the worker's
    per-stage wall seconds. Each read goes through the native C++ HDF5
    reader (fast5_native.py) when available; a ``None`` from the native
    path (guppy tables, exotic layouts, any native error) re-reads that
    read through h5py with identical semantics."""
    from .. import fast5

    cfg = _WCFG
    timers = {'A:open': 0.0, 'A:raw': 0.0, 'A:pool': 0.0, 'A:bcall': 0.0}
    # hold h5py handles open for the whole batch: _load_one closes its
    # reader per read, which would otherwise drop the pool refcount to
    # zero and reopen the multi-read file for every read
    pool = _HoldingPool()
    npool = {}
    native = None
    if cfg['event_columns'] is not None:    # full-table dumps stay on h5py
        from .. import fast5_native
        if fast5_native.get_library() is not None:
            native = fast5_native

    payloads = []
    for f5file, read_id in reads:
        p = None
        if native is not None:
            try:
                p = _load_one_native(cfg, native, npool, f5file, read_id,
                                     timers)
            except Exception:
                p = None
        if p is None:
            p = _load_one(cfg, fast5, pool, f5file, read_id, timers)
        payloads.append(p)
    for nf in npool.values():
        if nf is not None:
            nf.close()
    pool.close_all()
    return payloads, timers


class _HoldingPool:
    """Fast5FilePool variant whose release() is deferred: handles stay
    open until close_all() at the end of the batch."""

    def __init__(self):
        self._files = {}

    def open(self, path):
        f = self._files.get(path)
        if f is None:
            import h5py
            f = self._files[path] = h5py.File(path, 'r')
        return f

    def release(self, path):
        pass

    def close_all(self):
        for f in self._files.values():
            try:
                f.close()
            except Exception:
                pass
        self._files.clear()


def _load_one_native(cfg, mod, npool, f5file, read_id, timers):
    """Native-reader mirror of _load_one; returns None to request the
    h5py fallback (which also owns all error-status decisions — the
    native path only handles clean reads)."""
    clock = time.perf_counter
    path = os.path.join(cfg['inputdir'], f5file)
    if not os.path.exists(path):
        return {'filename': f5file, 'read_id': read_id,
                'status': 'disappeared'}
    nf = npool.get(path, False)
    if nf is False:
        nf = mod.NativeFast5.open(path)
        npool[path] = nf
    if nf is None:
        return None

    t0 = clock()
    nodes = nf.nodes_for(read_id)
    if nodes is None:
        return None
    raw_node, channel_node, tracking_node, signal_path, analyses_node = nodes
    meta = nf.read_meta(raw_node, channel_node, tracking_node)
    timers['A:open'] += clock() - t0
    if meta is None or (not nf.is_multiread and
                        meta['read_id'] != read_id):
        return None

    p = {'filename': f5file, 'read_id': read_id,
         'status': 'okay', 'stopped': False}
    p['meta'] = (meta['sampling_rate'], meta['duration'],
                 meta['channel_number'],
                 round(meta['start_time'] / meta['sampling_rate'], 3),
                 meta['run_id'], meta['sample_id'])

    sigload_length = min(cfg['scaler_input_length'], meta['duration'])
    sigload_length -= sigload_length % cfg['stride']
    if sigload_length < cfg['scaler_min_length']:
        p.update(status='scaler_signal_too_short', stopped=True)
        return p

    t0 = clock()
    raw = nf.read_signal(signal_path, meta['duration'])
    timers['A:raw'] += clock() - t0
    if raw is None:
        return None

    t0 = clock()
    stride = cfg['stride']
    pa = meta['range'] / meta['digitisation']
    pa_scale = np.float32(pa)
    pa_shift = np.float32(pa * meta['offset'])
    trimmed = raw[:len(raw) - len(raw) % stride]
    pooled = trimmed.reshape(-1, stride).mean(axis=1, dtype=np.float32)
    p['raw_dac'] = raw
    p['calib'] = (float(pa), float(meta['offset']))
    p['pooled'] = pooled * pa_scale + pa_shift
    p['head_len'] = min(cfg['scaler_pooled_length'], len(p['pooled']))
    timers['A:pool'] += clock() - t0

    t0 = clock()
    bcall = nf.read_basecall(analyses_node)
    timers['A:bcall'] += clock() - t0
    if bcall == 'fallback':
        return None
    p['bcall'] = bcall
    return p


def _load_one(cfg, fast5mod, pool, f5file, read_id, timers):
    """Mirror of analyzer._load_read producing a picklable payload; the
    analyzer reassembles ReadRecords from these (see
    analyzer._records_from_payloads) so both ingest paths share the
    status lattice and downstream flow."""
    clock = time.perf_counter
    path = os.path.join(cfg['inputdir'], f5file)
    if not os.path.exists(path):
        return {'filename': f5file, 'read_id': read_id,
                'status': 'disappeared'}

    p = {'filename': f5file, 'read_id': read_id,
         'status': 'okay', 'stopped': False}
    try:
        t0 = clock()
        f5 = fast5mod.Fast5Reader(path, read_id, pool=pool)
        timers['A:open'] += clock() - t0
    except Exception:
        traceback.print_exc()
        p.update(status='irregular_fast5', stopped=True)
        return p

    try:
        p['meta'] = (f5.sampling_rate, f5.duration, f5.channel_number,
                     round(f5.start_time / f5.sampling_rate, 3),
                     f5.run_id, f5.sample_id)

        sigload_length = min(cfg['scaler_input_length'], f5.duration)
        sigload_length -= sigload_length % cfg['stride']
        if sigload_length < cfg['scaler_min_length']:
            p.update(status='scaler_signal_too_short', stopped=True)
            f5.close()
            return p

        t0 = clock()
        raw = f5.get_raw_dac()
        timers['A:raw'] += clock() - t0

        t0 = clock()
        stride = cfg['stride']
        pa_scale = np.float32(f5.pa_scale)
        pa_shift = np.float32(f5.pa_scale * f5.offset)
        trimmed = raw[:len(raw) - len(raw) % stride]
        pooled = trimmed.reshape(-1, stride).mean(axis=1, dtype=np.float32)
        if raw.dtype.kind in 'iu' and raw.dtype.itemsize <= 2:
            p['raw_dac'] = raw
            p['calib'] = (float(f5.pa_scale), float(f5.offset))
        else:
            p['raw_pa'] = np.asarray(raw * pa_scale + pa_shift, np.float32)
        p['pooled'] = pooled * pa_scale + pa_shift
        p['head_len'] = min(cfg['scaler_pooled_length'], len(p['pooled']))
        timers['A:pool'] += clock() - t0

        t0 = clock()
        try:
            p['bcall'] = f5.get_basecall(columns=cfg['event_columns'])
        except Exception as exc:
            try:
                import pickle
                pickle.dumps(exc)
                p['bcall_error'] = exc
            except Exception:
                p['bcall_error'] = RuntimeError(
                    '{}: {}'.format(type(exc).__name__, exc))
        timers['A:bcall'] += clock() - t0
        f5.close()
    except Exception as exc:
        from ..utils import pack_unhandled_exception
        return {'error': pack_unhandled_exception(
            f5file, read_id, exc, sys.exc_info()[2])}
    return p


class IngestPool:
    """Spawn-context process pool dedicated to PHASE A. Callers block on
    ``load`` from a monitor thread — the GIL is released while waiting,
    so N workers ingest truly in parallel with the main process's device
    orchestration."""

    def __init__(self, config, engine, processes):
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        scaler = engine.scaler
        wcfg = dict(
            inputdir=config['inputdir'],
            stride=config['signal_processing']['rough_signal_stride'],
            scaler_input_length=scaler.input_length,
            scaler_min_length=scaler.min_length,
            scaler_pooled_length=scaler.pooled_length,
            event_columns=(None if config.get('dump_basecalls')
                           else MINIMAL_EVENT_COLUMNS),
        )
        self.processes = processes
        self._pool = ProcessPoolExecutor(
            processes, mp_context=mp.get_context('spawn'),
            initializer=_init_worker, initargs=(wcfg,))
        atexit.register(self.shutdown)

    def warm(self):
        """Prestart every worker (spawn + imports cost ~1-2s each,
        overlapped with device warmup)."""
        for f in [self._pool.submit(_worker_ping)
                  for _ in range(self.processes)]:
            f.result()

    # per-chunk read count when fanning one batch across workers: multi-
    # read bench files hold 32 reads, so 64-read chunks span ~2 files and
    # workers rarely open the same file twice
    CHUNK_READS = 64

    def load(self, reads):
        """Run one batch's PHASE A fanned across the worker pool; blocks
        (GIL released). Chunking one batch over every idle worker cuts
        the batch's ingest LATENCY ~Nx (ingest is on the session's
        critical path at the start of a run and for the last batches),
        while the executor's FIFO order still drains older batches'
        chunks first when several batches are in flight."""
        if len(reads) <= self.CHUNK_READS or self.processes <= 1:
            return self._pool.submit(load_batch_worker, reads).result()
        step = max(self.CHUNK_READS,
                   -(-len(reads) // self.processes))
        futures = [self._pool.submit(load_batch_worker,
                                     reads[lo:lo + step])
                   for lo in range(0, len(reads), step)]
        payloads = []
        timers = {}
        for f in futures:
            p, t = f.result()
            payloads.extend(p)
            for name, secs in t.items():
                timers[name] = timers.get(name, 0.0) + secs
        return payloads, timers

    def shutdown(self):
        pool, self._pool = self._pool, None
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)
