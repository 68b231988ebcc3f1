#!/usr/bin/env python3
"""Headline benchmark: demux + segmentation throughput (reads/s) on TPU vs
an optimized single-process CPU baseline, plus a full end-to-end session
measurement (FAST5 directory -> all outputs, poly(A) + unsplit enabled).

The headline metric follows BASELINE.md's north star: reads/s through the
scaler + segmentation-Viterbi + demultiplexer path. The reference itself
cannot run here (pomegranate/keras-2018 unavailable), so the CPU baseline
re-creates its per-read cost structure with at-least-as-fast components:
TensorFlow CPU for the two Keras RNNs (exactly what the reference ran) and
the native C++ Viterbi (f64, pomegranate-class) per read.

The e2e measurement runs the real ProcessingSession over a synthetic
fixture directory with every analysis stage enabled and reports reads/s
plus the per-stage wall-time breakdown (ingest vs device vs writers), the
host-I/O-throughput risk SURVEY.md §7.3 flags.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "e2e"}.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import traceback

import numpy as np

BATCH = 256      # device rows: sequential scans (LSTM/Viterbi) amortize
                 # per-step overhead across lanes — measured stage-1
                 # device ceilings 1984 (B=128) / 2553 (B=256) reads/s
N_READS = 512
CPU_SAMPLE = 24          # CPU baseline measured on a subsample, scaled
E2E_READS = 2048
E2E_READS_PER_FILE = 32  # multi-read FAST5 packing of the fixture set
STAGE1_REPS = 3          # tunnel variance is +-15-25%: report median+spread
E2E_REPS = 4             # rep 1 is systematically slowest (first-touch
                         # effects on the tunnel); it is recorded in the
                         # spread but excluded from the median


def _spread(samples):
    """{median, min, max, reps} for a list of throughput samples."""
    s = sorted(samples)
    return {'median': s[len(s) // 2] if len(s) % 2 else
            round((s[len(s) // 2 - 1] + s[len(s) // 2]) / 2, 2),
            'min': s[0], 'max': s[-1], 'reps': samples}


def make_inputs(engine, n_reads, seed=7):
    rng = np.random.RandomState(seed)
    frames = engine.seg_frames
    pooled = np.zeros((n_reads, frames), np.float32)
    pooled_len = np.zeros(n_reads, np.int32)
    for i in range(n_reads):
        # realistic read-length mix: 30k..100k raw samples (2k..6.6k frames)
        L = int(rng.uniform(2000, frames))
        layout = [(71.5, 3.7, int(L * 0.03)), (102.1, 3.9, int(L * 0.02)),
                  (112.0, 4.8, int(L * 0.02)), (80.5, 7.4, int(L * 0.25)),
                  (108.95, 2.5, int(L * 0.12))]
        used = sum(n for _, _, n in layout)
        layout.append((96.0, 11.0, L - used))
        sig = np.concatenate([rng.normal(m, s, n) for m, s, n in layout])
        pooled[i, :len(sig)] = sig
        pooled_len[i] = len(sig)
    heads = pooled[:, :engine.scaler.pooled_length].copy()
    return heads, pooled, pooled_len


def bench_tpu(engine, pooled, pooled_len, inflight=4):
    """Pipelined token-packed transport, production-shaped: dispatches
    from the main thread while a PUMP thread awaits results (over the
    tunnel, dispatched computations only progress while something awaits
    them — exactly how the analyzer drives stage-1). inflight=4 measured
    best (2 underfeeds the pipeline, 8 degrades the tunnel queue)."""
    import queue
    import threading

    n = len(pooled)
    hl = engine.scaler.pooled_length
    reads = [(pooled[i, :pooled_len[i]], int(pooled_len[i]),
              min(hl, int(pooled_len[i]))) for i in range(n)]

    groups = []          # read-list slices, one per device dispatch
    rest = reads
    while rest:
        wire, cnt = engine.pack_stage1_flat(rest)
        groups.append(rest[:cnt])
        # compile + warm this flat size
        engine.collect_stage1(engine.dispatch_stage1_flat(wire))
        rest = rest[cnt:]

    samples = []
    for _ in range(STAGE1_REPS):
        q = queue.Queue()
        done = [0]

        def pump():
            try:
                while True:
                    item = q.get()
                    if item is None:
                        return
                    h, cnt = item
                    engine.collect_stage1(h)
                    done[0] += cnt
            except Exception as exc:     # surface instead of hanging the
                done.append(exc)         # dispatch loop below

        th = threading.Thread(target=pump)
        th.start()
        t0 = time.time()
        i = 0
        while time.time() - t0 < 3.0 or i < 2 * len(groups):
            while q.qsize() >= inflight and th.is_alive():
                time.sleep(0.001)
            if not th.is_alive():
                raise RuntimeError('stage-1 pump died: {}'.format(
                    done[1] if len(done) > 1 else 'unknown'))
            # re-marshal each time: packing cost is part of steady state
            wire, cnt = engine.pack_stage1_flat(groups[i % len(groups)])
            q.put((engine.dispatch_stage1_flat(wire), cnt))
            i += 1
        q.put(None)
        th.join()
        samples.append(round(done[0] / (time.time() - t0), 2))
    return _spread(samples)


def bench_cpu(config, heads, pooled, pooled_len):
    """Single-process CPU cost of the same work, reference-style
    (per-read Cython-class Viterbi + TF keras batch predicts)."""
    os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
    os.environ.setdefault('CUDA_VISIBLE_DEVICES', '-1')
    import tensorflow as tf
    from poreplex_tpu.refimpl.hmm import build_hmm_arrays
    from poreplex_tpu import native

    n = CPU_SAMPLE
    d_sc = np.load(config['signal_processing']['scaler_model'])
    d_dm = np.load(config['demultiplexing']['demux_model'])

    scaler = tf.keras.Sequential([
        tf.keras.layers.Input((2000, 1)),
        tf.keras.layers.LSTM(48, return_sequences=True),
        tf.keras.layers.LSTM(48), tf.keras.layers.Dense(2)])
    scaler.layers[0].set_weights([d_sc['lstm1/kernel'],
                                  d_sc['lstm1/recurrent'], d_sc['lstm1/bias']])
    scaler.layers[1].set_weights([d_sc['lstm2/kernel'],
                                  d_sc['lstm2/recurrent'], d_sc['lstm2/bias']])
    scaler.layers[2].set_weights([d_sc['dense/kernel'], d_sc['dense/bias']])

    demux = tf.keras.Sequential([
        tf.keras.layers.Input((300, 1)),
        tf.keras.layers.Bidirectional(
            tf.keras.layers.LSTM(48, return_sequences=True), 'concat'),
        tf.keras.layers.LSTM(64),
        tf.keras.layers.Dense(5, activation='softmax')])
    demux.layers[0].forward_layer.set_weights(
        [d_dm['bilstm_fwd/kernel'], d_dm['bilstm_fwd/recurrent'],
         d_dm['bilstm_fwd/bias']])
    demux.layers[0].backward_layer.set_weights(
        [d_dm['bilstm_bwd/kernel'], d_dm['bilstm_bwd/recurrent'],
         d_dm['bilstm_bwd/bias']])
    demux.layers[1].set_weights([d_dm['lstm2/kernel'],
                                 d_dm['lstm2/recurrent'], d_dm['lstm2/bias']])
    demux.layers[2].set_weights([d_dm['dense/kernel'], d_dm['dense/bias']])

    names, ls, lt, mu, sg, lw = build_hmm_arrays(config['segmentation_model'])

    # warm TF graphs
    scaler.predict(heads[:2, :, None], verbose=0)
    demux.predict(np.zeros((2, 300, 1), np.float32), verbose=0)

    t0 = time.time()
    scaler.predict(heads[:n, :, None], batch_size=512, verbose=0)
    for i in range(n):
        sig = pooled[i, :pooled_len[i]]
        scaled = sig * 0.95 + 5.0
        native.viterbi(scaled, ls, lt, mu, sg, lw)
    windows = np.zeros((n, 300), np.float32)
    for i in range(n):
        w = pooled[i, :300]
        med = np.median(w)
        mad = np.median(np.abs(w - med))
        windows[i] = (w - med) / max(0.01, mad * 1.4826)
    demux.predict(windows[:, :, None], batch_size=128, verbose=0)
    elapsed = time.time() - t0
    return n / elapsed


def make_e2e_fixtures(indir, n_reads, seed=11):
    """Synthetic multi-read FAST5 fixture set with a realistic read mix:
    varying transcript/poly(A)/adapter durations, occasional spiky tails,
    and ~1% pseudo-fusion reads (README.md:213-214 prevalence)."""
    from poreplex_tpu import simulate
    rng = np.random.RandomState(seed)
    written = 0
    fileno = 0
    while written < n_reads:
        count = min(E2E_READS_PER_FILE, n_reads - written)
        reads = []
        for _ in range(count):
            kw = dict(
                transcript_len=int(rng.uniform(4000, 26000)),
                polya_len=int(rng.uniform(900, 4200)),
                adapter_len=int(rng.uniform(4200, 6500)),
                polya_spikes=int(rng.uniform(0, 3)),
            )
            if rng.uniform() < 0.01:
                kw['extra_adapter_at'] = rng.uniform(0.3, 0.7)
            reads.append(simulate.simulate_read(rng, **kw))
        simulate.write_multi_read_fast5(
            os.path.join(indir, 'batch{:04d}.fast5'.format(fileno)),
            reads)
        written += count
        fileno += 1
    return written


def cached_e2e_fixtures(n_reads, seed=11):
    """Reuse the synthetic fixture set across bench invocations: writing
    2048 multi-read FAST5s costs 30-45s of host CPU per run and the set is
    deterministic in (n_reads, seed)."""
    # v2: simulate ids became rng-derived (deterministic), changing the
    # fixture content for a given (n_reads, seed)
    indir = os.path.join(tempfile.gettempdir(),
                         'pptpu-bench-fixtures-v2-{}-{}'.format(
                             n_reads, seed))
    marker = os.path.join(indir, '.complete')
    if os.path.exists(marker):
        return indir, 0.0
    shutil.rmtree(indir, ignore_errors=True)
    os.makedirs(indir)
    t0 = time.time()
    make_e2e_fixtures(indir, n_reads, seed=seed)
    with open(marker, 'w') as f:
        f.write(str(n_reads))
    return indir, time.time() - t0


def bench_e2e(n_reads, reps=E2E_REPS, batch=None, compute_threads=None,
              chunk=None):
    """Full-session throughput: FAST5 dir -> FASTQ + summary + counts with
    barcoding, poly(A), unsplit filtering and adapter trim all enabled.
    EVERY device-program shape is compiled up front (config prewarm +
    analyzer.warmup) and the first file's reads are run once more through
    the real path, so the timed number is pure steady state — no XLA
    compilation lands inside the measured window or the stage breakdown."""
    import logging
    from poreplex_tpu.config import build_config
    from poreplex_tpu.pipeline.analyzer import get_analyzer
    from poreplex_tpu.pipeline.session import ProcessingSession
    from poreplex_tpu.fast5 import get_read_ids
    from poreplex_tpu.utils.profiling import GLOBAL_TIMER, WIRE

    indir = None
    outdir = tempfile.mkdtemp(prefix='bench-e2e-out-')
    try:
        indir, fixture_s = cached_e2e_fixtures(n_reads)
        n_written = n_reads

        batch = batch or BATCH
        config = build_config(indir, outdir, barcoding=True,
                              measure_polya=True, filter_unsplit_reads=True,
                              trim_adapter=True, quiet=True, prewarm=True,
                              parallel=4,      # ingest workers (-p 4)
                              batch_chunk_size=batch,
                              device_batch_size=batch)
        if compute_threads:
            config['compute_threads'] = int(compute_threads)
        if chunk:
            # session batch size decoupled from the device batch: bigger
            # waves amortize per-batch fixed costs over the same
            # compiled shapes (stage-1 sub-batches internally)
            config['batch_chunk_size'] = int(chunk)
        logger = logging.getLogger('bench-e2e')
        logger.addHandler(logging.NullHandler())
        logger.propagate = False

        # compile every shape + exercise the full real path once, through
        # the same analyzer instance the session will reuse (get_analyzer
        # caches on this config object)
        t0 = time.time()
        analyzer = get_analyzer(config)
        firstfile = sorted(f for f in os.listdir(indir)
                           if f.endswith(".fast5"))[0]
        warm_entries = list(get_read_ids(firstfile, indir))[:batch]
        analyzer.process_batch(-1, warm_entries)
        warm_s = time.time() - t0

        # repeated timed sessions (each into a fresh outdir): tunnel and
        # host-CPU variance is +-15-25%, so a single sample cannot support
        # round-over-round comparisons (VERDICT r3 weak-3)
        samples = []
        last_elapsed = None
        for rep in range(reps):
            rep_out = tempfile.mkdtemp(prefix='bench-e2e-rep-')
            try:
                config['outputdir'] = rep_out
                config['tmpdir'] = os.path.join(rep_out, 'tmp')
                with GLOBAL_TIMER.lock:
                    GLOBAL_TIMER.totals.clear()
                    GLOBAL_TIMER.counts.clear()
                WIRE.clear()
                t0 = time.time()
                printer = ProcessingSession.run(config, logger)
                elapsed = time.time() - t0
                if printer is None:
                    raise RuntimeError('e2e session did not finish cleanly')
                samples.append(round(n_written / elapsed, 2))
                last_elapsed = elapsed
            finally:
                shutil.rmtree(rep_out, ignore_errors=True)

        # stage breakdown from the LAST rep (steady state, post-warm);
        # the first rep is recorded but excluded from the median (it is
        # systematically the slowest: tunnel/server first-touch effects)
        snap = GLOBAL_TIMER.snapshot()
        spread = _spread(samples[1:] if len(samples) > 2 else samples)
        spread['reps'] = samples
        # device-utilization + wire accounting from the LAST rep: awaited
        # dispatch->ready interval unions (the chip only progresses while
        # awaited over the tunnel) and bytes moved, per program family —
        # proves where the non-host share of the wall goes (VERDICT r4 #3)
        device = WIRE.snapshot()
        if last_elapsed:
            device['wall_s'] = round(last_elapsed, 2)
            device['device_busy_frac'] = round(
                device['device_busy_s'] / last_elapsed, 3)
        return {
            'reads_per_s': spread['median'],
            'spread': spread,
            'n_reads': n_written,
            'wall_s': round(n_written / spread['median'], 2),
            'fixture_gen_s': round(fixture_s, 2),
            'warmup_s': round(warm_s, 2),
            'stage_wall_s': {name: row['total_s']
                             for name, row in snap.items()},
            'stage_calls': {name: row['calls'] for name, row in snap.items()},
            'device': device,
        }
    finally:
        # indir is the shared fixture cache — only the outputs are scratch
        shutil.rmtree(outdir, ignore_errors=True)


def bench_e2e_cpu(n_reads):
    """The SAME full session pinned to the CPU backend in a subprocess
    with the TPU plugin scrubbed from the environment — the honest
    end-to-end chip-vs-CPU comparison (VERDICT r2 §missing-1/weak-3)."""
    import subprocess
    env = {k: v for k, v in os.environ.items()
           if k not in ('PJRT_LIBRARY_PATH', 'TPU_LIBRARY_PATH') and
           not k.startswith(('AXON_', 'TPU_', 'PALLAS_AXON_'))}
    env['JAX_PLATFORMS'] = 'cpu'
    # the CPU side runs ITS best-measured batch size (128; 256 measured
    # 23.9 vs 35.4 reads/s on the 2-vCPU host) so vs_cpu compares each
    # platform at its own best configuration
    # 3 reps so the CPU side ALSO drops its first (cold) rep from the
    # median, matching the TPU side's rule
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--e2e-cpu-child',
         '--e2e-reads', str(n_reads), '--e2e-reps', '3',
         '--e2e-batch', '128'],
        env=env, capture_output=True, timeout=3000)
    if out.returncode != 0:
        raise RuntimeError('cpu e2e child failed: ' +
                           out.stderr.decode()[-1000:])
    return json.loads(out.stdout.decode().strip().splitlines()[-1])


def bench_scaling_cpu(n_files=32):
    """Multi-host scaling-efficiency proxy (BASELINE.md target: >= 80%
    at 2 hosts; real multi-host cannot run here): the SAME full session
    run by 1 process vs 2 jax.distributed processes on the CPU backend
    over one fixture set, each "host" pinned to its own CPU core so the
    number measures framework scaling (CRC32 entry ownership, count
    allreduce, host-0 merge) rather than oversubscription of the shared
    2-vCPU box. efficiency = t1 / (2 * max(t2)); compiles excluded via
    prewarm inside each worker before its timed session."""
    import subprocess
    indir_full, _ = cached_e2e_fixtures(E2E_READS)
    files = sorted(f for f in os.listdir(indir_full)
                   if f.endswith('.fast5'))[:n_files]
    n_reads = 0
    indir = tempfile.mkdtemp(prefix='bench-scale-in-')
    from poreplex_tpu.fast5 import get_read_ids
    for f in files:
        os.symlink(os.path.join(indir_full, f), os.path.join(indir, f))
        n_reads += len(get_read_ids(f, indir_full))
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'tests', 'dist_session_worker.py')
    env_base = {k: v for k, v in os.environ.items()
                if k not in ('PJRT_LIBRARY_PATH', 'TPU_LIBRARY_PATH') and
                not k.startswith(('AXON_', 'TPU_', 'PALLAS_AXON_'))}
    env_base['PPTPU_PREWARM'] = '1'
    ncpu = os.cpu_count() or 1

    def run(nprocs, port):
        tmpd = tempfile.mkdtemp(prefix='bench-scale-out-')
        try:
            procs = []
            for rank in range(nprocs):
                env = dict(env_base)
                env['PPTPU_CPU_AFFINITY'] = str(rank % ncpu)
                procs.append((subprocess.Popen(
                    [sys.executable, worker, str(rank), str(nprocs), port,
                     indir, os.path.join(tmpd, 'r{}'.format(rank)),
                     os.path.join(tmpd, 'res{}.json'.format(rank))],
                    env=env, stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL),
                    os.path.join(tmpd, 'res{}.json'.format(rank))))
            times = []
            for p, res in procs:
                if p.wait(timeout=1800) != 0:
                    raise RuntimeError('scaling worker failed '
                                       '(rc={})'.format(p.returncode))
                with open(res) as f:
                    times.append(json.load(f)['session_s'])
            return max(times)
        finally:
            shutil.rmtree(tmpd, ignore_errors=True)

    try:
        # one UNTIMED warm pass per configuration first: the timed reps
        # then all start from identical state (page cache for the fixture
        # files, .pyc, OS scheduler history) — the r4 capture's t1 reps
        # swung 13.7 vs 15.1 s without this, enough to push the ratio
        # over 1.0 on its own. Then >=3 paired reps, median + spread.
        run(1, '29529')
        run(2, '29530')
        effs, t1s, t2s = [], [], []
        for rep in range(3):
            t1 = run(1, '2953{}'.format(1 + 2 * rep))
            t2 = run(2, '2953{}'.format(2 + 2 * rep))
            t1s.append(round(t1, 2))
            t2s.append(round(t2, 2))
            effs.append(round(t1 / (2 * t2), 3))
    finally:
        shutil.rmtree(indir, ignore_errors=True)
    med = sorted(effs)[len(effs) // 2]
    return {'t1_s': t1s, 't2_s': t2s,
            # an efficiency > 1.0 would mean the 1-proc baseline was
            # mismeasured, not that scaling is superlinear: cap the CLAIM
            # and keep the raw reps alongside for scrutiny
            'efficiency': min(1.0, med),
            'efficiency_median_raw': med,
            'efficiency_reps': effs,
            'n_reads': n_reads, 'hosts': 2, 'cpus_per_host': 1}


def _attempt(fn, name, tries=2):
    """Run a bench section with one retry: the tunnel-attached TPU
    occasionally drops a whole section (FailedPrecondition on tunnel
    hiccups), and a null in the driver capture costs a round of signal.
    The retry also benefits from any server-side compile-cache warmup the
    failed attempt did."""
    for i in range(tries):
        try:
            return fn()
        except Exception as exc:
            traceback.print_exc()
            print('{} attempt {}/{} failed: {}'.format(name, i + 1, tries,
                                                       exc),
                  file=sys.stderr)
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--skip-e2e', action='store_true')
    parser.add_argument('--skip-stage1', action='store_true')
    parser.add_argument('--skip-e2e-cpu', action='store_true')
    parser.add_argument('--e2e-reads', type=int, default=E2E_READS)
    parser.add_argument('--e2e-reps', type=int, default=E2E_REPS)
    parser.add_argument('--e2e-batch', type=int, default=None)
    parser.add_argument('--e2e-threads', type=int, default=None)
    parser.add_argument('--e2e-chunk', type=int, default=None)
    parser.add_argument('--e2e-cpu-reads', type=int, default=E2E_READS // 4)
    parser.add_argument('--skip-scaling', action='store_true')
    parser.add_argument('--e2e-cpu-child', action='store_true',
                        help=argparse.SUPPRESS)
    args = parser.parse_args()

    if args.e2e_cpu_child:
        # child process: pin everything to CPU, run the session, emit JSON
        import jax
        jax.config.update('jax_default_device', jax.devices('cpu')[0])
        print(json.dumps(bench_e2e(args.e2e_reads, reps=args.e2e_reps,
                                   batch=args.e2e_batch)))
        return

    # the scaling proxy runs FIRST: it spawns pinned-CPU subprocesses and
    # is sensitive to the parent's residual load (jax/TPU client + TF
    # thread pools measured it ~0.2 lower when run last)
    scaling = None
    if not args.skip_scaling:
        scaling = _attempt(bench_scaling_cpu, 'scaling bench')

    from poreplex_tpu.config import build_config
    from poreplex_tpu.pipeline.engine import DeviceEngine

    tpu_rps = cpu_rps = None
    if not args.skip_stage1:
        tmp = tempfile.mkdtemp(prefix='bench-')
        config = build_config(tmp, tmp, barcoding=True,
                              device_batch_size=BATCH)
        engine = DeviceEngine(config)
        heads, pooled, pooled_len = make_inputs(engine, N_READS)

        tpu_rps = _attempt(
            lambda: bench_tpu(engine, pooled, pooled_len), 'stage1 bench')
        cpu_rps = _attempt(
            lambda: bench_cpu(config, heads, pooled, pooled_len),
            'cpu baseline')

    e2e = None
    if not args.skip_e2e:
        e2e = _attempt(
            lambda: bench_e2e(args.e2e_reads, reps=args.e2e_reps,
                              batch=args.e2e_batch,
                              compute_threads=args.e2e_threads,
                              chunk=args.e2e_chunk),
            'e2e bench')

    if e2e is not None and not args.skip_e2e_cpu:
        cpu_e2e = _attempt(lambda: bench_e2e_cpu(args.e2e_cpu_reads),
                           'cpu e2e')
        if cpu_e2e is not None:
            e2e['cpu_reads_per_s'] = cpu_e2e['reads_per_s']
            e2e['cpu_n_reads'] = cpu_e2e['n_reads']
            e2e['vs_cpu'] = round(e2e['reads_per_s'] /
                                  cpu_e2e['reads_per_s'], 2)

    result = {
        'metric': 'demux_segmentation_throughput',
        'value': tpu_rps['median'] if tpu_rps else None,
        'unit': 'reads/s',
        'vs_baseline': (round(tpu_rps['median'] / cpu_rps, 2)
                        if tpu_rps and cpu_rps else None),
        'stage1': tpu_rps,
        'e2e': e2e,
        'scaling_cpu_2proc': scaling,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
