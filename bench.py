#!/usr/bin/env python3
"""Headline benchmark: demux + segmentation throughput (reads/s) on TPU vs
an optimized single-process CPU baseline.

The metric follows BASELINE.md's north star: reads/s through the
scaler + segmentation-Viterbi + demultiplexer path. The reference itself
cannot run here (pomegranate/keras-2018 unavailable), so the CPU baseline
re-creates its per-read cost structure with at-least-as-fast components:
TensorFlow CPU for the two Keras RNNs (exactly what the reference ran) and
the native C++ Viterbi (f64, pomegranate-class) per read.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 128
N_READS = 256
CPU_SAMPLE = 24          # CPU baseline measured on a subsample, scaled


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
    """Pipelined token-packed transport (what the analyzer uses): keeps
    `inflight` batches dispatched so wire uploads overlap compute."""
    n = len(pooled)
    hl = engine.scaler.pooled_length
    reads = [(pooled[i, :pooled_len[i]], int(pooled_len[i]),
              min(hl, int(pooled_len[i]))) for i in range(n)]
    nb = (n + BATCH - 1) // BATCH

    groups = []          # read-list slices, one per device dispatch
    rest = reads
    while rest:
        wire, cnt = engine.pack_stage1_flat(rest)
        groups.append(rest[:cnt])
        # compile + warm this flat size
        engine.collect_stage1(engine.dispatch_stage1_flat(wire))
        rest = rest[cnt:]

    def dispatch(i):
        # re-marshal each time: packing cost is part of the steady state
        wire, cnt = engine.pack_stage1_flat(groups[i % len(groups)])
        return engine.dispatch_stage1_flat(wire), cnt
    t0 = time.time()
    reps = done = 0
    pending = []
    while time.time() - t0 < 3.0 or reps < 2 * nb:
        h, cnt = dispatch(reps)
        pending.append((h, cnt))
        reps += 1
        if len(pending) >= inflight:
            h, cnt = pending.pop(0)
            engine.collect_stage1(h)
            done += cnt
    for h, cnt in pending:
        engine.collect_stage1(h)
        done += cnt
    elapsed = time.time() - t0
    return done / elapsed


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


def main():
    from poreplex_tpu.config import build_config
    from poreplex_tpu.pipeline.engine import DeviceEngine
    import tempfile

    tmp = tempfile.mkdtemp(prefix='bench-')
    config = build_config(tmp, tmp, barcoding=True, device_batch_size=BATCH)
    engine = DeviceEngine(config)
    heads, pooled, pooled_len = make_inputs(engine, N_READS)

    tpu_rps = bench_tpu(engine, pooled, pooled_len)
    try:
        cpu_rps = bench_cpu(config, heads, pooled, pooled_len)
    except Exception as exc:
        print('cpu baseline failed: {}'.format(exc), file=sys.stderr)
        cpu_rps = None

    result = {
        'metric': 'demux_segmentation_throughput',
        'value': round(tpu_rps, 2),
        'unit': 'reads/s',
        'vs_baseline': round(tpu_rps / cpu_rps, 2) if cpu_rps else None,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
