"""Per-launch cost probe on the real TPU: times each production program
family (stage-1 flat, poly(A) fused round at several bucket/row shapes,
unsplit decode) warm, dispatch->ready, plus bare upload/download, to
locate where the e2e device_busy seconds go. Results are weather-dependent
(tunnel); use medians and compare within one run."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps=5):
    s = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        s.append(time.perf_counter() - t0)
    s.sort()
    return {'min_ms': round(s[0] * 1e3, 1),
            'med_ms': round(s[len(s) // 2] * 1e3, 1)}


def main():
    import jax
    import jax.numpy as jnp
    import tempfile
    from poreplex_tpu.config import build_config
    from poreplex_tpu.pipeline.engine import DeviceEngine
    from poreplex_tpu.pipeline.polya import PolyaAnalyzer, _BUCKET_ROWS
    from poreplex_tpu.pipeline.unsplit import UnsplitReadDetector
    from poreplex_tpu.ops import polya_round as round_ops

    print('devices:', jax.devices())
    tmp = tempfile.mkdtemp(prefix='probe-')
    config = build_config(tmp, tmp, barcoding=True, device_batch_size=256)

    # --- bare wire ---
    up4 = np.random.randint(0, 1000, 1 << 21).astype(np.uint16)  # 4MB
    h = jnp.asarray(up4)
    h.block_until_ready()
    print('upload 4MB u16   ', timeit(lambda: jnp.asarray(up4).block_until_ready()))
    big = jnp.zeros((1 << 18,), jnp.float32)  # 1MB download
    big.block_until_ready()
    print('download 1MB f32 ', timeit(lambda: np.asarray(big + 1.0)))
    tiny = jnp.zeros((128,), jnp.float32)
    np.asarray(tiny)
    print('download 512B    ', timeit(lambda: np.asarray(tiny + 1.0)))

    # --- stage-1 flat ---
    engine = DeviceEngine(config)
    rng = np.random.RandomState(0)
    reads = []
    for i in range(256):
        L = int(rng.uniform(2000, engine.seg_frames))
        reads.append((rng.normal(90, 12, L).astype(np.float32), L,
                      min(2000, L)))
    wire, n = engine.pack_stage1_flat(reads)
    engine.collect_stage1(engine.dispatch_stage1_flat(wire))
    print('stage1 flat B=256', timeit(
        lambda: engine.collect_stage1(engine.dispatch_stage1_flat(wire)),
        reps=4), 'n=', n)

    # --- polya rounds at the production shapes ---
    pa = PolyaAnalyzer(config['polya_dwell'], use_pallas=True,
                       platform='tpu')
    kw = pa._kernel_kwargs
    for size_log, blen in ((21, 8192), (21, 16384), (21, 32768),
                           (19, 8192)):
        size = 1 << size_log
        rows = _BUCKET_ROWS[blen][-1]
        stream = np.random.randint(0, 800, size).astype(np.uint16)
        meta = np.zeros((rows, round_ops.META_COLS), np.float32)
        meta[:, 6] = 1.0
        for r in range(rows):
            meta[r, 0] = (r * blen) % max(1, size - blen)
            meta[r, 1] = blen
            meta[r, 3:5] = (100.0, 118.0)
            meta[r, 5:7] = (60.0, 0.002)

        def run(stream=stream, meta=meta, blen=blen):
            out = round_ops.polya_round(jnp.asarray(stream),
                                        jnp.asarray(meta), blen=blen, **kw)
            return [np.asarray(h) for h in out]

        arrs = run()
        print('polya stream=2^{} blen={:6d} rows={:3d} out={}MB'.format(
            size_log, blen, rows,
            round(sum(a.nbytes for a in arrs) / 1e6, 2)),
            timeit(run, reps=4))

    # --- unsplit decode ---
    det = UnsplitReadDetector(config, engine.unsplitmodel, batch_rows=256,
                              use_pallas=True, platform='tpu')
    stream = np.random.normal(90, 15, det.STREAM_SIZE).astype(np.float32)
    meta = np.zeros((det.rows, 2), np.int32)
    for r in range(det.rows):
        meta[r] = ((r * 64) % (det.STREAM_SIZE - 128), 100)
    for emax in (128,):
        def run(emax=emax):
            return np.asarray(det._decode_runs(jnp.asarray(stream),
                                               jnp.asarray(meta), emax=emax))
        arr = run()
        print('unsplit rows={} emax={} out={}KB'.format(
            det.rows, emax, round(arr.nbytes / 1e3, 1)),
            timeit(run, reps=4))


def probe_components():
    """Time the fused round's pieces at round-1 shape [256, 8192]."""
    import jax
    import jax.numpy as jnp
    from poreplex_tpu.ops import event_detection as ed
    from poreplex_tpu.ops import polya_round as ro
    from poreplex_tpu.ops.pallas_event_detection import detect_peaks
    from poreplex_tpu.ops.pallas_polya_dp import dp_pallas_core

    rng = np.random.RandomState(0)
    R, T = 256, 8192
    sig = rng.normal(100, 2, (R, T)).astype(np.float32)
    lens = np.full(R, T, np.int32)
    sig_d, lens_d = jnp.asarray(sig), jnp.asarray(lens)

    med = jax.jit(lambda s: ro._medfilt_batch(s, 5))
    np.asarray(med(sig_d))
    print('medfilt [256,8192]      ',
          timeit(lambda: med(sig_d).block_until_ready(), reps=5))

    cs = jax.jit(lambda s, l: ed._centered_cumsums(s, l))
    _c, c1, c2 = cs(sig_d, lens_d)
    print('cumsums                 ',
          timeit(lambda: jax.block_until_ready(cs(sig_d, lens_d)), reps=5))

    t1 = jax.jit(lambda c, cc, l: ed.compute_tstat(c, cc, l, 7))(
        c1, c2, lens_d)
    t2 = jax.jit(lambda c, cc, l: ed.compute_tstat(c, cc, l, 20))(
        c1, c2, lens_d)
    jax.block_until_ready((t1, t2))

    pk = lambda: jax.block_until_ready(detect_peaks(
        t1, t2, lens_d, 4.3, 2.6, 7, 20, 1.0))
    pk()
    print('pallas detect_peaks     ', timeit(pk, reps=5))

    ev = jax.jit(functools.partial(
        ed.detect_events_core, window_length1=7, window_length2=20,
        threshold1=4.3, threshold2=2.6, peak_height=1.0, max_peaks=1023,
        use_pallas=True, return_cumsums=True))
    jax.block_until_ready(ev(sig_d, lens_d))
    print('detect_events_core full ',
          timeit(lambda: jax.block_until_ready(ev(sig_d, lens_d)), reps=5))

    P = 1024
    is_p = jnp.asarray(rng.uniform(size=(2 * R, P)) < 0.9)
    lengths = jnp.asarray(rng.uniform(1, 30, (2 * R, P)).astype(np.float32))
    nev = jnp.full(2 * R, P, jnp.int32)
    dpf = jax.jit(lambda a, b, c: dp_pallas_core(a, b, c, 1.5, 16))
    jax.block_until_ready(dpf(is_p, lengths, nev))
    print('pallas dp [512,1024]    ',
          timeit(lambda: jax.block_until_ready(dpf(is_p, lengths, nev)),
                 reps=5))


import functools
if __name__ == '__main__':
    if os.environ.get('PROBE_COMPONENTS'):
        probe_components()
    else:
        main()
