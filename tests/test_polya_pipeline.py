"""Batched poly(A) orchestration (pipeline/polya.py) vs the sequential
recursive oracle (refimpl/polya_analyzer.py) on simulated reads covering
plain tails, spiky tails, open-ended extension, and shifted signals."""

import numpy as np
import pytest

from poreplex_tpu.config import load_preset
from poreplex_tpu.pipeline.polya import PolyaAnalyzer
from poreplex_tpu.refimpl.polya_analyzer import PolyaOracle

STRIDE = 15
RATE = 3012.0


class FakeRead:
    def __init__(self, scaled_raw):
        self.scaled_raw = np.asarray(scaled_raw, np.float32)
        self.sampling_rate = RATE
        self.polya = None

    def set_polya_tail(self, info):
        self.polya = info


def build_signal(rng, adapter_len=4000, polya_len=2500, tail_level=108.95,
                 spikes=0, transcript_len=6000):
    parts = [rng.normal(80.5, 7.4, adapter_len)]
    tail = rng.normal(tail_level, 1.8, polya_len)
    for _ in range(spikes):
        at = rng.randint(polya_len // 4, 3 * polya_len // 4)
        w = rng.randint(25, 70)
        tail[at:at + w] -= 24.0
    parts.append(tail)
    parts.append(np.repeat(rng.normal(96, 11, transcript_len // 35 + 1), 35)
                 [:transcript_len] + rng.normal(0, 2, transcript_len))
    return np.concatenate(parts).astype(np.float32)


def rough_range_for(adapter_len, polya_len, with_end=True):
    begin = adapter_len // STRIDE
    if not with_end:
        return (begin, None)
    return (begin, (adapter_len + polya_len) // STRIDE)


@pytest.fixture(scope='module')
def polya_config():
    return load_preset()['polya_dwell']


@pytest.mark.parametrize('case', [
    dict(seed=0, spikes=0),
    dict(seed=1, spikes=2),
    dict(seed=2, spikes=0, polya_len=900),
    dict(seed=3, spikes=1, polya_len=5000),          # long tail
    dict(seed=4, spikes=0, tail_level=100.0),        # shifted level
    dict(seed=5, spikes=0, with_end=False),          # no rough end
    dict(seed=6, spikes=3, polya_len=3500),
])
def test_batch_matches_oracle(polya_config, case):
    case = dict(case)
    seed = case.pop('seed')
    with_end = case.pop('with_end', True)
    rng = np.random.RandomState(seed)
    adapter_len = case.pop('adapter_len', 4000)
    polya_len = case.get('polya_len', 2500)
    sig = build_signal(rng, adapter_len=adapter_len, **case)
    rough = rough_range_for(adapter_len, polya_len, with_end)

    read = FakeRead(sig)
    analyzer = PolyaAnalyzer(polya_config)
    analyzer.process_batch([(read, rough)], STRIDE)

    oracle = PolyaOracle(polya_config)
    oracle(sig, RATE, rough, STRIDE)

    if oracle.result is None:
        assert read.polya is None, (
            'batch found a tail the oracle did not: {}'.format(read.polya))
        return
    assert read.polya is not None, 'oracle found a tail, batch did not'
    assert read.polya['begin'] == oracle.result['begin']
    assert read.polya['end'] == oracle.result['end']
    assert abs(read.polya['dwell_time'] -
               oracle.result['dwell_time']) < 1e-6
    assert len(read.polya['spikes']) == len(oracle.result['spikes'])
    for got, exp in zip(read.polya['spikes'], oracle.result['spikes']):
        assert got[0] == exp[0]
        np.testing.assert_allclose(got[1:], exp[1:], atol=1e-3)


@pytest.mark.parametrize('case', [
    # rough end massively underestimated: the open-end extension chain
    # must run far past the speculation depth (window grows by 1000
    # samples per depth -> ~8 extensions to cover the tail)
    dict(seed=20, polya_len=9000, rough_end_at=1500),
    dict(seed=21, polya_len=12000, rough_end_at=1200, spikes=2),
    # shifted level + underestimated end: recalibration (range change)
    # must interrupt the speculative chain and continue in real rounds
    dict(seed=22, polya_len=8000, rough_end_at=1500, tail_level=100.0),
])
def test_extension_chains_match_oracle(polya_config, case):
    case = dict(case)
    seed = case.pop('seed')
    rough_end_at = case.pop('rough_end_at')
    rng = np.random.RandomState(seed)
    adapter_len = 4000
    sig = build_signal(rng, adapter_len=adapter_len, **case)
    rough = (adapter_len // STRIDE, (adapter_len + rough_end_at) // STRIDE)

    read = FakeRead(sig)
    analyzer = PolyaAnalyzer(polya_config)
    analyzer.process_batch([(read, rough)], STRIDE)

    oracle = PolyaOracle(polya_config)
    oracle(sig, RATE, rough, STRIDE)

    if oracle.result is None:
        assert read.polya is None
    else:
        assert read.polya is not None
        assert read.polya['begin'] == oracle.result['begin']
        assert read.polya['end'] == oracle.result['end']
        assert abs(read.polya['dwell_time'] -
                   oracle.result['dwell_time']) < 1e-6
        assert len(read.polya['spikes']) == len(oracle.result['spikes'])


def test_spike_overflow_fallback_matches_oracle(polya_config, monkeypatch):
    """With the spike table shrunk to 2 slots, a spiky tail must take the
    host fallback (standalone detection kernel + quantizer round-trip)
    and still reproduce the oracle's spike tuples exactly."""
    from poreplex_tpu.pipeline import polya as polya_mod
    monkeypatch.setattr(polya_mod, '_MAX_SPIKES', 2)

    rng = np.random.RandomState(33)
    sig = build_signal(rng, polya_len=3500, spikes=3)
    rough = rough_range_for(4000, 3500)
    read = FakeRead(sig)
    analyzer = PolyaAnalyzer(polya_config)
    analyzer.process_batch([(read, rough)], STRIDE)

    oracle = PolyaOracle(polya_config)
    oracle(sig, RATE, rough, STRIDE)
    if oracle.result is None:
        assert read.polya is None
        return
    assert read.polya is not None
    assert read.polya['begin'] == oracle.result['begin']
    assert read.polya['end'] == oracle.result['end']
    assert len(read.polya['spikes']) == len(oracle.result['spikes'])
    for got, exp in zip(read.polya['spikes'], oracle.result['spikes']):
        assert got[0] == exp[0]
        np.testing.assert_allclose(got[1:], exp[1:], atol=1e-3)


def test_batch_of_mixed_reads(polya_config):
    """Several heterogeneous reads in ONE batch must each match their own
    sequential oracle result."""
    rng = np.random.RandomState(10)
    items, oracles = [], []
    analyzer = PolyaAnalyzer(polya_config)
    for k in range(6):
        sig = build_signal(rng, polya_len=800 + 700 * k, spikes=k % 3)
        rough = rough_range_for(4000, 800 + 700 * k)
        read = FakeRead(sig)
        items.append((read, rough))
        oracle = PolyaOracle(polya_config)
        oracle(sig, RATE, rough, STRIDE)
        oracles.append(oracle)
    analyzer.process_batch(items, STRIDE)
    for (read, _), oracle in zip(items, oracles):
        if oracle.result is None:
            assert read.polya is None
        else:
            assert read.polya is not None
            assert read.polya['begin'] == oracle.result['begin']
            assert read.polya['end'] == oracle.result['end']


class FakeDacRead:
    """Read exposing the integer-DAC window interface of
    pipeline.read.ReadRecord (dac_window / signal_length)."""

    def __init__(self, raw_dac, calib, scaling):
        self.raw_dac = np.asarray(raw_dac, np.int16)
        self.calib = calib              # (pa_scale, dac_offset)
        self.scaling_params = scaling   # (scale, shift)
        self.sampling_rate = RATE
        self.polya = None

    @property
    def signal_length(self):
        return len(self.raw_dac)

    def dac_window(self, begin, end):
        scale, shift = self.scaling_params
        pa_scale, dac_offset = self.calib
        a = float(scale) * float(pa_scale)
        return (self.raw_dac[begin:end], np.float32(a),
                np.float32(a * float(dac_offset) + float(shift)))

    def set_polya_tail(self, info):
        self.polya = info


def test_dac_wire_lossless_with_extreme_spike():
    """A huge-amplitude glitch must NOT coarsen the wire for the rest of
    the window (ADVICE r3: the f32 min/max affine spreads 65535 steps over
    the glitch range). The integer-DAC wire is lossless by construction:
    the dequantized window equals the f32 scaled-pA affine of the original
    integers EXACTLY, glitch or not."""
    from poreplex_tpu.pipeline.polya import (_quantize_dac_stream,
                                             _wire_roundtrip)
    rng = np.random.RandomState(5)
    dac = rng.randint(400, 900, 8192).astype(np.int16)
    dac[2000] = 32767            # ~2000+ pA glitch
    dac[6100] = -32768           # negative rail
    calib = (1170.0 / 8192.0, 8.0)
    scaling = (1.03, -2.5)

    read = FakeDacRead(dac, calib, scaling)
    window, a, b = read.dac_window(0, len(dac))
    affines = np.array([[a, b]], np.float32)
    stream = np.zeros(8192, np.uint16)
    qparams = np.zeros((1, 2), np.float32)
    n = _quantize_dac_stream([window], stream, qparams, affines)
    assert n == len(dac)

    # device dequantization: v = lo + q * step, all f32
    deq = (qparams[0, 0] + stream[:n].astype(np.float32) *
           qparams[0, 1]).astype(np.float32)
    exact = (np.float32(a) * dac.astype(np.float32) +
             np.float32(b)).astype(np.float32)
    # exact integers ride f32 losslessly (q <= 65535 < 2**24); the only
    # rounding is the shared affine, identical on both sides
    assert np.array_equal(deq, _wire_roundtrip(window, (a, b)))
    np.testing.assert_allclose(deq, exact, rtol=0, atol=2e-3)
    # and away from the glitch the step stays 1 DAC (~0.15 pA), never
    # the ~1 pA a min/max affine over the glitch span would give
    assert abs(float(qparams[0, 1]) - float(a)) < 1e-9


def test_polya_dac_read_matches_f32_oracle():
    """End-to-end poly(A) on a DAC-backed read: the measured tail must
    agree with the oracle run on the same scaled-pA f32 signal."""
    rng = np.random.RandomState(11)
    scaled = build_signal(rng, adapter_len=3800, polya_len=2400, spikes=1)
    scaling = (1.0, 0.0)
    calib = (1170.0 / 8192.0, 5.0)
    # synthesize DAC integers whose scaled-pA affine reproduces ~scaled
    dac = np.clip(np.round(scaled / calib[0] - calib[1]),
                  -32768, 32767).astype(np.int16)
    read = FakeDacRead(dac, calib, scaling)

    preset = load_preset()
    ana = PolyaAnalyzer(preset['polya_dwell'])
    rough = rough_range_for(3800, 2400)
    ana.process_batch([(read, rough)], STRIDE)

    a = np.float32(calib[0])
    b = np.float32(calib[0] * calib[1])
    exact = (a * dac.astype(np.float32) + b).astype(np.float32)
    oracle = PolyaOracle(preset['polya_dwell'])
    oracle(exact, RATE, rough, STRIDE)
    assert read.polya is not None
    assert oracle.result is not None
    assert abs(read.polya['begin'] - oracle.result['begin']) <= 8
    assert abs(read.polya['end'] - oracle.result['end']) <= 8


# ---------------------------------------------------------------------------
# Self-driving wavefront driver (pipeline/polya._WavefrontDriver): round
# collection must never block the submitting thread mid-batch, concurrent
# batches must coalesce their extension rounds on one driver thread, and a
# driver-side failure must surface per batch without killing the driver.

def test_concurrent_batches_share_one_driver(polya_config):
    """Two batches submitted back-to-back (the second while the first's
    wavefront is still in flight) must both match their oracles, with all
    extension rounds driven by the analyzer's single wavefront thread."""
    rng = np.random.RandomState(40)
    analyzer = PolyaAnalyzer(polya_config)

    def make_batch(n, chain):
        items, oracles = [], []
        for k in range(n):
            polya_len = 6000 + 900 * k if chain else 1200 + 400 * k
            sig = build_signal(rng, polya_len=polya_len, spikes=k % 2)
            rough = (4000 // STRIDE, (4000 + (1400 if chain else polya_len))
                     // STRIDE)
            read = FakeRead(sig)
            items.append((read, rough))
            oracle = PolyaOracle(polya_config)
            oracle(sig, RATE, rough, STRIDE)
            oracles.append(oracle)
        return items, oracles

    # batch 1 carries underestimated rough ends -> multi-round chains
    items1, oracles1 = make_batch(3, chain=True)
    items2, oracles2 = make_batch(3, chain=False)
    s1 = analyzer.start_batch(items1, STRIDE)
    s2 = analyzer.start_batch(items2, STRIDE)
    assert analyzer._driver is not None
    analyzer.finish_batch(s1, STRIDE)
    analyzer.finish_batch(s2, STRIDE)
    for (read, _), oracle in zip(items1 + items2, oracles1 + oracles2):
        if oracle.result is None:
            assert read.polya is None
        else:
            assert read.polya is not None
            assert read.polya['begin'] == oracle.result['begin']
            assert read.polya['end'] == oracle.result['end']


def test_driver_error_surfaces_and_driver_survives(polya_config,
                                                   monkeypatch):
    """A failure while replaying one batch's round must raise from THAT
    batch's finish_batch (with the cause attached) and leave the driver
    alive for subsequent batches."""
    rng = np.random.RandomState(41)
    analyzer = PolyaAnalyzer(polya_config)

    sig = build_signal(rng, polya_len=2000)
    rough = rough_range_for(4000, 2000)

    orig = analyzer._collect_round

    def boom(*a, **k):
        raise ValueError('injected replay failure')

    monkeypatch.setattr(analyzer, '_collect_round', boom)
    state = analyzer.start_batch([(FakeRead(sig), rough)], STRIDE)
    with pytest.raises(RuntimeError, match='wavefront failed'):
        analyzer.finish_batch(state, STRIDE)
    assert isinstance(state.error, ValueError)

    # driver must keep serving the next batch once the fault clears
    monkeypatch.setattr(analyzer, '_collect_round', orig)
    read2 = FakeRead(build_signal(rng, polya_len=2500))
    analyzer.process_batch([(read2, rough_range_for(4000, 2500))], STRIDE)
    oracle = PolyaOracle(polya_config)
    oracle(read2.scaled_raw, RATE, rough_range_for(4000, 2500), STRIDE)
    assert (read2.polya is None) == (oracle.result is None)


def test_wire_accounting_records_polya_rounds(polya_config):
    """WIRE (utils.profiling) must carry upload/download bytes and busy
    intervals for the poly(A) launches of a batch."""
    from poreplex_tpu.utils.profiling import WIRE
    rng = np.random.RandomState(42)
    analyzer = PolyaAnalyzer(polya_config)
    sig = build_signal(rng, polya_len=2600)
    rough = rough_range_for(4000, 2600)
    WIRE.clear()
    analyzer.process_batch([(FakeRead(sig), rough)], STRIDE)
    snap = WIRE.snapshot()
    assert snap['polya']['launches'] >= 1
    assert snap['polya']['upload_mb'] > 0
    assert snap['polya']['download_mb'] > 0
    assert snap['polya']['busy_s'] > 0
    assert snap['device_busy_s'] >= snap['polya']['busy_s']


def test_unpack_rows_offsets_and_capacity_overflow():
    """unpack_rows must replay the kernel's pack order (all A-packs over
    the FULL padded row count, then all B-packs) when slicing the
    compacted spike stream, and must flag packs whose table ran past the
    stream capacity (spikes_ok=False -> host fallback)."""
    from poreplex_tpu.ops import polya_round as ro

    rows, max_spikes = 3, 8
    heads = np.zeros((rows, ro.HEAD_COLS), np.float32)
    # a-pack spike counts: [2, 0, 1]; b-pack: [1, 3, 0]
    heads[:, 9] = [2, 0, 1]
    heads[:, ro.PACK_HEAD + 9] = [1, 3, 0]
    total = 7
    stream = np.zeros((total, ro.SPIKE_COLS), np.float32)
    stream[:, 0] = np.arange(total) + 100     # lengths identify entries
    stream[:, 1] = 3                          # full neighborhoods

    decoded = ro.unpack_rows(heads, stream, rows, max_spikes)
    # device order: a0(2), a1(0), a2(1), b0(1), b1(3), b2(0)
    assert [s[0] for s in decoded[0].a.spikes()] == [100.0, 101.0]
    assert decoded[1].a.spikes() == []
    assert [s[0] for s in decoded[2].a.spikes()] == [102.0]
    assert [s[0] for s in decoded[0].b.spikes()] == [103.0]
    assert [s[0] for s in decoded[1].b.spikes()] == [104.0, 105.0, 106.0]
    assert all(p.spikes_ok for d in decoded for p in (d.a, d.b))

    # same counts, capacity 5: a0..a2+b0 fit (offsets 0,2,2,3), b1 spills
    decoded = ro.unpack_rows(heads, stream[:5], rows, max_spikes)
    assert decoded[0].a.spikes_ok and decoded[2].a.spikes_ok
    assert decoded[0].b.spikes_ok
    assert not decoded[1].b.spikes_ok
    # per-pack cap: counts beyond max_spikes only store max_spikes rows
    heads2 = heads.copy()
    heads2[0, 9] = max_spikes + 5
    dec2 = ro.unpack_rows(heads2, stream, rows, max_spikes)
    assert len(dec2[0].a.spikes()) == min(max_spikes + 5, total)


def test_peak_truncation_retries_in_larger_bucket(polya_config,
                                                  monkeypatch):
    """With the event-table width forced tiny for the smallest bucket,
    a window whose true event count exceeds it must be flagged by the
    kernel (peaks_truncated) and retried in the next bucket — ending
    with the same result as the oracle, never a silently-truncated
    decision."""
    from poreplex_tpu.pipeline import polya as polya_mod
    monkeypatch.setitem(polya_mod._BUCKET_PEAKS, 8192, 8)

    rng = np.random.RandomState(50)
    sig = build_signal(rng, polya_len=2400, spikes=2)
    rough = rough_range_for(4000, 2400)
    read = FakeRead(sig)
    analyzer = PolyaAnalyzer(polya_config)
    analyzer.process_batch([(read, rough)], STRIDE)

    oracle = PolyaOracle(polya_config)
    oracle(sig, RATE, rough, STRIDE)
    assert (read.polya is None) == (oracle.result is None)
    if oracle.result is not None:
        assert read.polya['begin'] == oracle.result['begin']
        assert read.polya['end'] == oracle.result['end']
        assert len(read.polya['spikes']) == len(oracle.result['spikes'])


def test_driver_restarts_after_idle_exit(polya_config, monkeypatch):
    """The wavefront thread exits after IDLE_TIMEOUT of no work and must
    be resurrected transparently by the next batch's submit."""
    from poreplex_tpu.pipeline import polya as polya_mod
    monkeypatch.setattr(polya_mod._WavefrontDriver, 'IDLE_TIMEOUT', 0.05)

    rng = np.random.RandomState(60)
    analyzer = PolyaAnalyzer(polya_config)
    for k in range(3):
        sig = build_signal(rng, polya_len=1500 + 400 * k)
        rough = rough_range_for(4000, 1500 + 400 * k)
        read = FakeRead(sig)
        analyzer.process_batch([(read, rough)], STRIDE)
        oracle = PolyaOracle(polya_config)
        oracle(sig, RATE, rough, STRIDE)
        assert (read.polya is None) == (oracle.result is None)
        if oracle.result is not None:
            assert read.polya['begin'] == oracle.result['begin']
        import time
        time.sleep(0.15)    # let the driver idle-exit between batches
