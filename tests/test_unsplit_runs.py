"""Device-side leader->adapter run extraction (pipeline/unsplit.py
_decode_runs_impl) vs the reference's host state machine on the same
Viterbi paths — including multi-run, chain-breaking, and overflow cases."""

import numpy as np
import pytest

from poreplex_tpu.config import load_preset
from poreplex_tpu.models.segmentation import SegmentationHMM
from poreplex_tpu.pipeline.unsplit import UnsplitReadDetector, _iter_runs


@pytest.fixture(scope='module')
def detector():
    preset = load_preset()
    model = SegmentationHMM(preset['unsplit_read_detection_model'])
    return UnsplitReadDetector(preset, model, batch_rows=8)


def host_runs(det, path):
    trios = []
    leader_start = None
    for first, last, state in _iter_runs(path):
        if state not in det.leaderish:
            leader_start = None
            continue
        if leader_start is None:
            leader_start = first
        if state != det.adapter_idx:
            continue
        trios.append((leader_start, first, last))
        leader_start = None
    return trios


class FakeEvRead:
    def __init__(self, means):
        self.events = {'scaled_mean': np.asarray(means, np.float32)}
        self.sampling_rate = 3012.0


def test_device_runs_match_host_walk(detector):
    """Random synthetic mean streams: the [R, K, 3] trios emitted on
    device must equal the host walk over the same decoded paths."""
    det = detector
    rng = np.random.RandomState(7)
    state_means = {0: 71.5, 1: 102.1, 2: 112.0, 3: 80.5, 4: 108.95, 5: 96.0}

    jobs = []
    for _ in range(24):
        n = rng.randint(40, 600)
        # piecewise-constant state-like signal to provoke varied paths
        segs = []
        while sum(len(s) for s in segs) < n:
            s = rng.randint(0, 6)
            segs.append(np.full(rng.randint(3, 60), state_means[s]) +
                        rng.normal(0, 2.0, 0).sum())
        means = np.concatenate(segs)[:n] + rng.normal(0, 2.5, n)
        jobs.append((FakeEvRead(means), 0, n))

    runs = det.decode_runs_batched(jobs)
    paths = det.decode_paths_batched(jobs)
    assert len(runs) == len(paths) == len(jobs)
    for wruns, path in zip(runs, paths):
        expect = host_runs(det, path)
        got = [tuple(map(int, r)) for r in wruns]
        assert got == expect


def test_overflow_falls_back_to_full_path():
    """A window with more than MAX_RUNS adapter runs must still return
    the complete run list via the full-path fallback (exercised with a
    tiny MAX_RUNS so a 6-cycle pseudo-fusion overflows it)."""
    class TinyRuns(UnsplitReadDetector):
        MAX_RUNS = 2

    preset = load_preset()
    model = SegmentationHMM(preset['unsplit_read_detection_model'])
    det = TinyRuns(preset, model, batch_rows=8)

    rng = np.random.RandomState(3)
    blocks = []
    for _ in range(6):                       # 6 leader->adapter cycles
        blocks.append(np.full(30, 112.0))    # leader-high
        blocks.append(np.full(30, 80.5))     # adapter
        blocks.append(np.full(30, 108.95))   # poly(A)
        blocks.append(rng.normal(96, 8, 60))  # transcript
    means = np.concatenate(blocks)
    job = (FakeEvRead(means), 0, len(means))

    runs = det.decode_runs_batched([job])
    path = det.decode_paths_batched([job])[0]
    expect = host_runs(det, path)
    got = [tuple(map(int, r)) for r in runs[0]]
    assert len(expect) > det.MAX_RUNS
    assert got == expect
