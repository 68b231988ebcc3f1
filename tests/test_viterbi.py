"""Viterbi kernel parity vs the f64 NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from poreplex_tpu.config import load_preset
from poreplex_tpu.models.segmentation import SegmentationHMM
from poreplex_tpu.refimpl import hmm as ref_hmm


@pytest.fixture(scope='module')
def preset():
    return load_preset()


def synth_signal(rng, layout):
    return np.concatenate(
        [rng.normal(mu, sd, n) for mu, sd, n in layout]).astype(np.float32)


def test_viterbi_matches_oracle_on_synthetic_reads(preset):
    spec = preset['segmentation_model']
    model = SegmentationHMM(spec)
    names, log_start, log_trans, mus, sigmas, logws = \
        ref_hmm.build_hmm_arrays(spec)
    assert names == model.state_names

    rng = np.random.RandomState(3)
    sigs, lens = [], []
    for k in range(6):
        layout = [(71.5, 3.7, 20 + k), (102.1, 3.9, 15), (112.0, 4.8, 12),
                  (80.5, 7.4, 120 + 5 * k), (108.95, 2.5, 60),
                  (96.0, 11.0, 150)]
        sigs.append(synth_signal(rng, layout))
        lens.append(len(sigs[-1]))
    T = max(lens)
    x = np.zeros((len(sigs), T), np.float32)
    for i, s in enumerate(sigs):
        x[i, :len(s)] = s

    path, logp, first, last, present = model.decode(x, np.array(lens))

    for i, s in enumerate(sigs):
        ref_path, ref_logp = ref_hmm.viterbi_path(
            s, log_start, log_trans, mus, sigmas, logws)
        np.testing.assert_array_equal(path[i, :lens[i]], ref_path)
        assert abs(logp[i] - ref_logp) / max(1, abs(ref_logp)) < 1e-4

        ref_segments = ref_hmm.segment_extents(ref_path, names)
        got = model.segments_dict(first[i], last[i], present[i])
        assert got == ref_segments


def test_viterbi_padding_does_not_change_result(preset):
    model = SegmentationHMM(preset['segmentation_model'])
    rng = np.random.RandomState(4)
    sig = synth_signal(rng, [(71.5, 3.7, 30), (102.1, 3.9, 20),
                             (112.0, 4.8, 10), (80.5, 7.4, 100),
                             (108.95, 2.5, 50), (96.0, 11.0, 80)])
    L = len(sig)
    x1 = sig[None, :]
    x2 = np.zeros((1, L + 173), np.float32)
    x2[0, :L] = sig
    p1, *_ = model.decode(x1, np.array([L]))
    p2, *_ = model.decode(x2, np.array([L]))
    np.testing.assert_array_equal(p1[0, :L], p2[0, :L])


def test_unsplit_model_loads_and_decodes(preset):
    model = SegmentationHMM(preset['unsplit_read_detection_model'])
    assert model.nstates == 6
    rng = np.random.RandomState(5)
    # event-mean-like input: polya level then adapter level then transcript
    x = np.concatenate([rng.normal(108.95, 2.5, 20),
                        rng.normal(102.1, 3.9, 6),
                        rng.normal(80.5, 7.4, 40),
                        rng.normal(96.0, 11.0, 30)]).astype(np.float32)[None]
    path, logp, first, last, present = model.decode(x, np.array([x.shape[1]]))
    segs = model.segments_dict(first[0], last[0], present[0])
    assert 'adapter' in segs
    a0, a1 = segs['adapter']
    assert 20 <= a0 <= 30 and 60 <= a1 <= 70
