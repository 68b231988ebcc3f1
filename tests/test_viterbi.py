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


def test_pallas_viterbi_matches_xla(preset):
    """The fused Pallas kernel (interpret mode on CPU) must produce
    bit-identical paths and matching log-probs vs the lax.scan kernel."""
    import jax
    from poreplex_tpu.ops import viterbi as vx, pallas_viterbi as vp

    spec = preset['segmentation_model']
    m = SegmentationHMM(spec)
    rng = np.random.RandomState(17)
    B, T = 4, 160
    x = np.zeros((B, T), np.float32)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        L = int(rng.randint(60, T + 1))
        layout = [(71.5, 3.7, int(L * .05)), (102.1, 3.9, int(L * .05)),
                  (112.0, 4.8, int(L * .05)), (80.5, 7.4, int(L * .35)),
                  (108.95, 2.5, int(L * .15))]
        layout.append((96.0, 11.0, L - sum(p[2] for p in layout)))
        sig = synth_signal(rng, layout)
        x[i, :L] = sig
        lens[i] = L

    p_ref, lp_ref = jax.jit(lambda a, b: vx.viterbi(
        a, b, m.log_start, m.log_trans, m.mus, m.sigmas, m.logws))(x, lens)
    p_new, lp_new = vp.viterbi(jnp.asarray(x), jnp.asarray(lens),
                               m.log_start, m.log_trans, m.mus, m.sigmas,
                               m.logws, interpret=True)
    p_ref, p_new = np.asarray(p_ref), np.asarray(p_new)
    for i in range(B):
        np.testing.assert_array_equal(p_new[i, :lens[i]], p_ref[i, :lens[i]])
    np.testing.assert_allclose(np.asarray(lp_new), np.asarray(lp_ref),
                               rtol=1e-5, atol=1e-3)


def test_pallas_viterbi_extents_matches_xla(preset):
    """The fused extents kernel must reproduce viterbi + segment_extents
    exactly, including last-run-wins semantics, short/padded reads, and
    absent states."""
    import jax
    from poreplex_tpu.ops import viterbi as vx, pallas_viterbi as vp

    spec = preset['segmentation_model']
    m = SegmentationHMM(spec)
    rng = np.random.RandomState(23)
    B, T = 6, 180
    x = np.full((B, T), 96.0, np.float32)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        L = int(rng.randint(40, T + 1))
        layout = [(71.5, 3.7, int(L * .05)), (102.1, 3.9, int(L * .05)),
                  (112.0, 4.8, int(L * .05)), (80.5, 7.4, int(L * .3)),
                  (108.95, 2.5, int(L * .1)),
                  # a second adapter-like block exercises last-run-wins
                  (80.5, 7.4, int(L * .1))]
        layout.append((96.0, 11.0, L - sum(p[2] for p in layout)))
        sig = synth_signal(rng, layout)
        x[i, :L] = sig
        lens[i] = L

    def ref(a, b):
        path, logp = vx.viterbi(a, b, m.log_start, m.log_trans, m.mus,
                                m.sigmas, m.logws)
        f, l, p = vx.segment_extents(path, b, m.nstates)
        return f, l, p, logp

    f_ref, l_ref, p_ref, lp_ref = jax.jit(ref)(x, lens)
    f_new, l_new, p_new, lp_new = vp.viterbi_extents(
        jnp.asarray(x), jnp.asarray(lens), m.log_start, m.log_trans,
        m.mus, m.sigmas, m.logws, interpret=True)
    np.testing.assert_array_equal(np.asarray(p_new), np.asarray(p_ref))
    np.testing.assert_array_equal(np.asarray(f_new), np.asarray(f_ref))
    np.testing.assert_array_equal(np.asarray(l_new), np.asarray(l_ref))
    np.testing.assert_allclose(np.asarray(lp_new), np.asarray(lp_ref),
                               rtol=1e-5, atol=1e-3)
