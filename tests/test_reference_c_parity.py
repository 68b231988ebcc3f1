"""Bit-parity against the reference's OWN native kernel.

The vendored scrappie event detector
(/root/reference/src/contrib/scrappie/event_detection.c) is plain C with no
Python dependencies; this test compiles it unmodified into a test-only
shared library and asserts that every event-detection implementation in
this repo — the NumPy oracle (refimpl), the C++ library (src/sigproc.cc)
and the batched JAX kernel (ops/event_detection.py) — reproduces its output
on the production preset parameters {7, 20, 3, 8, 4}
(/root/reference/poreplex/presets/rna-r941.cfg event-detection block).

The companion Viterbi tie-break test pins the backpointer tie semantics
this repo assumes for pomegranate parity (first-occurrence argmax over
predecessor states). pomegranate itself cannot be installed in this
environment (no package installs / no network egress — see PARITY.md for
the record); the tie case is exercised directly instead.
"""

import ctypes
import os
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from poreplex_tpu import native
from poreplex_tpu.ops import event_detection as ed
from poreplex_tpu.ops import viterbi as vit_ops
from poreplex_tpu.refimpl import event_detection as ref_ed
from poreplex_tpu.refimpl import hmm as ref_hmm

REF_SCRAPPIE = '/root/reference/src/contrib/scrappie'
PRESET_PARAMS = dict(window_length1=7, window_length2=20, threshold1=3,
                     threshold2=8, peak_height=4)


class _EventT(ctypes.Structure):
    _fields_ = [('start', ctypes.c_uint64), ('length', ctypes.c_float),
                ('mean', ctypes.c_float), ('stdv', ctypes.c_float),
                ('pos', ctypes.c_int), ('state', ctypes.c_int)]


class _EventTable(ctypes.Structure):
    _fields_ = [('n', ctypes.c_size_t), ('start', ctypes.c_size_t),
                ('end', ctypes.c_size_t), ('event', ctypes.POINTER(_EventT))]


class _RawTable(ctypes.Structure):
    _fields_ = [('n', ctypes.c_size_t), ('start', ctypes.c_size_t),
                ('end', ctypes.c_size_t),
                ('raw', ctypes.POINTER(ctypes.c_float))]


class _DetectorParam(ctypes.Structure):
    _fields_ = [('window_length1', ctypes.c_size_t),
                ('window_length2', ctypes.c_size_t),
                ('threshold1', ctypes.c_float),
                ('threshold2', ctypes.c_float),
                ('peak_height', ctypes.c_float)]


@pytest.fixture(scope='module')
def reference_detect(tmp_path_factory):
    """Compile the reference C into a .so and return a callable oracle."""
    src = os.path.join(REF_SCRAPPIE, 'event_detection.c')
    if not os.path.exists(src):
        pytest.skip('reference sources not available')
    sopath = str(tmp_path_factory.mktemp('refc') / 'librefscrappie.so')
    try:
        subprocess.check_call(
            ['gcc', '-O2', '-std=c99', '-fPIC', '-shared',
             '-I' + REF_SCRAPPIE, src, '-o', sopath, '-lm'])
    except (OSError, subprocess.CalledProcessError) as exc:
        pytest.skip('cannot compile reference C: {}'.format(exc))

    lib = ctypes.CDLL(sopath)
    lib.detect_events.restype = _EventTable
    lib.detect_events.argtypes = [_RawTable, _DetectorParam]
    libc = ctypes.CDLL(None)
    libc.free.argtypes = [ctypes.c_void_p]

    def run(signal, window_length1, window_length2, threshold1, threshold2,
            peak_height):
        signal = np.ascontiguousarray(signal, np.float32)
        rt = _RawTable(len(signal), 0, len(signal),
                       signal.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        param = _DetectorParam(window_length1, window_length2,
                               float(threshold1), float(threshold2),
                               float(peak_height))
        table = lib.detect_events(rt, param)
        n = int(table.n)
        out = np.empty(n, dtype=[('start', np.int64), ('length', np.float32),
                                 ('mean', np.float32), ('stdv', np.float32)])
        for i in range(n):
            evt = table.event[i]
            out[i] = (evt.start, evt.length, evt.mean, evt.stdv)
        libc.free(table.event)
        return out

    return run


def _signals():
    """Signal zoo: steppy DNA-like traces, a poly(A)-shaped window as the
    production pipeline feeds the detector (medfilt applied upstream), a
    constant stretch, and a short read."""
    rng = np.random.RandomState(1234)
    sigs = []
    for k in range(4):
        lens = rng.randint(8, 90, 40 + 5 * k)
        levels = rng.normal(100, 8, len(lens))
        sigs.append((np.repeat(levels, lens) +
                     rng.normal(0, 1.2, lens.sum())).astype(np.float32))
    polya = np.concatenate([
        rng.normal(80.5, 7.4, 800),       # adapter tail
        rng.normal(108.95, 2.0, 2600),    # poly(A) plateau
        rng.normal(96.0, 11.0, 1200),     # transcript
    ]).astype(np.float32)
    sigs.append(polya)
    sigs.append(np.full(64, 91.0, np.float32))
    sigs.append(rng.normal(90, 10, 41).astype(np.float32))
    return sigs


def test_all_impls_match_reference_c(reference_detect):
    for idx, sig in enumerate(_signals()):
        ev_c = reference_detect(sig, **PRESET_PARAMS)
        label = 'signal {}'.format(idx)

        # NumPy oracle: bit-identical boundaries, f64-accumulated moments
        ev_np = ref_ed.detect_events(sig, **PRESET_PARAMS)
        assert len(ev_np) == len(ev_c), label
        np.testing.assert_array_equal(ev_np['start'], ev_c['start'],
                                      err_msg=label)
        np.testing.assert_array_equal(ev_np['length'], ev_c['length'],
                                      err_msg=label)
        np.testing.assert_allclose(ev_np['mean'], ev_c['mean'], rtol=1e-6,
                                   err_msg=label)
        np.testing.assert_allclose(ev_np['stdv'], ev_c['stdv'], rtol=1e-4,
                                   atol=1e-4, err_msg=label)

        # C++ library (same f64 prefix-sum structure): bit-identical
        if native.get_library() is not None:
            ev_cpp = native.detect_events(sig, **PRESET_PARAMS)
            assert len(ev_cpp) == len(ev_c), label
            np.testing.assert_array_equal(ev_cpp['start'], ev_c['start'],
                                          err_msg=label)
            np.testing.assert_array_equal(ev_cpp['mean'], ev_c['mean'],
                                          err_msg=label)
            np.testing.assert_array_equal(ev_cpp['stdv'], ev_c['stdv'],
                                          err_msg=label)

        # JAX kernel: identical boundaries; f32 centered-cumsum moments
        out = ed.detect_events(jnp.asarray(sig[None]),
                               jnp.asarray([len(sig)]), **PRESET_PARAMS)
        n = int(out['n_events'][0])
        assert n == len(ev_c), label
        np.testing.assert_array_equal(np.asarray(out['start'][0][:n]),
                                      ev_c['start'], err_msg=label)
        np.testing.assert_allclose(np.asarray(out['mean'][0][:n]),
                                   ev_c['mean'], rtol=2e-4, atol=2e-3,
                                   err_msg=label)


def test_reference_c_default_params_also_match(reference_detect):
    """Same 4-way agreement at the csupport defaults {30, 120, 3, 9, 8}
    (/root/reference/src/csupport.c detect_events defaults)."""
    params = dict(window_length1=30, window_length2=120, threshold1=3,
                  threshold2=9, peak_height=8)
    rng = np.random.RandomState(77)
    lens = rng.randint(40, 400, 60)
    sig = (np.repeat(rng.normal(95, 9, 60), lens) +
           rng.normal(0, 1.5, lens.sum())).astype(np.float32)
    ev_c = reference_detect(sig, **params)
    ev_np = ref_ed.detect_events(sig, **params)
    np.testing.assert_array_equal(ev_np['start'], ev_c['start'])
    out = ed.detect_events(jnp.asarray(sig[None]), jnp.asarray([len(sig)]),
                           **params)
    n = int(out['n_events'][0])
    assert n == len(ev_c)
    np.testing.assert_array_equal(np.asarray(out['start'][0][:n]),
                                  ev_c['start'])


def test_viterbi_tiebreak_first_occurrence():
    """Two predecessor states with EXACTLY equal transition scores into the
    same successor: the decoded backpointer must pick the lower state index
    (first-occurrence argmax — pomegranate's behavior, which refimpl.hmm
    and ops.viterbi both implement). The emission/transition setup makes
    states 0 and 1 exactly tied at t=0 (same log-prob by symmetry) with
    state 2 reachable from either at identical cost."""
    log_start = np.log(np.array([0.5, 0.5, 1e-12]))
    log_trans = np.log(np.array([
        [0.4, 0.3, 0.3],
        [0.3, 0.4, 0.3],     # trans[0->2] == trans[1->2] == 0.3
        [0.1, 0.1, 0.8],
    ]))
    # states 0 and 1 share the same emission -> scores exactly tie
    mus = np.array([[0.0], [0.0], [5.0]])
    sigmas = np.array([[1.0], [1.0], [1.0]])
    logws = np.zeros((3, 1))

    obs = np.array([0.0, 5.0, 5.0], np.float32)

    path_np, logp_np = ref_hmm.viterbi_path(obs, log_start, log_trans, mus,
                                            sigmas, logws)
    path_j, logp_j = vit_ops.viterbi(
        jnp.asarray(obs[None]), jnp.asarray([3]),
        jnp.asarray(log_start, jnp.float32),
        jnp.asarray(log_trans, jnp.float32),
        jnp.asarray(mus, jnp.float32), jnp.asarray(sigmas, jnp.float32),
        jnp.asarray(logws, jnp.float32))
    path_c, logp_c = native.viterbi(obs, log_start, log_trans, mus, sigmas,
                                    logws)

    # t=0 tie between states 0 and 1 must resolve to state 0 everywhere
    assert path_np[0] == 0
    np.testing.assert_array_equal(np.asarray(path_j)[0], path_np)
    np.testing.assert_array_equal(path_c, path_np)
    assert abs(float(logp_j[0]) - float(logp_np)) < 1e-3
    assert abs(float(logp_c) - float(logp_np)) < 1e-6
