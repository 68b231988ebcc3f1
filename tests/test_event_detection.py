"""Event-detection parity: TPU kernel vs NumPy oracle vs native C++.

The three implementations are independent: the oracle follows the algorithm
documented for the reference's vendored scrappie kernel
(src/contrib/scrappie/event_detection.c), the C++ library mirrors it with
f64 prefix sums, and the TPU kernel uses centered f32 cumsums + a scan-based
state machine. All must detect identical event boundaries.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from poreplex_tpu import native
from poreplex_tpu.ops import event_detection as ed
from poreplex_tpu.refimpl import event_detection as ref_ed

PARAMS = dict(window_length1=7, window_length2=20, threshold1=3,
              threshold2=8, peak_height=4)


def synth_steppy(rng, n_levels=40, level_len=(8, 90), mu=100, sd=8, noise=1.2):
    lens = rng.randint(level_len[0], level_len[1], n_levels)
    levels = rng.normal(mu, sd, n_levels)
    return (np.repeat(levels, lens) +
            rng.normal(0, noise, lens.sum())).astype(np.float32)


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_oracle_vs_native(seed):
    rng = np.random.RandomState(seed)
    sig = synth_steppy(rng)
    ev_ref = ref_ed.detect_events(sig, **PARAMS)
    ev_cpp = native.detect_events(sig, **PARAMS)
    assert native.get_library() is not None, 'native library must build'
    np.testing.assert_array_equal(ev_ref['start'], ev_cpp['start'])
    np.testing.assert_allclose(ev_ref['mean'], ev_cpp['mean'], rtol=1e-6)
    np.testing.assert_allclose(ev_ref['stdv'], ev_cpp['stdv'], rtol=1e-4,
                               atol=1e-4)


def test_tpu_kernel_vs_native_batched():
    rng = np.random.RandomState(7)
    sigs = [synth_steppy(rng, n_levels=30 + 5 * k) for k in range(5)]
    T = max(len(s) for s in sigs)
    x = np.zeros((len(sigs), T), np.float32)
    lens = np.array([len(s) for s in sigs], np.int32)
    for i, s in enumerate(sigs):
        x[i, :len(s)] = s

    out = ed.detect_events(jnp.asarray(x), jnp.asarray(lens), **PARAMS)
    for i, s in enumerate(sigs):
        ev_cpp = native.detect_events(s, **PARAMS)
        n = int(out['n_events'][i])
        assert n == len(ev_cpp), f'lane {i}: {n} != {len(ev_cpp)}'
        np.testing.assert_array_equal(
            np.asarray(out['start'][i][:n]), ev_cpp['start'])
        np.testing.assert_allclose(
            np.asarray(out['mean'][i][:n]), ev_cpp['mean'],
            rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(out['stdv'][i][:n]), ev_cpp['stdv'],
            rtol=2e-2, atol=5e-2)
        np.testing.assert_allclose(
            np.asarray(out['length'][i][:n]), ev_cpp['length'])


def test_short_signal_degenerate_event():
    """Signals shorter than 2*w produce zero t-stats -> no peaks -> the
    reference C emits ONE degenerate event [0, 0): length 0, NaN mean,
    stdv 0 (event_detection.c:246-261). All implementations replicate."""
    sig = np.full(30, 90.0, np.float32)
    ev = ref_ed.detect_events(sig, **PARAMS)
    assert len(ev) == 1
    assert ev['length'][0] == 0.0 and np.isnan(ev['mean'][0])
    assert ev['stdv'][0] == 0.0
    ev_cpp = native.detect_events(sig, **PARAMS)
    assert len(ev_cpp) == 1 and ev_cpp['length'][0] == 0.0
    assert np.isnan(ev_cpp['mean'][0])
    out = ed.detect_events(jnp.asarray(sig[None]), jnp.asarray([30]), **PARAMS)
    assert int(out['n_events'][0]) == 1
    assert float(out['length'][0][0]) == 0.0
    assert np.isnan(float(out['mean'][0][0]))


def test_padding_invariance():
    rng = np.random.RandomState(11)
    sig = synth_steppy(rng, n_levels=20)
    L = len(sig)
    x2 = np.zeros((1, L + 500), np.float32)
    x2[0, :L] = sig
    out1 = ed.detect_events(jnp.asarray(sig[None]), jnp.asarray([L]), **PARAMS)
    out2 = ed.detect_events(jnp.asarray(x2), jnp.asarray([L]), **PARAMS)
    n1, n2 = int(out1['n_events'][0]), int(out2['n_events'][0])
    assert n1 == n2
    np.testing.assert_array_equal(np.asarray(out1['start'][0][:n1]),
                                  np.asarray(out2['start'][0][:n2]))
