"""Poly(A) interval DP parity vs the NumPy oracle (exhaustive O(n^2) form of
poreplex/polya.py:156-187) including truncation and tie-break semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from poreplex_tpu.ops import polya_dp
from poreplex_tpu.refimpl.polya_dp import find_best_polya_interval as ref_dp


def run_batch(cases, kmax=64):
    B = len(cases)
    ip = np.zeros((B, kmax), bool)
    ln = np.zeros((B, kmax), np.float32)
    n = np.zeros(B, np.int32)
    for i, (is_p, length) in enumerate(cases):
        ip[i, :len(is_p)] = is_p
        ln[i, :len(is_p)] = length
        n[i] = len(is_p)
    s, e, v = polya_dp.find_best_polya_interval(
        jnp.asarray(ip), jnp.asarray(ln), jnp.asarray(n))
    return np.asarray(s), np.asarray(e), np.asarray(v)


@pytest.mark.parametrize('seed', range(6))
def test_random_cases_match_oracle(seed):
    rng = np.random.RandomState(seed)
    cases = []
    for _ in range(8):
        n = rng.randint(1, 60)
        is_p = rng.uniform(size=n) < 0.6
        length = rng.uniform(1, 300, n).astype(np.float32)
        cases.append((is_p, length))
    s, e, v = run_batch(cases)
    for i, (is_p, length) in enumerate(cases):
        expected = ref_dp(is_p, length)
        if expected is None:
            assert v[i] <= 0, f'case {i}: expected no interval, got {s[i], e[i]}'
        else:
            assert (s[i], e[i]) == expected, f'case {i}'


@pytest.mark.parametrize('seed', range(4))
def test_pallas_dp_matches_xla_dp(seed):
    """The Pallas sequential-scan DP (interpret mode on CPU) must be
    bit-identical to the parallel XLA formulation."""
    from poreplex_tpu.ops.pallas_polya_dp import dp_pallas
    rng = np.random.RandomState(100 + seed)
    B, K = 16, 1024
    ip = rng.uniform(size=(B, K)) < 0.6
    ln = rng.uniform(1, 300, (B, K)).astype(np.float32)
    n = rng.randint(1, K + 1, B).astype(np.int32)
    s1, e1, v1 = polya_dp.find_best_polya_interval(
        jnp.asarray(ip), jnp.asarray(ln), jnp.asarray(n))
    s2, e2, v2 = dp_pallas(jnp.asarray(ip), jnp.asarray(ln),
                           jnp.asarray(n), interpret=True)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_all_spikes_returns_none():
    is_p = np.zeros(10, bool)
    length = np.full(10, 50.0, np.float32)
    s, e, v = run_batch([(is_p, length)])
    assert v[0] <= 0


def test_single_polya_event():
    is_p = np.array([False, True, False])
    length = np.array([100.0, 400.0, 80.0], np.float32)
    s, e, v = run_batch([(is_p, length)])
    assert (s[0], e[0]) == (1, 1)
    assert v[0] == 400


def test_spike_tolerance_budget():
    # A long spike (>110 samples) must split the interval; a short one must
    # be bridged (spike budget semantics of poreplex/polya.py:175-178).
    length = np.array([200.0, 50.0, 200.0], np.float32)     # short spike
    is_p = np.array([True, False, True])
    s, e, v = run_batch([(is_p, length)])
    assert (s[0], e[0]) == (0, 2)

    length = np.array([200.0, 150.0, 200.0], np.float32)    # long spike
    s, e, v = run_batch([(is_p, length)])
    assert ref_dp(is_p, length) == (int(s[0]), int(e[0]))
    assert (s[0], e[0]) in ((0, 0), (2, 2))


def test_truncation_matches_numpy_int_cast():
    # lengths that exercise trunc-toward-zero of -1.5 * length
    is_p = np.array([True, False, True])
    length = np.array([10.0, 5.0, 10.0], np.float32)   # -7.5 -> -7
    s, e, v = run_batch([(is_p, length)])
    expected = ref_dp(is_p, length)
    assert (int(s[0]), int(e[0])) == expected
    # matching score: 10 + (-7) + 10 = 13
    assert v[0] == 13
