"""Best poly(A)-interval dynamic program, batched on device.

Replaces the O(n^2)-matrix Python DP of the reference
(poreplex/polya.py:156-187) with a column scan: for every end-event j the
kernel holds the spike-budget vector over all start events i as a [K] lane
vector, derives interval matching scores from integer prefix sums, and
tracks the running row-major-first argmax — O(K) memory instead of O(K^2),
vmapped over the batch.

Score semantics match the reference exactly, including the implicit
truncation of float scores on assignment into int64 matrices.
"""

from functools import partial

import jax
import jax.numpy as jnp

INT_MIN = jnp.int32(-2 ** 31 + 1)


def dp_core(is_polya, length, n_events, spike_weight, spike_tolerance):
    """Traceable column-scan DP body shared by the standalone jit below and
    the fused poly(A) round kernel (ops.polya_round)."""
    batch, kmax = is_polya.shape
    # column scores with trunc-toward-zero int conversion
    col_match = jnp.where(is_polya, length, -spike_weight * length)
    col_match = jnp.trunc(col_match).astype(jnp.int32)
    col_spike = jnp.where(is_polya, 1,
                          jnp.trunc(-length).astype(jnp.int32)).astype(jnp.int32)

    # exclusive prefix sums: P[:, k] = sum of first k column scores
    prefix = jnp.concatenate(
        [jnp.zeros((batch, 1), jnp.int32),
         jnp.cumsum(col_match, axis=1, dtype=jnp.int32)], axis=1)

    i_vec = jnp.arange(kmax, dtype=jnp.int32)

    def scan_step(carry, j):
        budget, best_val, best_i, best_j = carry
        # budget[i] currently holds spike_scores[i, j-1]; for i == j the DP
        # starts from the zero matrix entry.
        budget = jnp.where(i_vec[None, :] == j, 0, budget)
        is_p = is_polya[:, j][:, None]
        cspk = col_spike[:, j][:, None]
        budget = jnp.where(budget < 0, -1,
                           jnp.where(is_p, spike_tolerance, budget + cspk))
        match = prefix[:, j + 1][:, None] - prefix[:, i_vec]     # [B, K]
        valid = ((i_vec[None, :] <= j) & (j < n_events[:, None]) &
                 (budget > 0))
        final = jnp.where(valid, match, INT_MIN)

        # row-major-first argmax over the growing matrix: prefer higher value,
        # then smaller i; for the same i, the earlier j wins automatically.
        cand_val = jnp.max(final, axis=1)
        cand_i = jnp.argmax(final, axis=1).astype(jnp.int32)
        take = (cand_val > best_val) | ((cand_val == best_val) &
                                        (cand_i < best_i))
        best_val = jnp.where(take, cand_val, best_val)
        best_i = jnp.where(take, cand_i, best_i)
        best_j = jnp.where(take, j, best_j)
        return (budget, best_val, best_i, best_j), None

    init = (jnp.zeros((batch, kmax), jnp.int32),
            jnp.full((batch,), INT_MIN, jnp.int32),
            jnp.full((batch,), kmax, jnp.int32),
            jnp.zeros((batch,), jnp.int32))
    (budget, best_val, best_i, best_j), _ = jax.lax.scan(
        scan_step, init, jnp.arange(kmax, dtype=jnp.int32))

    found = best_val > 0
    start = jnp.where(found, best_i, 0)
    end = jnp.where(found, best_j, 0)
    return start, end, jnp.where(found, best_val, 0)


@partial(jax.jit, static_argnames=('spike_weight', 'spike_tolerance'))
def find_best_polya_interval(is_polya, length, n_events, spike_weight=1.5,
                             spike_tolerance=110):
    """is_polya: [B, K] bool, length: [B, K] f32, n_events: [B] i32.

    Returns (start [B], end [B], score [B]) — inclusive event indices of the
    best interval; score <= 0 means "no poly(A) found"
    (poreplex/polya.py:184-185).
    """
    return dp_core(is_polya, length, n_events, spike_weight, spike_tolerance)
