"""Best poly(A)-interval dynamic program, batched on device.

Replaces the O(n^2)-matrix Python DP of the reference
(poreplex/polya.py:156-187) with a fully PARALLEL O(K log K) formulation.

The key structural fact: in the reference DP, the spike-budget value of
every live start-lane i is IDENTICAL at any column j — a poly(A) event
resets every live lane (and the joining lane i=j) to ``spike_tolerance``,
a spike event applies the same uniform decrement to every live lane, and
a lane joining on a spike is immediately invalid and dead one step later.
So the whole [K, K] budget matrix collapses to per-column scalars:

* S[j]      — cumulative truncated spike length within the consecutive
              spike run ending at j (segmented cumsum, reset at each
              poly(A) event);
* death[j]  — S[j] > spike_tolerance kills every live lane at column j;
* runmin[j] — the minimum score-prefix over poly(A)-event start lanes
              since the last death (segmented min via an associative
              scan with reset flags).

The best interval ending at j is then prefix[j+1] - runmin[j], and the
reference's row-major-first argmax tie-breaking (higher score, then
smaller start i, then earlier end j) is reproduced with packed
value+index reductions. Everything is log-depth data-parallel — no
sequential ``lax.scan`` over columns (which cost ~35 ms per launch on a
TPU v5e at K=1024 regardless of batch size).

Score semantics match the reference exactly, including the implicit
truncation of float scores on assignment into int64 matrices.
"""

from functools import partial

import jax
import jax.numpy as jnp

INT_MIN = jnp.int32(-(2 ** 31) + 1)

# prefix scores are bounded by spike_weight * total event length
# (<= 1.5 * 131072 < 2 ** 18), so (value + _VOFF) * K + index fits i32
_VOFF = 1 << 20
_PACK_INF = jnp.int32(2 ** 31 - 1)


def dp_core(is_polya, length, n_events, spike_weight, spike_tolerance):
    """Traceable DP body shared by the standalone jit below and the fused
    poly(A) round kernel (ops.polya_round)."""
    batch, kmax = is_polya.shape
    jj = jnp.arange(kmax, dtype=jnp.int32)[None, :]
    valid_j = jj < n_events[:, None]

    # column scores with trunc-toward-zero int conversion
    # (poreplex/polya.py:163-171 assigns float products into int64 cells)
    col_match = jnp.where(is_polya, length, -spike_weight * length)
    col_match = jnp.trunc(col_match).astype(jnp.int32)
    spike_len = jnp.trunc(length).astype(jnp.int32)

    # All running quantities in ONE log-depth associative scan. Explicit
    # on purpose: jnp.cumsum/lax.cummax fused into a larger program lower
    # to naive O(K * window) reduce-windows on TPU (~26 ms at [256, 1024]
    # where this scan is ~0.3 ms).
    is_spike = ~is_polya
    incl, spike_cum = jax.lax.associative_scan(
        lambda a, b: (a[0] + b[0], a[1] + b[1]),
        (col_match, jnp.where(is_spike, spike_len, 0)), axis=1)
    # exclusive score prefix: prefix_ex[j] = sum of columns < j (exact
    # integer arithmetic, so subtraction recovers it from the inclusive)
    prefix_ex = incl - col_match

    # S[j]: spike-run cumulative length (uniform live-lane budget is
    # spike_tolerance - S[j]); segmented cumsum reset at poly(A) events
    # via a running max of the spike_cum value at the last poly(A) column
    run_offset = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_polya, spike_cum, 0), axis=1)
    S = jnp.where(is_spike, spike_cum - run_offset, 0)

    death = is_spike & (S > spike_tolerance)

    # segmented prefix-min of packed (prefix[i], i) over start lanes i that
    # joined on a poly(A) event, reset at every death column
    apack = jnp.where(
        is_polya & valid_j,
        (prefix_ex + _VOFF) * kmax + jj, _PACK_INF)

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    runmin_pack, _ = jax.lax.associative_scan(
        combine, (apack, death), axis=1)

    runmin_i = runmin_pack % kmax
    runmin_val = runmin_pack // kmax - _VOFF

    # candidate intervals ending at j: a live start lane exists and the
    # uniform budget is strictly positive at j
    budget_pos = is_polya | (S < spike_tolerance)
    cand = valid_j & budget_pos & (runmin_pack < _PACK_INF)
    val = jnp.where(cand, incl - runmin_val, INT_MIN)

    # row-major-first argmax: higher value, then smaller start lane i,
    # then earlier end column j
    best_val = jnp.max(val, axis=1)
    at_best = val == best_val[:, None]
    best_i = jnp.min(jnp.where(at_best, runmin_i, kmax), axis=1)
    best_j = jnp.min(
        jnp.where(at_best & (runmin_i == best_i[:, None]), jj, kmax), axis=1)

    found = best_val > 0
    start = jnp.where(found, best_i, 0)
    end = jnp.where(found, best_j, 0)
    return (start.astype(jnp.int32), end.astype(jnp.int32),
            jnp.where(found, best_val, 0))


@partial(jax.jit, static_argnames=('spike_weight', 'spike_tolerance'))
def find_best_polya_interval(is_polya, length, n_events, spike_weight=1.5,
                             spike_tolerance=110):
    """is_polya: [B, K] bool, length: [B, K] f32, n_events: [B] i32.

    Returns (start [B], end [B], score [B]) — inclusive event indices of the
    best interval; score <= 0 means "no poly(A) found"
    (poreplex/polya.py:184-185).
    """
    return dp_core(is_polya, length, n_events, spike_weight, spike_tolerance)
