"""Batched masked HMM Viterbi decoding + segment-extent extraction.

Replaces the reference's per-read pomegranate Viterbi calls
(poreplex/signal_analyzer.py:352, :389) with a single [B, T] kernel:
emission log-probs for all states are computed as one vectorized pass, the
max-product recursion runs as a ``lax.scan`` over time with the whole batch
in VPU lanes, and backtrace is a second scan.

TPU shape discipline: the state count is tiny (S=6), and 3-D tensors with
reductions over a small middle axis ([B, S, S] max) send the Mosaic
compiler into pathological layout search (observed: >9 min hangs). Every
step therefore unrolls the S axis into 2-D [B, S] arithmetic; backtrace
uses a one-hot inner product instead of a gather.

Emissions are diagonal-Gaussian mixtures: each state has K components
(mu, sigma, log-weight); plain Normal states use K=1 with the rest disabled
via -inf weights (covers the Normal/GeneralMixtureModel emissions of the
preset HMMs, poreplex/worker_persistence.py:99-106).
"""

import numpy as np
import jax
import jax.numpy as jnp

LOG_2PI = float(np.log(2.0 * np.pi))
NEG_INF = -1e30


def emission_logprob(x, mus, sigmas, logws):
    """x: [B, T]; mus/sigmas/logws: [S, K] -> log p(x | state): [B, T, S]."""
    xe = x[..., None, None]                       # [B, T, 1, 1]
    z = (xe - mus) / sigmas                       # [B, T, S, K]
    comp = logws - jnp.log(sigmas) - 0.5 * LOG_2PI - 0.5 * z * z
    return jax.scipy.special.logsumexp(comp, axis=-1)


def viterbi(x, lengths, log_start, log_trans, mus, sigmas, logws,
            unroll=4):
    """Batched Viterbi decode.

    x: [B, T] observations (padded)
    lengths: [B] valid lengths
    log_start: [S], log_trans: [S, S] (row=from, col=to)

    Returns (path [B, T] int32, logp [B] f32). Entries of ``path`` beyond a
    read's length repeat the final decoded state.
    """
    batch, seqlen = x.shape
    nstates = int(log_start.shape[0])
    emis = emission_logprob(x, mus, sigmas, logws)        # [B, T, S]
    emis = jnp.swapaxes(emis, 0, 1)                       # [T, B, S]

    tsteps = jnp.arange(seqlen)
    state_iota_row = jnp.arange(nstates, dtype=jnp.int32)[None, :]  # [1, S]

    # transition columns as python-level constants for unrolled 2-D math
    trans_rows = [log_trans[p][None, :] for p in range(nstates)]

    def forward_step(score, inputs):
        e_t, t = inputs
        # best over previous state, unrolled: terms[p] = score[:, p] + T[p, :]
        best = score[:, 0:1] + trans_rows[0]
        for p in range(1, nstates):
            best = jnp.maximum(best, score[:, p:p + 1] + trans_rows[p])
        # backpointer with argmax first-occurrence semantics
        bp = jnp.full_like(state_iota_row, nstates - 1) * jnp.ones(
            (batch, 1), jnp.int32)
        for p in range(nstates - 1, -1, -1):
            bp = jnp.where(score[:, p:p + 1] + trans_rows[p] == best,
                           jnp.int32(p), bp)
        new_score = best + e_t
        active = (t < lengths)[:, None]
        score = jnp.where(active, new_score, score)
        bp = jnp.where(active, bp, state_iota_row)
        return score, bp

    init = log_start[None, :] + emis[0]                   # [B, S]
    score, bps = jax.lax.scan(forward_step, init,
                              (emis[1:], tsteps[1:]), unroll=unroll)
    # bps: [T-1, B, S]; bps[t] maps state at t+1 -> best state at t
    logp = jnp.max(score, axis=-1)
    last_state = jnp.argmax(score, axis=-1).astype(jnp.int32)

    def backtrace_step(state, bp):
        # one-hot inner product instead of per-lane gather (2-D only)
        onehot = (state_iota_row == state[:, None]).astype(jnp.int32)
        prev = jnp.sum(bp * onehot, axis=1)
        return prev, state

    first_state, path_rest = jax.lax.scan(backtrace_step, last_state, bps,
                                          reverse=True, unroll=unroll)
    path = jnp.concatenate([first_state[None, :], path_rest], axis=0)
    return jnp.swapaxes(path, 0, 1), logp


def segment_extents(path, lengths, nstates):
    """Per-state (first, last) extents of the LAST contiguous run of each
    state, replicating the dict-overwrite semantics of
    poreplex/signal_analyzer.py:355-364 (right-inclusive).

    path: [B, T] int32, lengths: [B]
    Returns (first [B, S], last [B, S], present [B, S]); first/last are -1
    where the state does not occur.
    """
    batch, seqlen = path.shape
    iota = jnp.arange(seqlen)
    valid = iota[None, :] < lengths[:, None]                   # [B, T]

    changed = jnp.concatenate(
        [jnp.ones((batch, 1), bool), path[:, 1:] != path[:, :-1]], axis=1)
    run_id = jnp.cumsum(changed, axis=1) - 1                   # [B, T]

    firsts, lasts, presents = [], [], []
    for s in range(nstates):
        occ = (path == s) & valid                              # [B, T]
        present = occ.any(axis=1)
        last_t = jnp.max(jnp.where(occ, iota, -1), axis=1)     # [B]
        rid = jnp.take_along_axis(
            run_id, jnp.maximum(last_t, 0)[:, None], axis=1)[:, 0]
        in_run = (run_id == rid[:, None]) & occ
        first = jnp.min(jnp.where(in_run, iota, seqlen), axis=1)
        last = jnp.max(jnp.where(in_run, iota, -1), axis=1)
        firsts.append(jnp.where(present, first, -1))
        lasts.append(jnp.where(present, last, -1))
        presents.append(present)

    return (jnp.stack(firsts, axis=1), jnp.stack(lasts, axis=1),
            jnp.stack(presents, axis=1))
