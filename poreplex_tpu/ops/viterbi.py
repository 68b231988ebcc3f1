"""Batched masked HMM Viterbi decoding + segment-extent extraction.

Replaces the reference's per-read pomegranate Viterbi calls
(poreplex/signal_analyzer.py:352, :389) with a single [B, T] kernel:
emission log-probs for all states are computed as one vectorized pass, the
max-product recursion runs as a ``lax.scan`` over time with the whole batch
in VPU lanes, and backtrace is a second scan. Padded frames carry scores
unchanged so per-read lengths need no host-side control flow.

Emissions are diagonal-Gaussian mixtures: each state has K components
(mu, sigma, log-weight); plain Normal states use K=1 with the rest disabled
via -inf weights. This covers the Normal/GeneralMixtureModel emissions of
the preset HMMs (poreplex/worker_persistence.py:99-106).
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


def viterbi(x, lengths, log_start, log_trans, mus, sigmas, logws):
    """Batched Viterbi decode.

    x: [B, T] observations (padded)
    lengths: [B] valid lengths
    log_start: [S], log_trans: [S, S] (row=from, col=to)

    Returns (path [B, T] int32, logp [B] f32). Entries of ``path`` beyond a
    read's length repeat the final decoded state.
    """
    batch, seqlen = x.shape
    nstates = log_start.shape[0]
    emis = emission_logprob(x, mus, sigmas, logws)        # [B, T, S]
    emis = jnp.swapaxes(emis, 0, 1)                       # [T, B, S]

    tsteps = jnp.arange(seqlen)
    state_iota = jnp.arange(nstates, dtype=jnp.int32)

    def forward_step(score, inputs):
        e_t, t = inputs
        # cand[b, p, s] = score[b, p] + trans[p, s]
        cand = score[:, :, None] + log_trans[None, :, :]
        best_prev = jnp.argmax(cand, axis=1).astype(jnp.int32)   # [B, S]
        new_score = jnp.max(cand, axis=1) + e_t                  # [B, S]
        active = (t < lengths)[:, None]
        score = jnp.where(active, new_score, score)
        bp = jnp.where(active, best_prev,
                       jnp.broadcast_to(state_iota, best_prev.shape))
        return score, bp

    init = log_start[None, :] + emis[0]                   # [B, S]
    # step 0 consumed in init; steps 1..T-1 in the scan
    score, bps = jax.lax.scan(forward_step, init,
                              (emis[1:], tsteps[1:]))
    # bps: [T-1, B, S]; bps[t] maps state at t+1 -> best state at t
    logp = jnp.max(score, axis=-1)
    last_state = jnp.argmax(score, axis=-1).astype(jnp.int32)

    batch_iota = jnp.arange(batch)

    def backtrace_step(state, bp):
        prev = bp[batch_iota, state]
        return prev, state

    first_state, path_rest = jax.lax.scan(backtrace_step, last_state, bps,
                                          reverse=True)
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

    def per_state(s):
        occ = (path == s) & valid                              # [B, T]
        present = occ.any(axis=1)
        last_t = jnp.max(jnp.where(occ, iota, -1), axis=1)     # [B]
        rid = jnp.take_along_axis(
            run_id, jnp.maximum(last_t, 0)[:, None], axis=1)[:, 0]
        in_run = (run_id == rid[:, None]) & occ
        first = jnp.min(jnp.where(in_run, iota, seqlen), axis=1)
        last = jnp.max(jnp.where(in_run, iota, -1), axis=1)
        first = jnp.where(present, first, -1)
        last = jnp.where(present, last, -1)
        return first, last, present

    firsts, lasts, presents = jax.vmap(per_state, out_axes=1)(
        jnp.arange(nstates))
    return firsts, lasts, presents
