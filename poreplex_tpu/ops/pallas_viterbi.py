"""Pallas TPU kernel: batched HMM Viterbi decode in a single kernel.

The XLA formulation (ops/viterbi.py) runs the max-product recursion as a
``lax.scan`` — one tiny [B, S] step per sequential HLO iteration, with the
backpointer tensor round-tripping through HBM. This kernel keeps the whole
decode on-chip: the observation block, the packed backpointers and the
output path all live in VMEM, the forward pass and the backtrace are two
``fori_loop``s inside one ``pallas_call``, and the per-step arithmetic is
laid out as [8, 128] tiles (states on sublanes, reads on lanes) so each
step is a handful of full-width VPU ops.

Model parameters (6-state transition matrix, Gaussian-mixture emission
constants) ride along as tiny VMEM-resident inputs, padded to the 8-row
sublane tile.

Backpointers are bit-packed: state s' takes 3 bits of one i32 word per
(t, read), so the [T, B] bp buffer costs 4 bytes/frame instead of S
bytes. Semantics (argmax tie-breaking, emission formula, padding
behavior) exactly mirror ops/viterbi.viterbi, which in turn replicates
pomegranate's decode used by the reference (poreplex/
signal_analyzer.py:352).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_2PI = float(np.log(2.0 * np.pi))
NEG_INF = -1e30
LANES = 128
SUBLANES = 8


def _identity_word(nstates):
    return sum(s << (3 * s) for s in range(nstates))


def _emission_tile(x_t, mus_ref, sigmas_ref, logws_ref, ncomp):
    """x_t: [1, B] observations -> [8, B] per-state log emission densities
    (rows >= nstates hold NEG_INF-ish garbage, never read)."""
    comps = []
    for k in range(ncomp):
        mu_col = mus_ref[:, k:k + 1]                              # [8, 1]
        sg_col = sigmas_ref[:, k:k + 1]
        lw_col = logws_ref[:, k:k + 1]
        z = (x_t - mu_col) / sg_col                               # [8, B]
        comps.append(lw_col - jnp.log(sg_col) - 0.5 * LOG_2PI - 0.5 * z * z)
    if len(comps) == 1:
        return comps[0]
    # logsumexp with the same max-shift jax.scipy.special.logsumexp uses
    m = comps[0]
    for c in comps[1:]:
        m = jnp.maximum(m, c)
    m_safe = jnp.maximum(m, NEG_INF)
    acc = jnp.zeros_like(m)
    for c in comps:
        acc = acc + jnp.exp(c - m_safe)
    return m_safe + jnp.log(acc)


def _pad_params(log_start, log_trans, mus, sigmas, logws):
    """Pad the state axis to 8 sublanes with inert values."""
    S = log_start.shape[0]
    K = mus.shape[1]
    ls = np.full(SUBLANES, NEG_INF, np.float32)
    ls[:S] = log_start
    lt = np.zeros((SUBLANES, SUBLANES), np.float32)
    lt[:S, :S] = log_trans
    mu = np.zeros((SUBLANES, K), np.float32)
    sg = np.ones((SUBLANES, K), np.float32)
    lw = np.full((SUBLANES, K), NEG_INF, np.float32)
    mu[:S] = mus
    sg[:S] = np.maximum(sigmas, 1e-12)
    lw[:S] = logws
    return ls, lt, mu, sg, lw


def _viterbi_kernel(ls_ref, lt_ref, mus_ref, sigmas_ref, logws_ref,
                    x_ref, len_ref, path_ref, logp_ref, bp_ref, *,
                    nstates, ncomp):
    T = x_ref.shape[0]
    B = x_ref.shape[1]
    S = nstates
    ident = _identity_word(S)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, B), 0)
    shift_w = jnp.where(sub_iota < S, 1 << (3 * sub_iota), 0)     # [8, B]
    ls_col = ls_ref[:, 0:1]                                        # [8, 1]

    def emis(x_t):
        return _emission_tile(x_t, mus_ref, sigmas_ref, logws_ref, ncomp)

    # ---- forward pass ----
    score0 = ls_col + emis(x_ref[pl.ds(0, 1), :])                  # [8, B]
    bp_ref[pl.ds(0, 1), :] = jnp.full((1, B), ident, jnp.int32)

    def fwd(t, score):
        x_t = x_ref[pl.ds(t, 1), :]                                # [1, B]
        e_t = emis(x_t)                                            # [8, B]
        # terms_p[s', b] = score[p, b] + trans[p, s']  (broadcast row p)
        best = None
        for p in range(S):
            row = score[p:p + 1, :]                                # [1, B]
            t_col = lt_ref[:, p:p + 1]                             # [8, 1]
            terms = row + t_col                                    # [8, B]
            best = terms if best is None else jnp.maximum(best, terms)
        bp = jnp.where(sub_iota < S, S - 1, 0)
        for p in range(S - 1, -1, -1):
            row = score[p:p + 1, :]
            t_col = lt_ref[:, p:p + 1]
            bp = jnp.where(row + t_col == best, p, bp)
        new_score = best + e_t
        active = t < len_ref[0:1, :]                               # [1, B]
        score = jnp.where(active, new_score, score)
        word = jnp.sum(jnp.where(sub_iota < S, bp * shift_w, 0),
                       axis=0, keepdims=True)                      # [1, B]
        word = jnp.where(active, word, ident)
        bp_ref[pl.ds(t, 1), :] = word
        return score

    score = jax.lax.fori_loop(1, T, fwd, score0)

    # ---- terminal state / log-prob (first-occurrence argmax) ----
    logp = score[0:1, :]
    for s in range(1, S):
        logp = jnp.maximum(logp, score[s:s + 1, :])
    last = jnp.zeros((1, B), jnp.int32)
    for s in range(S - 1, -1, -1):
        last = jnp.where(score[s:s + 1, :] == logp, s, last)
    logp_ref[:, :] = logp
    path_ref[pl.ds(T - 1, 1), :] = last

    # ---- backtrace ----
    def bwd(i, state):
        t = T - 2 - i
        word = bp_ref[pl.ds(t + 1, 1), :]
        state = jax.lax.shift_right_logical(word, 3 * state) & 7
        path_ref[pl.ds(t, 1), :] = state
        return state

    jax.lax.fori_loop(0, T - 1, bwd, last)


def _viterbi_extents_kernel(ls_ref, lt_ref, mus_ref, sigmas_ref, logws_ref,
                            x_ref, len_ref, first_ref, last_ref, logp_ref,
                            bp_ref, *, nstates, ncomp):
    """Fused decode + segment extents: identical forward pass, but the
    backtrace folds the last-contiguous-run extent tracking of
    ops.viterbi.segment_extents into the backward walk, so the [T, B] path
    never leaves the chip (the engine only consumes extents; the full-path
    kernel stays for window decoding)."""
    T = x_ref.shape[0]
    B = x_ref.shape[1]
    S = nstates
    ident = _identity_word(S)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, B), 0)
    shift_w = jnp.where(sub_iota < S, 1 << (3 * sub_iota), 0)
    ls_col = ls_ref[:, 0:1]
    lens = len_ref[0:1, :]                                         # [1, B]

    def emis(x_t):
        return _emission_tile(x_t, mus_ref, sigmas_ref, logws_ref, ncomp)

    # ---- forward pass (same as _viterbi_kernel) ----
    score0 = ls_col + emis(x_ref[pl.ds(0, 1), :])
    bp_ref[pl.ds(0, 1), :] = jnp.full((1, B), ident, jnp.int32)

    def fwd(t, score):
        x_t = x_ref[pl.ds(t, 1), :]
        e_t = emis(x_t)
        best = None
        for p in range(S):
            row = score[p:p + 1, :]
            t_col = lt_ref[:, p:p + 1]
            terms = row + t_col
            best = terms if best is None else jnp.maximum(best, terms)
        bp = jnp.where(sub_iota < S, S - 1, 0)
        for p in range(S - 1, -1, -1):
            row = score[p:p + 1, :]
            t_col = lt_ref[:, p:p + 1]
            bp = jnp.where(row + t_col == best, p, bp)
        new_score = best + e_t
        active = t < lens
        score = jnp.where(active, new_score, score)
        word = jnp.sum(jnp.where(sub_iota < S, bp * shift_w, 0),
                       axis=0, keepdims=True)
        word = jnp.where(active, word, ident)
        bp_ref[pl.ds(t, 1), :] = word
        return score

    score = jax.lax.fori_loop(1, T, fwd, score0)

    # ---- terminal state / log-prob ----
    logp = score[0:1, :]
    for s in range(1, S):
        logp = jnp.maximum(logp, score[s:s + 1, :])
    last_state = jnp.zeros((1, B), jnp.int32)
    for s in range(S - 1, -1, -1):
        last_state = jnp.where(score[s:s + 1, :] == logp, s, last_state)
    logp_ref[:, :] = logp

    # ---- backtrace with extent tracking ----
    # last-run semantics (segment_extents): walking backward, the first
    # encounter of a state opens its newest run (sets last); the run's
    # first extends while frames stay contiguous (first == t + 1).
    neg1 = jnp.full((SUBLANES, B), -1, jnp.int32)
    cur0 = (sub_iota == last_state) & ((T - 1) < lens)
    first8 = jnp.where(cur0, T - 1, neg1)
    last8 = jnp.where(cur0, T - 1, neg1)

    def bwd(i, carry):
        state, first8, last8 = carry
        t = T - 2 - i
        word = bp_ref[pl.ds(t + 1, 1), :]
        state = jax.lax.shift_right_logical(word, 3 * state) & 7
        cur = (sub_iota == state) & (t < lens)
        fresh = cur & (last8 < 0)
        contig = cur & (first8 == t + 1)
        first8 = jnp.where(fresh | contig, t, first8)
        last8 = jnp.where(fresh, t, last8)
        return state, first8, last8

    _, first8, last8 = jax.lax.fori_loop(
        0, T - 1, bwd, (last_state, first8, last8))
    first_ref[:, :] = first8
    last_ref[:, :] = last8


def viterbi_extents(x, lengths, log_start, log_trans, mus, sigmas, logws,
                    interpret=False):
    """Fused Viterbi + segment extents (the stage-1 consumer's contract):
    returns (first [B, S], last [B, S], present [B, S], logp [B]) with the
    exact semantics of viterbi() followed by ops.viterbi.segment_extents().
    The [T, B] path stays in VMEM; outputs are O(B) instead of O(B*T)."""
    batch, seqlen = x.shape
    nstates = int(np.shape(log_start)[0])
    ls, lt, mu, sg, lw = _pad_params(np.asarray(log_start, np.float32),
                                     np.asarray(log_trans, np.float32),
                                     np.asarray(mus, np.float32),
                                     np.asarray(sigmas, np.float32),
                                     np.asarray(logws, np.float32))

    blk = min(batch, LANES)
    nblk = pl.cdiv(batch, blk)
    pad = nblk * blk - batch
    xt = jnp.swapaxes(x, 0, 1)
    lens2 = lengths.astype(jnp.int32)[None, :]
    if pad:
        xt = jnp.pad(xt, [(0, 0), (0, pad)])
        lens2 = jnp.pad(lens2, [(0, 0), (0, pad)], constant_values=seqlen)

    kernel = functools.partial(_viterbi_extents_kernel, nstates=nstates,
                               ncomp=mu.shape[1])
    param_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    first_t, last_t, logp2 = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            param_spec, param_spec, param_spec, param_spec, param_spec,
            pl.BlockSpec((seqlen, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((SUBLANES, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((SUBLANES, nblk * blk), jnp.int32),
            jax.ShapeDtypeStruct((SUBLANES, nblk * blk), jnp.int32),
            jax.ShapeDtypeStruct((1, nblk * blk), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((seqlen, blk), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(ls[:, None]), jnp.asarray(lt.T.copy()),
      jnp.asarray(mu), jnp.asarray(sg), jnp.asarray(lw), xt, lens2)

    first = jnp.swapaxes(first_t[:nstates, :batch], 0, 1)
    last = jnp.swapaxes(last_t[:nstates, :batch], 0, 1)
    return first, last, last >= 0, logp2[0, :batch]


def viterbi(x, lengths, log_start, log_trans, mus, sigmas, logws,
            interpret=False):
    """Drop-in replacement for ops.viterbi.viterbi on TPU.

    x: [B, T] f32 padded observations; lengths: [B] i32.
    Returns (path [B, T] i32, logp [B] f32)."""
    batch, seqlen = x.shape
    nstates = int(np.shape(log_start)[0])
    ls, lt, mu, sg, lw = _pad_params(np.asarray(log_start, np.float32),
                                     np.asarray(log_trans, np.float32),
                                     np.asarray(mus, np.float32),
                                     np.asarray(sigmas, np.float32),
                                     np.asarray(logws, np.float32))

    blk = min(batch, LANES)
    nblk = pl.cdiv(batch, blk)
    pad = nblk * blk - batch
    xt = jnp.swapaxes(x, 0, 1)                                     # [T, B]
    lens2 = lengths.astype(jnp.int32)[None, :]                     # [1, B]
    if pad:
        xt = jnp.pad(xt, [(0, 0), (0, pad)])
        lens2 = jnp.pad(lens2, [(0, 0), (0, pad)],
                        constant_values=seqlen)

    kernel = functools.partial(_viterbi_kernel, nstates=nstates,
                               ncomp=mu.shape[1])
    param_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    path_t, logp2 = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            param_spec, param_spec, param_spec, param_spec, param_spec,
            pl.BlockSpec((seqlen, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((seqlen, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((seqlen, nblk * blk), jnp.int32),
            jax.ShapeDtypeStruct((1, nblk * blk), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((seqlen, blk), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(ls[:, None]), jnp.asarray(lt.T.copy()),
      jnp.asarray(mu), jnp.asarray(sg), jnp.asarray(lw), xt, lens2)

    path = jnp.swapaxes(path_t, 0, 1)[:batch]
    return path, logp2[0, :batch]
