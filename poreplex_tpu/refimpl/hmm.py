"""f64 NumPy Viterbi oracle with pomegranate-compatible semantics
(reference behavior: poreplex/worker_persistence.py:95-121 model build,
poreplex/signal_analyzer.py:346-364 decode + run summarization)."""

import numpy as np

LOG_2PI = np.log(2.0 * np.pi)


def build_hmm_arrays(spec):
    names = [s['name'] for s in spec]
    index = {n: i for i, n in enumerate(names)}
    S = len(spec)
    K = max(len(s['emission']) for s in spec)
    mus = np.zeros((S, K)); sigmas = np.ones((S, K))
    logws = np.full((S, K), -np.inf)
    for i, s in enumerate(spec):
        comps = s['emission']
        if len(comps) == 1:
            mus[i, 0], sigmas[i, 0] = comps[0][:2]
            logws[i, 0] = 0.0
        else:
            w = np.array([c[2] for c in comps], float)
            w /= w.sum()
            for k, c in enumerate(comps):
                mus[i, k], sigmas[i, k] = c[:2]
                logws[i, k] = np.log(w[k])
    log_start = np.full(S, -np.inf)
    log_trans = np.full((S, S), -np.inf)
    for i, s in enumerate(spec):
        if 'start_prob' in s:
            log_start[i] = np.log(s['start_prob'])
        probs = np.array([p for _, p in s['transition']], float)
        probs /= probs.sum()
        for (nxt, _), p in zip(s['transition'], probs):
            log_trans[i, index[nxt]] = np.log(p)
    return names, log_start, log_trans, mus, sigmas, logws


def emission_logprob(x, mus, sigmas, logws):
    x = np.asarray(x, float)[:, None, None]
    z = (x - mus) / sigmas
    comp = logws - np.log(sigmas) - 0.5 * LOG_2PI - 0.5 * z * z
    m = comp.max(axis=-1, keepdims=True)
    safe = np.where(np.isfinite(m), m, 0.0)
    return (np.log(np.exp(comp - safe).sum(axis=-1)) + safe[..., 0])


def viterbi_path(x, log_start, log_trans, mus, sigmas, logws):
    """Single-sequence f64 Viterbi. Returns (path [T], logp)."""
    emis = emission_logprob(x, mus, sigmas, logws)      # [T, S]
    T, S = emis.shape
    score = log_start + emis[0]
    bps = np.zeros((T, S), np.int64)
    for t in range(1, T):
        cand = score[:, None] + log_trans               # [prev, next]
        bps[t] = cand.argmax(axis=0)
        score = cand.max(axis=0) + emis[t]
    path = np.zeros(T, np.int64)
    path[-1] = score.argmax()
    for t in range(T - 1, 0, -1):
        path[t - 1] = bps[t, path[t]]
    return path, score.max()


def segment_extents(path, names):
    """Last-run-wins {name: (first, last)} summarization (right-inclusive),
    mirroring the groupby-dict of poreplex/signal_analyzer.py:355-364."""
    out = {}
    t = 0
    T = len(path)
    while t < T:
        s = path[t]
        first = t
        while t + 1 < T and path[t + 1] == s:
            t += 1
        out[names[s]] = (first, t)
        t += 1
    return out
