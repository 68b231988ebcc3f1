"""HMM construction from preset specifications.

The two 6-state HMMs (signal segmentation and unsplit-read detection) are
defined entirely in the preset YAML as state lists with Normal/GMM emissions
and transition probabilities (reference: presets/rna-r941.cfg:61-151, loaded
by poreplex/worker_persistence.py:95-121 into pomegranate). Here they become
dense log-domain parameter arrays consumed by ops.viterbi.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import viterbi as vit_ops

NEG_INF = vit_ops.NEG_INF


class SegmentationHMM:

    def __init__(self, spec):
        """spec: list of state dicts with keys name, emission (list of
        [mu, sigma] or [mu, sigma, weight]), transition (list of
        [next_state_name, prob]), optional start_prob."""
        self.state_names = [s['name'] for s in spec]
        self.state_index = {n: i for i, n in enumerate(self.state_names)}
        nstates = len(spec)
        maxk = max(len(s['emission']) for s in spec)

        mus = np.zeros((nstates, maxk))
        sigmas = np.ones((nstates, maxk))
        logws = np.full((nstates, maxk), NEG_INF)
        for i, s in enumerate(spec):
            comps = s['emission']
            if len(comps) == 1:
                mus[i, 0], sigmas[i, 0] = comps[0][:2]
                logws[i, 0] = 0.0
            else:
                # pomegranate GeneralMixtureModel normalizes weights
                weights = np.array([c[2] for c in comps], dtype=np.float64)
                weights = weights / weights.sum()
                for k, c in enumerate(comps):
                    mus[i, k], sigmas[i, k] = c[:2]
                    logws[i, k] = np.log(weights[k])

        log_start = np.full(nstates, NEG_INF)
        log_trans = np.full((nstates, nstates), NEG_INF)
        for i, s in enumerate(spec):
            if 'start_prob' in s:
                log_start[i] = np.log(s['start_prob'])
            # pomegranate bake() normalizes outgoing transition probabilities
            probs = np.array([p for _, p in s['transition']], dtype=np.float64)
            probs = probs / probs.sum()
            for (nxt, _), p in zip(s['transition'], probs):
                log_trans[i, self.state_index[nxt]] = np.log(p)

        self.mus = jnp.asarray(mus, jnp.float32)
        self.sigmas = jnp.asarray(sigmas, jnp.float32)
        self.logws = jnp.asarray(logws, jnp.float32)
        self.log_start = jnp.asarray(log_start, jnp.float32)
        self.log_trans = jnp.asarray(log_trans, jnp.float32)
        self.nstates = nstates
        self._decode = jax.jit(self._decode_impl)
        self._decode_paths = jax.jit(self._decode_paths_impl)
        self._decode_paths_flat = jax.jit(self._decode_paths_flat_impl,
                                          static_argnames=('emax',))

    def _decode_impl(self, x, lengths):
        path, logp = vit_ops.viterbi(x, lengths, self.log_start,
                                     self.log_trans, self.mus, self.sigmas,
                                     self.logws)
        first, last, present = vit_ops.segment_extents(path, lengths,
                                                       self.nstates)
        return path, logp, first, last, present

    def decode(self, x, lengths):
        """x: [B, T] f32 padded, lengths: [B].
        Returns (path, logp, first, last, present) as numpy arrays."""
        out = self._decode(jnp.asarray(x, jnp.float32),
                           jnp.asarray(lengths, jnp.int32))
        return tuple(np.asarray(o) for o in out)

    def _decode_paths_impl(self, x, lengths):
        path, _ = vit_ops.viterbi(x, lengths, self.log_start,
                                  self.log_trans, self.mus, self.sigmas,
                                  self.logws)
        return path

    def _decode_paths_flat_impl(self, stream, meta, emax):
        """Token-packed variant for the windowed unsplit scan: windows are
        contiguous slices of a shared per-read observation stream, so the
        upload pays one copy of each read's events instead of ~2.7x
        duplicated padded windows. stream: [FLAT] f32; meta: [R, 2] i32
        (offset, length); returns paths as [R, emax] i8 (6 states) to
        quarter the download."""
        off = meta[:, 0]
        lens = meta[:, 1]
        j = jnp.arange(emax, dtype=jnp.int32)[None, :]
        idx = jnp.clip(off[:, None] + j, 0, stream.shape[0] - 1)
        x = jnp.where(j < lens[:, None], jnp.take(stream, idx), 0.0)
        path, _ = vit_ops.viterbi(x, lens, self.log_start, self.log_trans,
                                  self.mus, self.sigmas, self.logws)
        return path.astype(jnp.int8)

    def decode_paths(self, x, lengths):
        """Viterbi paths only, as ONE device array — callers that need just
        the state sequence (the windowed unsplit scan) pay a single
        device-to-host transfer instead of five."""
        return np.asarray(self._decode_paths(jnp.asarray(x, jnp.float32),
                                             jnp.asarray(lengths,
                                                         jnp.int32)))

    def segments_dict(self, first, last, present):
        """Convert one read's extents into the reference's
        {state_name: (first, last)} form (right-inclusive)."""
        return {name: (int(first[i]), int(last[i]))
                for i, name in enumerate(self.state_names) if present[i]}
