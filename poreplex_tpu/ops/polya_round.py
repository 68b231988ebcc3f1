"""Fully-fused poly(A) round kernel: median pre-filter + event detection +
tail marking + interval DP + recalibration + ALL per-read decision support
in ONE device program per window bucket, reading windows from a shared
token-packed signal stream and returning ~200 decision scalars per read.

Over a remote/tunneled TPU every dispatch pays a fixed round trip
(~25 ms up), uploads cost ~40 MB/s and downloads ~70 MB/s, so the
round-trip budget — not FLOPs — dominates the poly(A) stage. The
reference's recursive per-read analyzer (poreplex/polya.py:50-154) runs
here as batched wavefront ROUNDS (pipeline/polya.py); this kernel makes
one round cost: one shared stream upload + one tiny meta upload and one
small decision download per window bucket. Event tables never cross the
wire — the spike bookkeeping, stdv QC, weighted interval means, dwell
sums and anchor recalibration of poreplex/polya.py:75-154 are all
computed on device and shipped as scalars:

* pack A — the DP outcome with the read's CURRENT poly(A) mean range
  (its recalibrated range, or the preset polya_mean_dist z-range);
* pack B — the DP outcome with the read's ANCHOR-DERIVED recalibrated
  range (poreplex/polya.py:127-148), valid whenever anchor events exist;
  the host applies it only when its control flow actually recalibrates.

The host replays the reference's decision lattice (extend / recalibrate /
accept / reject) on these scalars — see pipeline/polya.py.

Numerics: event starts/lengths, interval indices, dwell sums and spike
counts are integers carried exactly in f32; event means are the same f32
values the previous implementation downloaded. The stdv QC and weighted
means are evaluated in f32 on device (centered-cumsum form) where the
host previously used f64 index math + numpy f32 reductions — divergence
is below 1e-4 relative and only matters within float-rounding distance
of the decision thresholds.
"""

import functools
from functools import partial

import jax
import jax.numpy as jnp

from .event_detection import detect_events_core
from .polya_dp import dp_core

# decision-pack geometry: [valid, s, e, e_is_last, mean_level,
# longest_stdv, begin_rel, end_rel, dwell, spike_count] + max_spikes * 5
PACK_HEAD = 10
SPIKE_COLS = 5          # length, code (0 empty / 2 truncated / 3 full),
                        # mean_prev, mean_self, mean_next
GLOBAL_COLS = 6         # n_events, anchor_any, anchor_mean, recal_lo,
                        # recal_hi, recal_marked_len


def pack_width(max_spikes):
    return 2 * (PACK_HEAD + max_spikes * SPIKE_COLS) + GLOBAL_COLS


def _medfilt_batch(sig, k):
    """Median filter with zero-padded edges over the time axis — exact
    scipy.signal.medfilt semantics for a zero-padded [B, T] batch
    (poreplex/polya.py:58-63 ran scipy per read on the host)."""
    if k <= 1:
        return sig
    h = k // 2
    p = jnp.pad(sig, [(0, 0), (h, h)])
    stack = jnp.stack([p[:, i:i + sig.shape[1]] for i in range(k)], axis=0)
    return jnp.median(stack, axis=0)


def _sub_range_stdv(starts, length, cs, css, stdv_lo, stdv_hi):
    """Per-event stdv of the filtered signal over the event's
    [start + trunc(len*lo), start + trunc(len*hi)) sub-slice
    (poreplex/polya.py:150-154), from the centered cumulative sums.
    NaN when the sub-slice has fewer than 3 samples, so comparisons
    against polya_stdv_max come out False exactly like the reference's
    np.nan path."""
    T = cs.shape[1] - 1
    b = starts + jnp.trunc(length * stdv_lo).astype(jnp.int32)
    f = starts + jnp.trunc(length * stdv_hi).astype(jnp.int32)
    b = jnp.clip(b, 0, T)
    f = jnp.clip(f, 0, T)
    n = (f - b).astype(jnp.float32)
    s_cs = jnp.take_along_axis(cs, b, axis=1)
    e_cs = jnp.take_along_axis(cs, f, axis=1)
    s_css = jnp.take_along_axis(css, b, axis=1)
    e_css = jnp.take_along_axis(css, f, axis=1)
    mean_c = (e_cs - s_cs) / n
    var = (e_css - s_css) / n - mean_c * mean_c
    return jnp.where(n > 2, jnp.sqrt(jnp.maximum(var, 0.0)), jnp.nan)


def _decide(starts, length, mean, sub_stdv, n_events, is_p, s, e, v,
            max_spikes):
    """Vectorized decision support for one marking+DP outcome: everything
    poreplex/polya.py:75-125 reads from the event table, as [R] scalars
    plus a bounded spike table."""
    R, P1 = mean.shape
    ke = jnp.arange(P1, dtype=jnp.int32)[None, :]
    in_int = (ke >= s[:, None]) & (ke <= e[:, None])
    valid = (v > 0).astype(jnp.float32)

    w = jnp.where(in_int, length, 0.0)
    wsum = jnp.sum(w, axis=1)
    mean_level = jnp.sum(jnp.where(in_int, mean, 0.0) * w, axis=1) / wsum

    e_is_last = (e == n_events - 1).astype(jnp.float32)

    # longest event in the interval; first index on ties like np.argmax
    li = jnp.argmax(jnp.where(in_int, length, -1.0), axis=1)
    longest_stdv = jnp.take_along_axis(sub_stdv, li[:, None], axis=1)[:, 0]

    begin_rel = jnp.take_along_axis(
        starts, s[:, None], axis=1)[:, 0].astype(jnp.float32)
    end_rel = (jnp.take_along_axis(starts, e[:, None], axis=1)[:, 0]
               .astype(jnp.float32) +
               jnp.take_along_axis(length, e[:, None], axis=1)[:, 0])

    dwell = jnp.sum(jnp.where(in_int & is_p, length, 0.0), axis=1)

    # spike table: the first max_spikes interval events with non-poly(A)
    # means, in order, located by binary search on the running count
    spk = in_int & ~is_p
    spike_count = jnp.sum(spk.astype(jnp.int32), axis=1)
    running = jnp.cumsum(spk.astype(jnp.int32), axis=1)
    ks = jnp.arange(1, max_spikes + 1, dtype=jnp.int32)
    pos = jax.vmap(lambda row: jnp.searchsorted(row, ks, side='left'))(
        running).astype(jnp.int32)
    pos = jnp.minimum(pos, P1 - 1)
    have = ks[None, :] <= spike_count[:, None]

    spk_len = jnp.take_along_axis(length, pos, axis=1)
    has_nb = pos > s[:, None]                # spk - 1 >= 0 in the reference
    nxt_ok = (pos + 1) <= e[:, None]         # truncated at interval end
    m_prev = jnp.take_along_axis(mean, jnp.maximum(pos - 1, 0), axis=1)
    m_self = jnp.take_along_axis(mean, pos, axis=1)
    m_next = jnp.take_along_axis(mean, jnp.minimum(pos + 1, P1 - 1), axis=1)
    code = jnp.where(has_nb, jnp.where(nxt_ok, 3, 2), 0).astype(jnp.float32)
    code = jnp.where(have, code, 0.0)
    spikes = jnp.stack(
        [spk_len, code, m_prev, m_self, m_next], axis=2).reshape(R, -1)

    head = jnp.stack([
        valid, s.astype(jnp.float32), e.astype(jnp.float32), e_is_last,
        mean_level, longest_stdv, begin_rel, end_rel, dwell,
        spike_count.astype(jnp.float32)], axis=1)
    return jnp.concatenate([head, spikes], axis=1)


META_COLS = 7


def polya_round_core(stream, meta, *, blen, window_length1,
                     window_length2, threshold1, threshold2, peak_height,
                     max_peaks, spike_weight, spike_tolerance, max_spikes,
                     median_pre_filter, stdv_lo, stdv_hi, recal_max_dist,
                     recal_max_stdv, recal_zr, use_pallas, interpret):
    """stream: [FLAT] u16 token-packed window signal, per-read affine
    quantized exactly like the stage-1 wire (engine._quantize_stream);
    meta: [R, 7] f32 (offset, length, adapter_end, rng_lo, rng_hi,
    dequant_lo, dequant_step) — integer fields ride the f32 array exactly
    (all < 2^24), so ONE upload carries the whole side table (every extra
    transfer costs a ~25 ms tunnel round trip, and the u16 stream halves
    the big one).

    Returns [R, pack_width(max_spikes)] f32."""
    offset = meta[:, 0].astype(jnp.int32)
    lengths = meta[:, 1].astype(jnp.int32)
    adapter_end = meta[:, 2].astype(jnp.int32)
    rng_lo = meta[:, 3]
    rng_hi = meta[:, 4]
    qlo = meta[:, 5:6]
    qstep = meta[:, 6:7]

    j = jnp.arange(blen, dtype=jnp.int32)[None, :]
    idx = jnp.clip(offset[:, None] + j, 0, stream.shape[0] - 1)
    q = jnp.take(stream, idx).astype(jnp.float32)
    sig = jnp.where(j < lengths[:, None], qlo + q * qstep, 0.0)
    sig = _medfilt_batch(sig, median_pre_filter)

    ev = detect_events_core(
        sig, lengths, window_length1=window_length1,
        window_length2=window_length2, threshold1=threshold1,
        threshold2=threshold2, peak_height=peak_height, max_peaks=max_peaks,
        use_pallas=use_pallas, interpret=interpret, return_cumsums=True)
    starts = ev['start']
    length = ev['length']
    mean = ev['mean']
    stdv = ev['stdv']
    n_events = ev['n_events']
    cs, css = ev['cs'], ev['css']

    R, P1 = mean.shape
    ke = jnp.arange(P1, dtype=jnp.int32)[None, :]
    valid_ev = ke < n_events[:, None]
    # host-visible event end: start + length with the degenerate
    # zero-length lane preserved (pipeline previously recomputed this from
    # the downloaded arrays)
    end_h = starts + length.astype(jnp.int32)

    sub_stdv = _sub_range_stdv(starts, length, cs, css, stdv_lo, stdv_hi)

    # primary marking with the provided range (NaN means compare False)
    is_p1 = (mean >= rng_lo[:, None]) & (mean <= rng_hi[:, None]) & valid_ev

    # anchor recalibration (poreplex/polya.py:127-148): events overlapping
    # the adapter end with low stdv define a shifted poly(A) level
    sel = ((starts <= adapter_end[:, None] + recal_max_dist) &
           (end_h > adapter_end[:, None]) &
           (stdv < recal_max_stdv) & valid_ev)
    anchor_any = jnp.any(sel, axis=1)
    aw = jnp.where(sel, length, 0.0)
    awsum = jnp.sum(aw, axis=1)
    anchor_mean = jnp.sum(jnp.where(sel, mean, 0.0) * aw, axis=1) / awsum
    recal_lo = anchor_mean - recal_zr
    recal_hi = anchor_mean + recal_zr
    is_p2 = ((mean >= recal_lo[:, None]) & (mean <= recal_hi[:, None]) &
             valid_ev)
    marked_len = jnp.sum(jnp.where(is_p2, length, 0.0), axis=1)

    # both DPs in one call (stacked on the batch axis); the Pallas scan
    # replaces the ~330-fusion associative-scan expansion on TPU
    if use_pallas:
        from .pallas_polya_dp import dp_pallas_core
        dp = functools.partial(dp_pallas_core, interpret=interpret)
    else:
        dp = dp_core
    s_all, e_all, v_all = dp(
        jnp.concatenate([is_p1, is_p2], axis=0),
        jnp.concatenate([length, length], axis=0),
        jnp.concatenate([n_events, n_events], axis=0),
        spike_weight, spike_tolerance)

    pack_a = _decide(starts, length, mean, sub_stdv, n_events, is_p1,
                     s_all[:R], e_all[:R], v_all[:R], max_spikes)
    pack_b = _decide(starts, length, mean, sub_stdv, n_events, is_p2,
                     s_all[R:], e_all[R:], v_all[R:], max_spikes)

    tail = jnp.stack([
        n_events.astype(jnp.float32),
        anchor_any.astype(jnp.float32),
        anchor_mean, recal_lo, recal_hi, marked_len], axis=1)
    return jnp.concatenate([pack_a, pack_b, tail], axis=1)


polya_round = partial(jax.jit, static_argnames=(
    'blen', 'window_length1', 'window_length2', 'threshold1', 'threshold2',
    'peak_height', 'max_peaks', 'spike_weight', 'spike_tolerance',
    'max_spikes', 'median_pre_filter', 'stdv_lo', 'stdv_hi',
    'recal_max_dist', 'recal_max_stdv', 'recal_zr', 'use_pallas',
    'interpret'))(polya_round_core)


class RoundRow:
    """Decoded view of one kernel output row."""

    __slots__ = ('a', 'b', 'n_events', 'anchor_any', 'anchor_mean',
                 'recal_lo', 'recal_hi', 'recal_marked_len')

    def __init__(self, row, max_spikes):
        w = PACK_HEAD + max_spikes * SPIKE_COLS
        self.a = _PackView(row[:w], max_spikes)
        self.b = _PackView(row[w:2 * w], max_spikes)
        tail = row[2 * w:]
        self.n_events = int(tail[0])
        self.anchor_any = tail[1] > 0
        self.anchor_mean = float(tail[2])
        self.recal_lo = float(tail[3])
        self.recal_hi = float(tail[4])
        self.recal_marked_len = float(tail[5])


class _PackView:
    __slots__ = ('valid', 's', 'e', 'e_is_last', 'mean_level',
                 'longest_stdv', 'begin_rel', 'end_rel', 'dwell',
                 'spike_count', '_spk', '_max_spikes')

    def __init__(self, seg, max_spikes):
        self.valid = seg[0] > 0
        self.s = int(seg[1])
        self.e = int(seg[2])
        self.e_is_last = seg[3] > 0
        self.mean_level = float(seg[4])
        self.longest_stdv = float(seg[5])
        self.begin_rel = int(seg[6])
        self.end_rel = int(seg[7])
        self.dwell = int(seg[8])
        self.spike_count = int(seg[9])
        self._spk = seg[PACK_HEAD:]
        self._max_spikes = max_spikes

    def spikes(self):
        """Decode the spike table into the reference's tuples
        (poreplex/polya.py:110-114); valid only when spike_count fits
        the table (the caller falls back to a host recompute otherwise)."""
        out = []
        for k in range(min(self.spike_count, self._max_spikes)):
            row = self._spk[k * SPIKE_COLS:(k + 1) * SPIKE_COLS]
            code = int(row[1])
            if code == 0:
                out.append((float(row[0]),))
            elif code == 2:
                out.append((float(row[0]), float(row[2]), float(row[3])))
            else:
                out.append((float(row[0]), float(row[2]), float(row[3]),
                            float(row[4])))
        return out
