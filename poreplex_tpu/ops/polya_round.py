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
# longest_stdv, begin_rel, end_rel, dwell, spike_count]
PACK_HEAD = 10
SPIKE_COLS = 5          # length, code (0 empty / 2 truncated / 3 full),
                        # mean_prev, mean_self, mean_next
GLOBAL_COLS = 7         # n_events, anchor_any, anchor_mean, recal_lo,
                        # recal_hi, recal_marked_len, peaks_truncated

# one head row per read: pack-A head, pack-B head, globals
HEAD_COLS = 2 * PACK_HEAD + GLOBAL_COLS

# spike tables ship as ONE device-compacted stream per launch instead of
# max_spikes * SPIKE_COLS padded columns per pack: typical reads carry
# 0-3 spikes, so padded tables made the download ~5 KB/row (~60 ms/MB +
# 25 ms RTT over the tunnel) for ~1% real content. The stream capacity
# scales with the launch's row count; rows whose table would run past
# the capacity are detected on the host (same running-offset arithmetic)
# and take the spike-overflow fallback exactly like a per-row overflow.
SPIKE_STREAM_PER_ROW = 24   # 16 measured 2 overflow fallbacks / 2048
                            # reads; +8 rows/read costs ~40 KB per launch


def spike_capacity(rows, max_spikes):
    """Launch spike-stream capacity: the per-row budget plus headroom
    for one maximal pack, so a small-row-variant launch (rows as low as
    4) can still hold a single legal spike-heavy pack (<= max_spikes)
    without cascading every later pack into the host fallback."""
    return rows * SPIKE_STREAM_PER_ROW + 2 * max_spikes


def pack_width(max_spikes):
    """Width of the LEGACY single-array row (head-only layout no longer
    includes it; kept for size accounting in tests/docs)."""
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
        [spk_len, code, m_prev, m_self, m_next], axis=2)   # [R, S, 5]

    head = jnp.stack([
        valid, s.astype(jnp.float32), e.astype(jnp.float32), e_is_last,
        mean_level, longest_stdv, begin_rel, end_rel, dwell,
        spike_count.astype(jnp.float32)], axis=1)
    return head, spikes, have


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

    Returns (heads [R, HEAD_COLS] f32, spike stream
    [spike_capacity(R), SPIKE_COLS] f32) — see unpack_rows."""
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

    head_a, spk_a, have_a = _decide(
        starts, length, mean, sub_stdv, n_events, is_p1,
        s_all[:R], e_all[:R], v_all[:R], max_spikes)
    head_b, spk_b, have_b = _decide(
        starts, length, mean, sub_stdv, n_events, is_p2,
        s_all[R:], e_all[R:], v_all[R:], max_spikes)

    tail = jnp.stack([
        n_events.astype(jnp.float32),
        anchor_any.astype(jnp.float32),
        anchor_mean, recal_lo, recal_hi, marked_len,
        ev['peaks_truncated'].astype(jnp.float32)], axis=1)
    heads = jnp.concatenate([head_a, head_b, tail], axis=1)

    # compact both packs' spike tables into one [CAP, 5] stream: pack
    # order is all A-packs then all B-packs (the host recomputes the same
    # running offsets from the downloaded spike counts), each pack
    # contributing min(spike_count, max_spikes) rows. Entries past the
    # capacity drop on device and are detected by the host's offset
    # arithmetic -> spike-overflow fallback for exactly those packs.
    # Built GATHER-side — each output slot binary-searches its source
    # pack on the running totals and reads vals[p, k] directly (spike
    # lanes within a pack are already compacted by _decide's searchsorted
    # positions, so slot k of pack p IS its k-th stored spike). A
    # scatter formulation of the same table measured tens of ms on TPU;
    # this [CAP]-sized gather is noise.
    cap = spike_capacity(R, max_spikes)
    vals = jnp.concatenate([spk_a, spk_b], axis=0)        # [2R, S, 5]
    have = jnp.concatenate([have_a, have_b], axis=0)      # [2R, S]
    stored = jnp.sum(have.astype(jnp.int32), axis=1)      # <= max_spikes
    cum = jnp.cumsum(stored)
    slot = jnp.arange(cap, dtype=jnp.int32)
    p = jnp.searchsorted(cum, slot, side='right').astype(jnp.int32)
    p = jnp.minimum(p, stored.shape[0] - 1)
    base = jnp.where(p > 0, cum[jnp.maximum(p - 1, 0)], 0)
    k = jnp.minimum(slot - base, vals.shape[1] - 1)
    stream_out = jnp.where((slot < cum[-1])[:, None], vals[p, k], 0.0)
    return heads, stream_out


polya_round = partial(jax.jit, static_argnames=(
    'blen', 'window_length1', 'window_length2', 'threshold1', 'threshold2',
    'peak_height', 'max_peaks', 'spike_weight', 'spike_tolerance',
    'max_spikes', 'median_pre_filter', 'stdv_lo', 'stdv_hi',
    'recal_max_dist', 'recal_max_stdv', 'recal_zr', 'use_pallas',
    'interpret'))(polya_round_core)


def unpack_rows(heads, spike_stream, used, max_spikes):
    """Decode a launch's (heads [rows, HEAD_COLS], spike stream [CAP, 5])
    download into RoundRows for its first ``used`` rows, replaying the
    kernel's pack order (all A-packs then all B-packs over the FULL row
    count, padding included) to recover each pack's stream offset. Packs
    whose table ran past the stream capacity get spikes_ok=False; the
    pipeline sends exactly those to the spike-overflow host fallback."""
    import numpy as np
    rows = heads.shape[0]
    cap = spike_stream.shape[0]
    stored = np.minimum(
        np.concatenate([heads[:, 9], heads[:, PACK_HEAD + 9]]),
        max_spikes).astype(np.int64)
    offs = np.cumsum(stored) - stored
    # a zero-spike pack needs nothing from the stream: keep it decodable
    # even when an earlier pack overflowed the capacity
    fits = (offs + stored <= cap) | (stored == 0)
    out = []
    for i in range(used):
        a = _PackView(heads[i, :PACK_HEAD],
                      spike_stream[offs[i]:offs[i] + stored[i]],
                      bool(fits[i]))
        b = _PackView(heads[i, PACK_HEAD:2 * PACK_HEAD],
                      spike_stream[offs[rows + i]:
                                   offs[rows + i] + stored[rows + i]],
                      bool(fits[rows + i]))
        out.append(RoundRow(a, b, heads[i, 2 * PACK_HEAD:]))
    return out


class RoundRow:
    """Decoded view of one read's kernel outputs."""

    __slots__ = ('a', 'b', 'n_events', 'anchor_any', 'anchor_mean',
                 'recal_lo', 'recal_hi', 'recal_marked_len',
                 'peaks_truncated', 'blen')

    def __init__(self, a, b, tail):
        self.a = a
        self.b = b
        self.n_events = int(tail[0])
        self.anchor_any = tail[1] > 0
        self.anchor_mean = float(tail[2])
        self.recal_lo = float(tail[3])
        self.recal_hi = float(tail[4])
        self.recal_marked_len = float(tail[5])
        self.peaks_truncated = tail[6] > 0
        self.blen = 0       # window bucket; set by the collecting caller


class _PackView:
    __slots__ = ('valid', 's', 'e', 'e_is_last', 'mean_level',
                 'longest_stdv', 'begin_rel', 'end_rel', 'dwell',
                 'spike_count', 'spikes_ok', '_spk')

    def __init__(self, seg, spk, spikes_ok):
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
        self.spikes_ok = spikes_ok
        self._spk = spk

    def spikes(self):
        """Decode the spike rows into the reference's tuples
        (poreplex/polya.py:110-114); valid only when spike_count fit the
        per-pack table AND the stream capacity (spikes_ok — the caller
        falls back to a host recompute otherwise)."""
        out = []
        for row in self._spk:
            code = int(row[1])
            if code == 0:
                out.append((float(row[0]),))
            elif code == 2:
                out.append((float(row[0]), float(row[2]), float(row[3])))
            else:
                out.append((float(row[0]), float(row[2]), float(row[3]),
                            float(row[4])))
        return out
