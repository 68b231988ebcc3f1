"""Fused poly(A) round kernel: event detection + tail marking + interval DP
in ONE device program with ONE packed output array.

Over a remote/tunneled TPU every dispatch pays a fixed round trip and every
separately fetched output pays another. The reference's recursive per-read
analyzer (poreplex/polya.py:50-125) runs here as batched wavefront ROUNDS
(pipeline/polya.py), so the per-round device cost must be exactly one
upload, one launch, one download. This kernel chains:

* scrappie-semantics event detection (ops.event_detection core),
* per-read candidate marking mean in [rng_lo, rng_hi]
  (poreplex/polya.py:66-73: the read's recalibrated range or the preset
  polya_mean_dist z-range),
* the best-interval column-scan DP (ops.polya_dp core),

and concatenates every per-read output into a single f32 array:
[start | length | mean | stdv | n_events interval_start interval_end
 interval_score], width 4 * (max_peaks + 1) + 4. The is_polya mask is NOT
shipped — the host recomputes it from the downloaded means with the same
comparison, bit-identically.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .event_detection import detect_events_core
from .polya_dp import dp_core


@partial(jax.jit, static_argnames=(
    'window_length1', 'window_length2', 'threshold1', 'threshold2',
    'peak_height', 'max_peaks', 'spike_weight', 'spike_tolerance',
    'use_pallas', 'interpret'))
def polya_round(signal, lengths, rng_lo, rng_hi, window_length1=7,
                window_length2=20, threshold1=3.0, threshold2=8.0,
                peak_height=4.0, max_peaks=1023, spike_weight=1.5,
                spike_tolerance=110, use_pallas=False, interpret=False):
    """signal: [B, T] f32 zero-padded, lengths: [B] i32,
    rng_lo/rng_hi: [B] f32 per-read poly(A) mean range.

    Returns one [B, 4*(max_peaks+1)+4] f32 array; parse with
    unpack_round_output."""
    ev = detect_events_core(
        signal, lengths, window_length1=window_length1,
        window_length2=window_length2, threshold1=threshold1,
        threshold2=threshold2, peak_height=peak_height, max_peaks=max_peaks,
        use_pallas=use_pallas, interpret=interpret)

    mean = ev['mean']
    n_events = ev['n_events']
    kidx = jnp.arange(mean.shape[1])[None, :]
    valid = kidx < n_events[:, None]
    # NaN means (degenerate zero-peak lanes) compare False on both sides
    is_polya = (mean >= rng_lo[:, None]) & (mean <= rng_hi[:, None]) & valid

    s, e, v = dp_core(is_polya, ev['length'], n_events,
                      spike_weight, spike_tolerance)

    return jnp.concatenate([
        ev['start'].astype(jnp.float32),
        ev['length'],
        mean,
        ev['stdv'],
        n_events[:, None].astype(jnp.float32),
        s[:, None].astype(jnp.float32),
        e[:, None].astype(jnp.float32),
        v[:, None].astype(jnp.float32),
    ], axis=1)


def unpack_round_output(arr, max_peaks=1023):
    """arr: [B, 4*(P+1)+4] numpy array from polya_round. Returns
    (start i64 [B,P+1], length f32, mean f32, stdv f32, n_events i64 [B],
    interval_start i64, interval_end i64, interval_score i64)."""
    P1 = max_peaks + 1
    start = arr[:, 0:P1].astype('int64')
    length = arr[:, P1:2 * P1]
    mean = arr[:, 2 * P1:3 * P1]
    stdv = arr[:, 3 * P1:4 * P1]
    tail = arr[:, 4 * P1:]
    n_events = tail[:, 0].astype('int64')
    s = tail[:, 1].astype('int64')
    e = tail[:, 2].astype('int64')
    v = tail[:, 3].astype('int64')
    return start, length, mean, stdv, n_events, s, e, v
