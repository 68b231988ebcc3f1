"""NumPy oracle for scrappie-style two-window t-statistic event detection.

Independent implementation of the algorithm in the reference's vendored C
kernel (src/contrib/scrappie/event_detection.c:36-324): double-precision
prefix sums, two windowed t-statistics, a dual short/long peak-detector
state machine with masking, and event construction from peak boundaries.
"""

import numpy as np

FLT_MIN = np.float32(np.finfo(np.float32).tiny)
FLT_MAX = np.float32(np.finfo(np.float32).max)


def compute_sum_sumsq(data):
    d32 = np.asarray(data, np.float32)
    sums = np.zeros(len(d32) + 1)
    sumsqs = np.zeros(len(d32) + 1)
    np.cumsum(d32.astype(np.float64), out=sums[1:])
    # the C accumulates f64 but squares in f32 (`data[i] * data[i]` is a
    # single-precision product, event_detection.c:47) — replicate exactly
    np.cumsum((d32 * d32).astype(np.float64), out=sumsqs[1:])
    return sums, sumsqs


def compute_tstat(sums, sumsqs, d_length, w_length):
    tstat = np.zeros(d_length, np.float32)
    if d_length < 2 * w_length or w_length < 2:
        return tstat
    wf = np.float32(w_length)
    for i in range(w_length, d_length - w_length + 1):
        sum1 = sums[i]
        sumsq1 = sumsqs[i]
        if i > w_length:
            sum1 -= sums[i - w_length]
            sumsq1 -= sumsqs[i - w_length]
        sum2 = np.float32(sums[i + w_length] - sums[i])
        sumsq2 = np.float32(sumsqs[i + w_length] - sumsqs[i])
        mean1 = np.float32(sum1 / wf)
        mean2 = np.float32(sum2 / wf)
        combined_var = np.float32(sumsq1 / wf - mean1 * mean1
                                  + sumsq2 / wf - mean2 * mean2)
        combined_var = max(combined_var, FLT_MIN)
        delta_mean = np.float32(mean2 - mean1)
        tstat[i] = abs(delta_mean) / np.sqrt(combined_var / wf)
    return tstat


class _Detector:
    def __init__(self, signal, threshold, window_length):
        self.signal = signal
        self.threshold = threshold
        self.window_length = window_length
        self.masked_to = 0
        self.peak_pos = -1
        self.peak_value = FLT_MAX
        self.valid_peak = False


def short_long_peak_detector(tstat1, tstat2, thr1, thr2, wl1, wl2,
                             peak_height):
    short_d = _Detector(tstat1, thr1, wl1)
    long_d = _Detector(tstat2, thr2, wl2)
    peaks = []
    for i in range(len(tstat1)):
        for det in (short_d, long_d):
            if det.masked_to >= i:
                continue
            current_value = det.signal[i]
            if det.peak_pos == -1:
                if current_value < det.peak_value:
                    det.peak_value = current_value
                elif current_value - det.peak_value > peak_height:
                    det.peak_value = current_value
                    det.peak_pos = i
            else:
                if current_value > det.peak_value:
                    det.peak_value = current_value
                    det.peak_pos = i
                if det is short_d and det.peak_value > det.threshold:
                    long_d.masked_to = det.peak_pos + det.window_length
                    long_d.peak_pos = -1
                    long_d.peak_value = FLT_MAX
                    long_d.valid_peak = False
                if (det.peak_value - current_value > peak_height
                        and det.peak_value > det.threshold):
                    det.valid_peak = True
                if (det.valid_peak
                        and (i - det.peak_pos) > det.window_length // 2):
                    peaks.append(det.peak_pos)
                    det.peak_pos = -1
                    det.peak_value = current_value
                    det.valid_peak = False
    return peaks


def create_events(peaks, sums, sumsqs, nsample):
    """Boundaries semantics of event_detection.c:238-271 — peak list entries
    in (0, nsample) delimit events [0,p0), [p0,p1), ..., [p_last, nsample).
    With NO detected peaks the C emits a single degenerate event
    [0, peaks[0]=0): length 0, mean 0/0 = NaN, stdv fmaxf(NaN,0) = 0."""
    usable = [p for p in peaks if 0 < p < nsample]
    if not usable:
        return np.array([(0, 0.0, np.nan, 0.0)],
                        dtype=[('start', np.int64), ('length', np.float32),
                               ('mean', np.float32), ('stdv', np.float32)])
    bounds = [0] + usable + [nsample]
    events = []
    for start, end in zip(bounds[:-1], bounds[1:]):
        length = np.float32(end - start)
        mean = np.float32(sums[end] - sums[start]) / length
        deltasqr = np.float32(sumsqs[end] - sumsqs[start])
        var = deltasqr / length - mean * mean
        # stay in f32 end-to-end: the C uses sqrtf(fmaxf(var, 0))
        events.append((start, length, mean,
                       np.sqrt(np.maximum(var, np.float32(0.0)))))
    return np.array(events, dtype=[('start', np.int64),
                                   ('length', np.float32),
                                   ('mean', np.float32),
                                   ('stdv', np.float32)])


def detect_events(signal, window_length1=7, window_length2=20, threshold1=3,
                  threshold2=8, peak_height=4):
    """Full pipeline (event_detection.c:273-324). Returns a structured array
    with fields start/length/mean/stdv."""
    signal = np.asarray(signal, np.float32)
    sums, sumsqs = compute_sum_sumsq(signal)
    tstat1 = compute_tstat(sums, sumsqs, len(signal), window_length1)
    tstat2 = compute_tstat(sums, sumsqs, len(signal), window_length2)
    peaks = short_long_peak_detector(tstat1, tstat2, threshold1, threshold2,
                                     window_length1, window_length2,
                                     peak_height)
    return create_events(peaks, sums, sumsqs, len(signal))
