"""f64/NumPy oracle of the COMPLETE poly(A) analyzer control flow
(poreplex/polya.py:30-154): the recursive window-extension + recalibration
state machine, driving the event-detection and DP oracles. Used to verify
the batched wavefront orchestration in pipeline/polya.py."""

import numpy as np
from scipy.signal import medfilt

from .event_detection import detect_events
from .polya_dp import find_best_polya_interval


class PolyaOracle:

    def __init__(self, config):
        for name in ('refinement_expansion', 'event_detection',
                     'polya_stdv_max', 'polya_stdv_range', 'spike_tolerance',
                     'spike_weight', 'openend_expansion',
                     'recalibrate_shifted_signal', 'polya_mean_dist',
                     'polya_mean_z_cutoff', 'maximum_openend_extension',
                     'median_pre_filter'):
            setattr(self, name, config[name])
        mean_loc, mean_scale = config['polya_mean_dist']
        self.polya_mean_cutoff = (
            mean_loc - mean_scale * config['polya_mean_z_cutoff'],
            mean_loc + mean_scale * config['polya_mean_z_cutoff'])
        self.polya_mean_trigger_recalibration = (
            config['polya_mean_trigger_recalibration'] * mean_scale)
        self.result = None

    def __call__(self, scaled_raw, sampling_rate, rough_range, stride,
                 polya_range=None, ext_depth=0):
        raw_signal = np.asarray(scaled_raw, np.float32)
        meu = self.openend_expansion // stride
        rough_begin, rough_end = rough_range
        if rough_end is None or rough_end - rough_begin < meu:
            rough_end = rough_begin + meu

        insp_begin = max(0, rough_begin * stride - self.refinement_expansion)
        insp_end = min(len(raw_signal),
                       (rough_end + 1) * stride + self.refinement_expansion)
        adapter_end = rough_range[0] * stride - insp_begin
        polya_signal = raw_signal[insp_begin:insp_end]
        if self.median_pre_filter > 1:
            polya_signal = medfilt(polya_signal, self.median_pre_filter)
        polya_signal = np.asarray(polya_signal, np.float32)

        ed = self.event_detection
        events = detect_events(polya_signal, ed['window_length1'],
                               ed['window_length2'], ed['threshold1'],
                               ed['threshold2'], ed['peak_height'])
        ev = {
            'start': events['start'].astype(np.int64),
            'length': events['length'].astype(np.float64),
            'mean': events['mean'].astype(np.float64),
            'stdv': events['stdv'].astype(np.float64),
        }
        ev['end'] = (ev['start'] + ev['length']).astype(np.int64)
        rng = polya_range or self.polya_mean_cutoff
        is_polya = (ev['mean'] >= rng[0]) & (ev['mean'] <= rng[1])

        args = (scaled_raw, sampling_rate, ev, is_polya, polya_signal,
                insp_begin, insp_end, (rough_begin, rough_end), adapter_end,
                len(raw_signal), stride, polya_range, ext_depth)
        if rough_range[1] is not None:
            self.call_polya(*args)
        else:
            self.try_recalibrate(*args)

    def call_polya(self, scaled_raw, sampling_rate, ev, is_polya,
                   polya_signal, signal_begin, signal_end, base_range,
                   adapter_end, full_length, stride, polya_range, ext_depth):
        n = len(ev['mean'])
        interval = find_best_polya_interval(
            is_polya, ev['length'], self.spike_weight, self.spike_tolerance)

        if (interval is not None and interval[1] == n - 1 and
                signal_end < full_length and
                ext_depth < self.maximum_openend_extension):
            return self(scaled_raw, sampling_rate,
                        (base_range[0],
                         base_range[1] + self.openend_expansion // stride),
                        stride, polya_range, ext_depth + 1)

        def is_shifted():
            s, e = interval
            w = ev['length'][s:e + 1]
            lvl = (ev['mean'][s:e + 1] * w).sum() / w.sum()
            return (abs(lvl - self.polya_mean_dist[0]) >
                    self.polya_mean_trigger_recalibration)

        if interval is None or (polya_range is None and is_shifted()):
            return self.try_recalibrate(
                scaled_raw, sampling_rate, ev, is_polya, polya_signal,
                signal_begin, signal_end, base_range, adapter_end,
                full_length, stride, None, ext_depth)

        s, e = interval
        rel = int(np.argmax(ev['length'][s:e + 1]))
        li = s + rel
        length = int(ev['length'][li])
        b = int(ev['start'][li] + length * self.polya_stdv_range[0])
        fin = int(ev['start'][li] + length * self.polya_stdv_range[1])
        stdv = (polya_signal[b:fin].std() if fin - b > 2 else np.nan)

        if stdv < self.polya_stdv_max:
            dwell = int(ev['length'][s:e + 1][is_polya[s:e + 1]].sum())
            spikes = []
            for spk in np.where(~is_polya[s:e + 1])[0]:
                if spk - 1 < 0:
                    neighborhood = ()
                else:
                    hi = min(s + spk + 2, e + 1)
                    neighborhood = tuple(
                        float(v) for v in ev['mean'][s + spk - 1:hi])
                spikes.append((float(ev['length'][s + spk]),) + neighborhood)
            self.result = {
                'begin': int(ev['start'][s]) + signal_begin,
                'end': int(ev['start'][e] + ev['length'][e]) + signal_begin,
                'dwell_time': dwell / sampling_rate,
                'spikes': spikes,
            }
        elif polya_range is None:
            self.try_recalibrate(
                scaled_raw, sampling_rate, ev, is_polya, polya_signal,
                signal_begin, signal_end, base_range, adapter_end,
                full_length, stride, None, ext_depth)

    def try_recalibrate(self, scaled_raw, sampling_rate, ev, is_polya,
                        polya_signal, signal_begin, signal_end, base_range,
                        adapter_end, full_length, stride, polya_range,
                        ext_depth):
        cfg = self.recalibrate_shifted_signal
        sel = ((ev['start'] <= adapter_end + cfg['max_dist_from_adapter']) &
               (ev['end'] > adapter_end) & (ev['stdv'] < cfg['max_stdv']))
        if not sel.any():
            return
        w = ev['length'][sel]
        polya_mean = (ev['mean'][sel] * w).sum() / w.sum()
        zr = self.polya_mean_dist[1] * self.polya_mean_z_cutoff
        new_range = (polya_mean - zr, polya_mean + zr)
        new_is_polya = ((ev['mean'] >= new_range[0]) &
                        (ev['mean'] <= new_range[1]))
        if ev['length'][new_is_polya].sum() >= cfg['min_length']:
            self.call_polya(scaled_raw, sampling_rate, ev, new_is_polya,
                            polya_signal, signal_begin, signal_end,
                            base_range, adapter_end, full_length, stride,
                            new_range, ext_depth)
