"""Per-read record with the reference's status lattice and report format
(poreplex/signal_loader.py:112-198). Holds host-side state only; all signal
math happens in the batched device stages."""

import os

import numpy as np


class ReadRecord:

    def __init__(self, filename, srcdir, read_id):
        self.fullpath = os.path.join(srcdir, filename)
        self.filename = filename
        self.read_id = read_id
        self.status = 'okay'
        self.stopped = False
        self.error_message = None

        self.fast5 = None
        self.sampling_rate = None
        self.duration = 0
        self.channel = None
        self.start_time_s = None
        self.run_id = None
        self.sample_id = None

        self.scaling_params = None       # (scale, shift)
        self.label = None
        self.barcode = None
        self.barcode_bestguess = None
        self.barcode_quality = None
        self.polya = None
        self.sequence = None             # (seq, qual, adapter_trim_len)
        self.sequence_length = 0
        self.mean_qscore = 0
        self.num_events = 0

        # transient analysis state (cleared after batch)
        self.raw_signal = None           # full pA signal (f32)
        self.scaled_raw = None           # scaled full signal (poly(A) path)
        self.pooled = None               # stride-pooled, scaled lazily
        self.head_len = 0                # scaler-head frames in pooled
        self.segments = None             # {state: (first, last)} pooled frames
        self.events = None               # EventTable (basecalled events)
        self.bcall = None                # basecall dict prefetched on ingest

    # ---- status lattice (poreplex/signal_loader.py:130-136) ----
    def set_status(self, newstatus, stop=False):
        self.status = newstatus
        self.stopped = self.stopped or stop

    def set_error(self, status, error_message):
        self.status = status
        self.error_message = error_message

    def is_stopped(self):
        return self.stopped

    def set_scaling_params(self, params):
        self.scaling_params = params

    @property
    def signal_length(self):
        return len(self.raw_signal)

    def scaled_slice(self, begin, end):
        """Scaled pA signal over [begin, end) — computed per window so the
        poly(A) path never scales the full read."""
        scale, shift = self.scaling_params
        return np.asarray(self.raw_signal[begin:end] * scale + shift,
                          np.float32)

    def set_label(self, newlabel):
        self.label = newlabel

    def set_barcode(self, newbarcode, guess, quality):
        self.barcode = newbarcode
        self.barcode_bestguess = guess
        self.barcode_quality = quality

    def set_adapter_trimming_length(self, newlength):
        if self.sequence is None:
            raise Exception('Sequence is not set.')
        self.sequence = self.sequence[:2] + (newlength,)

    def set_polya_tail(self, polya_info):
        self.polya = polya_info

    def clear_cache(self):
        self.raw_signal = None
        self.pooled = None
        self.events = None
        self.bcall = None

    def report(self):
        """Result dict in the reference's format
        (poreplex/signal_loader.py:165-198)."""
        rep = {'filename': self.filename, 'read_id': self.read_id,
               'status': self.status}

        if self.sampling_rate is not None:
            rep.update({
                'channel': self.channel,
                'start_time': self.start_time_s,
                'run_id': self.run_id,
                'sample_id': self.sample_id,
                'duration': self.duration,
                'num_events': self.num_events,
                'sequence_length': self.sequence_length,
                'mean_qscore': self.mean_qscore,
            })

        if self.sequence is not None:
            rep['sequence'] = self.sequence
        if self.error_message:
            rep['error_message'] = self.error_message
        if self.label is not None:
            rep['label'] = self.label
        if self.barcode is not None:
            rep['barcode'] = self.barcode
            rep['barcode_guess'] = self.barcode_bestguess
            rep['barcode_score'] = self.barcode_quality
        if self.polya is not None:
            rep['polya'] = self.polya
        return rep
