"""Barcode demultiplexer network.

4-barcode signal-space classifier over the last 300 pooled frames of the
adapter segment. Mirrors the behavior of the reference Keras model
(poreplex/barcoding.py:51-118): GaussianNoise (inference no-op) ->
Bidirectional LSTM(48) -> LSTM(64) -> Dense(5, softmax), argmax - 1 decoy,
phred score calibration via a committed lookup table, and a threshold gate.
Weights come from the converted ``demux-tetra-r4.npz`` bundle.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import rnn

PAD_FILLER = -1000.0   # left-pad filler for short adapters
                       # (reference: poreplex/barcoding.py:32)


class DemuxModel:

    def __init__(self, model_path, number_of_decoy_labels=1):
        data = np.load(model_path)
        self.params = {
            name: {k: jnp.asarray(data[name + '/' + k])
                   for k in ('kernel', 'recurrent', 'bias')}
            for name in ('bilstm_fwd', 'bilstm_bwd', 'lstm2')
        }
        self.params['dense'] = {k: jnp.asarray(data['dense/' + k])
                                for k in ('kernel', 'bias')}
        # phred -> minimum softmax score table
        # (reference: poreplex/barcoding.py:55-60)
        self.calibration_table = np.asarray(data['calibration'], np.float64)
        self.loss_weights = np.asarray(data['loss_weights'])
        self.number_of_decoy_labels = int(number_of_decoy_labels)
        self.unroll = None   # scan unroll; resolved by the owning engine
        self.use_pallas = False  # fused-recurrence kernel; engine-resolved
        self._apply = jax.jit(self._forward)

    def score_threshold(self, quality_threshold):
        """Minimum softmax score for a phred-scale quality threshold
        (reference: poreplex/barcoding.py:41-45)."""
        if len(self.calibration_table) - 1 < quality_threshold:
            raise ValueError(
                'The current demultiplexer does not support calibrated score '
                'of {}. Consider lowering --barcoding-quality-filter value.'
                .format(quality_threshold))
        return float(self.calibration_table[quality_threshold])

    def lookup_calibrated_phred_score(self, score):
        """bisect_right over the calibration table
        (reference: poreplex/barcoding.py:72-75)."""
        if score <= 0.0:
            return 0
        return int(np.searchsorted(self.calibration_table, score,
                                   side='right'))

    def _forward(self, signals):
        """signals: [B, T] normalized adapter windows -> softmax probs [B, 5]."""
        x = signals[..., None]
        if self.use_pallas:
            from ..ops import pallas_rnn
            h = pallas_rnn.bidirectional_lstm_pallas(
                self.params['bilstm_fwd'], self.params['bilstm_bwd'], x)
            h = pallas_rnn.lstm_last_pallas(self.params['lstm2'], h)
        else:
            h = rnn.bidirectional_lstm(self.params['bilstm_fwd'],
                                       self.params['bilstm_bwd'], x,
                                       unroll=self.unroll)
            h = rnn.lstm(self.params['lstm2'], h, return_sequences=False,
                         unroll=self.unroll)
        logits = rnn.dense(self.params['dense'], h)
        return jax.nn.softmax(logits, axis=-1)

    def predict(self, signals):
        """Return (best_label - decoys, best score) per read as numpy.
        Mirrors poreplex/barcoding.py:103-110."""
        probs = np.asarray(self._apply(jnp.asarray(signals, jnp.float32)))
        predlabels = probs.argmax(axis=1) - self.number_of_decoy_labels
        predscores = probs.max(axis=1)
        return predlabels, predscores
