"""Signal scaling predictor.

Predicts per-read (scale, shift) to map raw pA signal onto the reference
pore model space. Mirrors the behavior of the reference's Keras scaler
(poreplex/signal_loader.py:49-109): stride-pooled first 30k samples ->
LSTM(48) -> LSTM(48) -> Dense(2), then an affine output transform and a
Gaussian-quantile QC gate. Weights come from the converted
``scaler-r3.npz`` bundle.
"""

import json
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import norm

from ..ops import rnn


class ScalerModel:

    def __init__(self, model_path, qc_threshold=0.02, input_length=None):
        data = np.load(model_path)
        self.params = {
            'lstm1': {k: jnp.asarray(data['lstm1/' + k])
                      for k in ('kernel', 'recurrent', 'bias')},
            'lstm2': {k: jnp.asarray(data['lstm2/' + k])
                      for k in ('kernel', 'recurrent', 'bias')},
            'dense': {k: jnp.asarray(data['dense/' + k])
                      for k in ('kernel', 'bias')},
        }
        meta = json.loads(bytes(data['meta']).decode())
        # input_length override: the LSTM weights are length-independent, so
        # dry-run/compile-check paths may request a shorter head window.
        # Predictions at shortened lengths diverge from the reference Keras
        # scaler — never use the override on a production path.
        self.input_length = (int(input_length) if input_length
                             else int(meta['input']['length']))  # 30000
        self.input_stride = int(meta['input']['stride'])      # 15
        self.min_length = int(meta['input']['min_length'])    # 9000
        if input_length:
            if self.input_length % self.input_stride != 0:
                raise ValueError(
                    'scaler_input_length override ({}) must be a multiple '
                    'of the input stride ({})'.format(self.input_length,
                                                      self.input_stride))
            # keep the minimum-signal gate consistent with the shortened
            # window, or every real read would be rejected upstream
            self.min_length = min(self.min_length, self.input_length)
        self.pooled_length = self.input_length // self.input_stride
        self.model_version = meta.get('model_version', '')

        xfrm = meta['output_transform']
        # poly1d([std, mean]) == std * x + mean
        # (reference: poreplex/signal_loader.py:59-60)
        self.xfrm = np.array([[xfrm['scale_std'], xfrm['scale_mean']],
                              [xfrm['shift_std'], xfrm['shift_mean']]],
                             dtype=np.float64)
        # QC acceptance range per output via Gaussian quantiles
        # (reference: poreplex/signal_loader.py:65-73)
        q = [qc_threshold, 1.0 - qc_threshold]
        self.qc_scale_range = norm.ppf(q, xfrm['scale_mean'], xfrm['scale_std'])
        self.qc_shift_range = norm.ppf(q, xfrm['shift_mean'], xfrm['shift_std'])

        self._ranges = jnp.asarray(
            np.array([self.qc_scale_range, self.qc_shift_range]),
            dtype=jnp.float32)
        self._xfrm = jnp.asarray(self.xfrm, dtype=jnp.float32)
        self.unroll = None   # scan unroll; resolved by the owning engine
        self.use_pallas = False  # fused-recurrence kernel; engine-resolved
        self._apply = jax.jit(self._forward)

    def _forward(self, signal_heads):
        """signal_heads: [B, pooled_length] f32 -> (params [B,2], qc_ok [B])."""
        x = signal_heads[..., None]
        # both LSTM layers fused into one recurrence: a Pallas kernel with
        # VMEM-resident state/weights on TPU, a lax.scan elsewhere
        if self.use_pallas:
            from ..ops import pallas_rnn
            h = pallas_rnn.lstm2_stacked_pallas(
                self.params['lstm1'], self.params['lstm2'], x)
        else:
            h = rnn.lstm2_stacked(self.params['lstm1'],
                                  self.params['lstm2'], x,
                                  unroll=self.unroll)
        pred = rnn.dense(self.params['dense'], h)          # [B, 2]
        scaling = pred * self._xfrm[:, 0] + self._xfrm[:, 1]
        qc_ok = jnp.all((scaling >= self._ranges[:, 0]) &
                        (scaling <= self._ranges[:, 1]), axis=-1)
        return scaling, qc_ok

    def predict(self, signal_heads):
        """Host-facing convenience entry; returns numpy arrays."""
        scaling, qc_ok = self._apply(jnp.asarray(signal_heads, jnp.float32))
        return np.asarray(scaling), np.asarray(qc_ok)
