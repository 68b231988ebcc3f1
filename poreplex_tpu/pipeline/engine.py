"""Batched device compute engine.

One fused, jit-compiled program covers the reference's per-batch NN + HMM
phases (SURVEY.md §3.2 PHASE B/C/D): scaler LSTM forward + output transform
+ QC, per-read signal scaling, segmentation Viterbi + extents, demux window
gather + med/MAD normalization, and the demux BiLSTM forward. Event
detection and the poly(A) DP run as separate bucketed kernels
(ops.event_detection / ops.polya_dp) driven by pipeline.polya.

All stages use fixed shapes: batches are padded to ``device_batch_size``
and sequence axes to static lengths, so each configuration compiles once.
"""

import json
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models.scaler import ScalerModel
from ..models.demux import DemuxModel
from ..models.segmentation import SegmentationHMM
from ..ops import rnn, viterbi as vit_ops, normalize

STATE_ADAPTER = 'adapter'
STATE_POLYA = 'polya-tail'


class DeviceEngine:

    def __init__(self, config, device=None):
        self.config = config
        self.device = device
        sp = config['signal_processing']
        self.stride = sp['rough_signal_stride']
        self.scan_limit = config['segmentation']['segmentation_scan_limit']
        self.seg_frames = self.scan_limit // self.stride      # 6666

        self.scaler = ScalerModel(sp['scaler_model'], sp['scaler_qc_threshold'])
        self.segmodel = SegmentationHMM(config['segmentation_model'])
        self.unsplitmodel = SegmentationHMM(
            config['unsplit_read_detection_model'])

        self.barcoding = bool(config.get('barcoding'))
        if self.barcoding:
            dmx = config['demultiplexing']
            self.demux = DemuxModel(dmx['demux_model'],
                                    dmx['number_of_decoy_labels'])
            self.demux_minlen = dmx['minimum_dna_length']
            self.demux_maxlen = dmx['maximum_dna_length']
            self.demux_trimlen = dmx['signal_trim_length']
        else:
            self.demux = None

        self.adapter_idx = self.segmodel.state_index[STATE_ADAPTER]
        self.polya_idx = self.segmodel.state_index[STATE_POLYA]

        self._stage1 = jax.jit(self._stage1_impl)

    # ------------------------------------------------------------------
    def _stage1_impl(self, heads, head_valid, pooled, pooled_len):
        """heads: [B, 2000]; pooled: [B, seg_frames] raw pooled pA;
        pooled_len: [B] valid frames (already capped at seg_frames).

        Returns dict of device arrays (see keys below)."""
        m = self.segmodel

        # PHASE B: scaling parameter regression + QC
        scaling, qc_ok = self.scaler._forward(heads)
        qc_ok = qc_ok & head_valid

        # scale pooled signal (poly1d([scale, shift]))
        scaled = pooled * scaling[:, 0:1] + scaling[:, 1:2]

        # PHASE C1: segmentation Viterbi
        path, logp = vit_ops.viterbi(scaled, pooled_len, m.log_start,
                                     m.log_trans, m.mus, m.sigmas, m.logws)
        first, last, present = vit_ops.segment_extents(path, pooled_len,
                                                       m.nstates)

        out = {
            'scaling': scaling, 'qc_ok': qc_ok,
            'first': first, 'last': last, 'present': present,
            'logp': logp,
        }

        # PHASE C2/D: demux window extraction + normalization + forward
        if self.barcoding:
            a0 = first[:, self.adapter_idx]
            a1 = last[:, self.adapter_idx]
            adapter_present = present[:, self.adapter_idx]
            alen = a1 - a0 + 1
            demux_ok = (adapter_present & (alen >= self.demux_minlen) &
                        (alen <= self.demux_maxlen))

            # last min(alen, trimlen) frames of the adapter, right-aligned
            tl = self.demux_trimlen
            k = jnp.arange(tl)
            idx = a1[:, None] - (tl - 1) + k[None, :]
            valid = idx >= a0[:, None]
            idx_c = jnp.clip(idx, 0, scaled.shape[1] - 1)
            win = jnp.take_along_axis(scaled, idx_c, axis=1)
            win_norm = normalize.med_mad_normalize(win, valid)
            win_norm = jnp.where(valid, win_norm, -1000.0)

            probs = self.demux._forward(win_norm)
            out.update({'demux_ok': demux_ok, 'demux_probs': probs,
                        'adapter_len': alen})
        return out

    # ------------------------------------------------------------------
    def run_stage1(self, heads, head_valid, pooled, pooled_len):
        """numpy in -> numpy out wrapper."""
        res = self._stage1(jnp.asarray(heads, jnp.float32),
                           jnp.asarray(head_valid, bool),
                           jnp.asarray(pooled, jnp.float32),
                           jnp.asarray(pooled_len, jnp.int32))
        return {k: np.asarray(v) for k, v in res.items()}

    def segments_for_read(self, first, last, present):
        return self.segmodel.segments_dict(first, last, present)
