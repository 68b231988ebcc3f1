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
from ..ops import pallas_viterbi

STATE_ADAPTER = 'adapter'
STATE_POLYA = 'polya-tail'


def _default_platform(device=None):
    """Platform the jitted programs will actually run on. Checked in
    order: an explicit device, JAX_PLATFORMS (some TPU plugins register
    themselves even when it says cpu), the pinned default device (tests
    pin CPU), then the first visible device."""
    import os
    if device is not None:
        return device.platform
    env = os.environ.get('JAX_PLATFORMS', '')
    if env and 'tpu' not in env and 'axon' not in env:
        return env.split(',')[0]
    d = jax.config.jax_default_device
    if d is not None:
        return d.platform
    return jax.devices()[0].platform


class DeviceEngine:

    def __init__(self, config, device=None):
        from ..utils import enable_compile_cache
        enable_compile_cache()
        self.config = config
        self.device = device
        sp = config['signal_processing']
        self.stride = sp['rough_signal_stride']
        self.scan_limit = config['segmentation']['segmentation_scan_limit']
        self.seg_frames = self.scan_limit // self.stride      # 6666

        self.scaler = ScalerModel(sp['scaler_model'], sp['scaler_qc_threshold'],
                                  input_length=sp.get('scaler_input_length'))
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

        # wire width: the pooled body covers the scaler head region too
        # (the head is the stride-pooled first 30k samples == the first
        # <=2000 pooled frames, left-zero-padded; poreplex/
        # signal_loader.py:212-231 vs :233-264), so only ONE signal array
        # crosses the wire and the head is reconstructed on device.
        self.wire_frames = max(self.seg_frames, self.scaler.pooled_length)

        # Platform-dependent knobs resolved from where the program will
        # actually execute (not the process default backend — a CPU mesh on
        # a TPU-attached host must get CPU settings): the fused Pallas
        # Viterbi on TPU, and the RNN scan unroll factor (8 amortizes TPU
        # loop overhead; 1 keeps XLA:CPU compile times sane).
        self._pallas_mode = config.get('pallas', 'auto')
        self._apply_platform(_default_platform(device))

        # wire precision over the host->device transport — both modes use
        # per-read affine quantization (v = lo + q * step over the read's
        # own [min, max] span), so negative pA excursions (open pore,
        # stalls) and instrument ranges beyond 256 pA survive intact:
        #   'exact' — u16, 65535 steps: <=0.01 pA error even across a full
        #             1.4 nA instrument range (finer than the raw DAC
        #             granularity of ~0.17 pA);
        #   'fast'  — u8, 254 steps: ~5% of the narrowest HMM state sigma
        #             on typical reads, halves upload bytes.
        self.wire_precision = config.get('wire_precision', 'exact')
        self.wire_fast = self.wire_precision == 'fast'

        # token-packed wire size: reads are concatenated end-to-end so the
        # upload pays for actual frames, not [B, seg_frames] padding. ONE
        # fixed buffer size: the fused stage-1 program costs minutes to
        # compile on a tunnel-attached TPU, so every extra compiled shape
        # hurts far more than the <=2 MB of u16 zero-padding a fixed-size
        # wire can carry.
        B = int(config.get('device_batch_size', 128))
        self.batch_rows = B
        base = max(self.wire_frames + 1, 1664)
        self.flat_size = B * base
        # stream offsets ride the f32 aux table (see _stage1_flat_impl);
        # past 2**24 they would round silently and reads would dequantize
        # from wrong positions
        if self.flat_size >= 1 << 24:
            raise ValueError(
                'device_batch_size * wire frames = {} exceeds the f32 '
                'integer-exact offset range (2**24); lower '
                'device_batch_size or segmentation_scan_limit'.format(
                    self.flat_size))

    def _apply_platform(self, platform):
        from ..utils.aot import AotCache
        self.platform = platform
        self.use_pallas = self._pallas_mode == 'always' or (
            self._pallas_mode == 'auto' and platform == 'tpu')
        self.unroll = 8 if platform == 'tpu' else 1
        self.scaler.unroll = self.unroll
        self.scaler.use_pallas = self.use_pallas
        if self.demux is not None:
            self.demux.unroll = self.unroll
            self.demux.use_pallas = self.use_pallas
        self._stage1_packed = jax.jit(self._stage1_packed_impl)
        self._stage1_flat = jax.jit(self._stage1_flat_impl)
        # AOT executable reuse (TPU): warmup installs a deserialized
        # executable so fresh processes LOAD the fused stage-1 program
        # instead of recompiling it (utils/aot.py)
        from ..utils.aot import model_asset_key
        self.aot = AotCache.for_platform(platform)
        # executables bake the model weights: key on the asset identity
        # (a retrained checkpoint must never serve a stale executable)
        self.aot.extra_key = model_asset_key(self.config)
        self._stage1_flat_exe = None
        self._stage1_aot_checked = False

    def retarget(self, platform):
        """Re-resolve platform-dependent compilation knobs (Pallas usage,
        scan unroll) for programs that will execute somewhere other than
        the default placement — e.g. a CPU dry-run mesh on a TPU host.
        Re-creates the jit wrappers so nothing traced with the old settings
        is reused."""
        if platform != self.platform:
            self._apply_platform(platform)

    # ------------------------------------------------------------------
    def _derive_heads(self, pooled, head_len):
        """Reconstruct the scaler input from the pooled body: the first
        ``head_len`` frames, right-aligned into a zero-left-padded
        [B, pooled_length] window (identical to the host-side padding of
        poreplex/signal_loader.py:228-230)."""
        hl = self.scaler.pooled_length
        j = jnp.arange(hl)[None, :]
        idx = j - (hl - head_len[:, None])
        valid = idx >= 0
        idx_c = jnp.clip(idx, 0, pooled.shape[1] - 1)
        heads = jnp.take_along_axis(pooled, idx_c, axis=1)
        return jnp.where(valid, heads, 0.0)

    def _stage1_pooled_impl(self, pooled, pooled_len, head_len, head_valid):
        """Single-signal-payload variant: pooled [B, wire_frames]; the
        scaler head is derived on device."""
        heads = self._derive_heads(pooled, head_len)
        body = pooled[:, :self.seg_frames]
        return self._stage1_impl(heads, head_valid, body, pooled_len)

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

        # PHASE C1: segmentation Viterbi — the fused kernel keeps the
        # [T, B] path in VMEM and emits only the O(B) segment extents
        if self.use_pallas:
            first, last, present, logp = pallas_viterbi.viterbi_extents(
                scaled, pooled_len, m.log_start, m.log_trans, m.mus,
                m.sigmas, m.logws)
        else:
            path, logp = vit_ops.viterbi(scaled, pooled_len, m.log_start,
                                         m.log_trans, m.mus, m.sigmas,
                                         m.logws)
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
    # Packed marshalling: the remote-TPU transport pays a fixed round-trip
    # per transfer (~25ms over the axon tunnel) plus ~20ms/MB of bandwidth,
    # so the batch crosses the wire as ONE quantized array plus a tiny
    # per-read (lo, step) side table, dequantized on device.

    @staticmethod
    def _quantize_affine(values, qmax):
        """Per-read affine quantization of a 1-D f32 signal onto
        [0, qmax] integer steps. Returns (q_f32, lo, step)."""
        if len(values):
            lo = float(values.min())
            hi = float(values.max())
        else:
            lo = hi = 0.0
        step = max((hi - lo) / qmax, 1e-7)
        q = np.clip(np.round((values - lo) / step), 0, qmax)
        return q, lo, step

    @staticmethod
    def _quantize_stream(chunks, flat, qparams, qmax):
        """Batched per-read affine quantization of ``chunks`` (list of 1-D
        f32 arrays) laid end-to-end into ``flat`` from offset 0, with the
        (lo, step) affine of chunk i written to ``qparams[i]``. One
        vectorized pass over the concatenated stream (the per-read Python
        loop this replaces was the r02 stage-1 regression); numerics match
        _quantize_affine chunk-for-chunk. Returns total samples written."""
        if not chunks:
            return 0
        lens = np.fromiter((len(c) for c in chunks), np.int64, len(chunks))
        total = int(lens.sum())
        if total == 0:
            qparams[:len(chunks)] = (0.0, 1e-7)
            return 0
        stream = np.concatenate(chunks) if len(chunks) > 1 else \
            np.asarray(chunks[0], np.float32)
        offsets = np.zeros(len(chunks), np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        nz = lens > 0
        lo = np.zeros(len(chunks), np.float64)
        hi = np.zeros(len(chunks), np.float64)
        lo[nz] = np.minimum.reduceat(stream, offsets[nz])
        hi[nz] = np.maximum.reduceat(stream, offsets[nz])
        step = np.maximum((hi - lo) / qmax, 1e-7)
        qparams[:len(chunks), 0] = lo
        qparams[:len(chunks), 1] = step
        # f32 arithmetic exactly as the scalar path (weak scalar promotion)
        rep_lo = np.repeat(lo, lens).astype(np.float32)
        rep_step = np.repeat(step, lens).astype(np.float32)
        q = np.clip(np.round((stream - rep_lo) / rep_step), 0, qmax)
        flat[:total] = q.astype(flat.dtype)
        return total

    def _stage1_packed_impl(self, packed, qparams):
        """packed: [B, wire_frames + 3] u16
        (quantized pooled | head_len | head_valid | pooled_len);
        qparams: [B, 2] f32 per-read (lo, step) dequantization affine."""
        w = self.wire_frames
        head_len = packed[:, w].astype(jnp.int32)
        head_valid = packed[:, w + 1] > 0
        pooled_len = packed[:, w + 2].astype(jnp.int32)
        q = packed[:, :w].astype(jnp.float32)
        pooled = qparams[:, 0:1] + q * qparams[:, 1:2]
        stored = jnp.maximum(pooled_len, head_len)[:, None]
        j = jnp.arange(w)[None, :]
        pooled = jnp.where(j < stored, pooled, 0.0)
        out = self._stage1_pooled_impl(pooled, pooled_len, head_len,
                                       head_valid)
        return self._pack_outputs(out)

    def _pack_outputs(self, out):
        cols = [out['scaling'],                              # 2
                out['qc_ok'][:, None].astype(jnp.float32),   # 1
                out['first'].astype(jnp.float32),            # S
                out['last'].astype(jnp.float32),             # S
                out['present'].astype(jnp.float32),          # S
                out['logp'][:, None]]                        # 1
        if self.barcoding:
            cols += [out['demux_ok'][:, None].astype(jnp.float32),
                     out['demux_probs'],
                     out['adapter_len'][:, None].astype(jnp.float32)]
        return jnp.concatenate(cols, axis=1)

    def _unpack_stage1(self, arr):
        S = self.segmodel.nstates
        out = {}
        c = 0
        out['scaling'] = arr[:, 0:2]; c = 2
        out['qc_ok'] = arr[:, c] > 0.5; c += 1
        out['first'] = arr[:, c:c + S].astype(np.int64); c += S
        out['last'] = arr[:, c:c + S].astype(np.int64); c += S
        out['present'] = arr[:, c:c + S] > 0.5; c += S
        out['logp'] = arr[:, c]; c += 1
        if self.barcoding:
            out['demux_ok'] = arr[:, c] > 0.5; c += 1
            out['demux_probs'] = arr[:, c:c + 5]; c += 5
            out['adapter_len'] = arr[:, c].astype(np.int64); c += 1
        return out

    def pack_stage1(self, pooled, pooled_len, head_len=None, head_valid=None):
        """Marshal one batch into the u16 wire array + dequantization
        side table. Returns (packed [B, wire_frames+3] u16, qparams [B,2]
        f32).

        pooled: [B, <=wire_frames] f32 pA (pooled stride-`stride` means);
        pooled_len: [B] valid segmentation frames (<= seg_frames);
        head_len: [B] available scaler-head frames (defaults to
        min(scaler_len, pooled_len)); head_valid: [B] bool."""
        pooled = np.asarray(pooled, np.float32)
        n, w = pooled.shape
        pooled_len = np.asarray(pooled_len, np.uint16)
        if head_len is None:
            head_len = np.minimum(self.scaler.pooled_length,
                                  pooled_len).astype(np.uint16)
        if head_valid is None:
            head_valid = np.ones(n, bool)
        stored = np.minimum(np.maximum(pooled_len, head_len), w)
        packed = np.zeros((n, self.wire_frames + 3), np.uint16)
        qparams = np.zeros((n, 2), np.float32)
        qparams[:, 1] = 1.0
        chunks = [pooled[i, :stored[i]] for i in range(n)]
        flat = np.zeros(int(stored.sum()), np.uint16)
        self._quantize_stream(chunks, flat, qparams, 65535)
        off = 0
        for i in range(n):
            packed[i, :stored[i]] = flat[off:off + stored[i]]
            off += int(stored[i])
        packed[:, self.wire_frames] = np.asarray(head_len, np.uint16)
        packed[:, self.wire_frames + 1] = np.asarray(head_valid, np.uint16)
        packed[:, self.wire_frames + 2] = pooled_len
        return packed, qparams

    def dispatch_stage1(self, packed):
        """Non-blocking: starts upload + compute, returns the device
        result handle. Use collect_stage1 to await + unpack; keeping a few
        dispatches in flight overlaps host marshalling and wire transfers
        with device compute."""
        arr, qparams = packed
        return self._stage1_packed(jnp.asarray(arr), jnp.asarray(qparams))

    def collect_stage1(self, handle):
        from ..utils.profiling import WIRE
        return self._unpack_stage1(WIRE.await_array('stage1', handle))

    def run_stage1(self, pooled, pooled_len, head_len=None, head_valid=None):
        """numpy in -> numpy out wrapper; single transfer each way."""
        packed = self.pack_stage1(pooled, pooled_len, head_len, head_valid)
        return self.collect_stage1(self.dispatch_stage1(packed))

    # ------------------------------------------------------------------
    # Token-packed transport: reads' pooled frames are concatenated into
    # one flat u16 buffer (offsets in a tiny side table), so the wire pays
    # sum(len_i) instead of B * seg_frames. The padded [B, T] compute
    # layout is rebuilt on device with one gather.

    def _gather_flat(self, stream, meta):
        """stream: [FLAT] f32 (already dequantized); meta: [B, 4] i32
        (offset, pooled_len, head_len, valid) -> padded [B, wire_frames]."""
        offset = meta[:, 0]
        pooled_len = meta[:, 1]
        head_len = meta[:, 2]
        j = jnp.arange(self.wire_frames)[None, :]
        stored = jnp.maximum(pooled_len, head_len)[:, None]
        idx = jnp.clip(offset[:, None] + j, 0, stream.shape[0] - 1)
        return jnp.where(j < stored, jnp.take(stream, idx), 0.0), j

    def _stage1_flat_impl(self, flat, aux):
        """flat: [FLAT] u16 (exact) or u8 (fast) quantized frame stream;
        aux: [B, 6] f32 (offset, pooled_len, head_len, valid, lo, step) —
        the integer fields ride the f32 table exactly (all < 2^24), so the
        whole batch crosses the wire in TWO transfers. Per-read
        dequantization v = lo + q * step happens after the gather so each
        read keeps its own affine range (negative / extreme pA survive
        intact)."""
        stream = flat.astype(jnp.float32)
        meta = aux[:, :4].astype(jnp.int32)
        q, j = self._gather_flat(stream, meta)
        stored = jnp.maximum(meta[:, 1], meta[:, 2])[:, None]
        pooled = aux[:, 4:5] + q * aux[:, 5:6]
        pooled = jnp.where(j < stored, pooled, 0.0)
        out = self._stage1_pooled_impl(pooled, meta[:, 1], meta[:, 2],
                                       meta[:, 3] > 0)
        return self._pack_outputs(out)

    def pack_stage1_flat(self, reads):
        """reads: list of (pooled_f32_1d, pooled_len, head_len). Greedily
        fills up to batch_rows reads / the largest flat buffer; returns
        (wire, n_packed) where ``wire`` is the opaque payload for
        dispatch_stage1_flat — reads beyond n_packed go in the next call."""
        B = self.batch_rows
        cap = self.flat_size
        aux = np.zeros((B, 6), np.float32)
        aux[:, 5] = 1.0
        used = 0
        n = 0
        chunks = []
        for pooled, plen, hlen in reads[:B]:
            stored = min(len(pooled), self.wire_frames)
            if used + stored > cap:
                break
            aux[n, :4] = (used, min(plen, stored), min(hlen, stored), 1)
            chunks.append(pooled[:stored])
            used += stored
            n += 1

        dtype, qmax = ((np.uint8, 254) if self.wire_fast
                       else (np.uint16, 65535))
        flat = np.zeros(cap, dtype)
        self._quantize_stream(chunks, flat, aux[:, 4:], qmax)
        return (flat, aux), n

    def dispatch_stage1_flat(self, wire):
        from ..utils.profiling import WIRE
        flat, aux = wire
        WIRE.upload('stage1', flat.nbytes + aux.nbytes)
        flat_d, aux_d = jnp.asarray(flat), jnp.asarray(aux)
        if self._stage1_flat_exe is None and not self._stage1_aot_checked:
            # un-prewarmed session: pick up an executable a previous
            # process serialized (load-only, never compiles here)
            self._stage1_aot_checked = True
            self._stage1_flat_exe = self.aot.load_only(
                'stage1_flat', flat_d, aux_d)
        if self._stage1_flat_exe is not None:
            return self._stage1_flat_exe(flat_d, aux_d)
        return self._stage1_flat(flat_d, aux_d)

    # flat handles unpack the same way as padded ones on a single device;
    # the alias keeps the dispatch/collect interface uniform with
    # parallel.sharding.ShardedEngine.
    def collect_stage1_flat(self, handle):
        return self.collect_stage1(handle)

    def run_stage1_flat(self, reads):
        """Convenience wrapper: packs + runs as many of ``reads`` as fit;
        returns (outputs dict, n_packed)."""
        wire, n = self.pack_stage1_flat(reads)
        out = self.collect_stage1(self.dispatch_stage1_flat(wire))
        return {k: v[:n] for k, v in out.items()}, n

    def segments_for_read(self, first, last, present):
        return self.segmodel.segments_dict(first, last, present)

    def warmup(self):
        """Compile-or-load the token-packed stage-1 program up front. The
        fused stage-1 compile costs tens of seconds on a TPU (the
        unrolled LSTM scans dominate); the AOT cache turns that into an
        executable load on every process after the first."""
        dtype = np.uint8 if self.wire_fast else np.uint16
        aux = np.zeros((self.batch_rows, 6), np.float32)
        aux[:, 5] = 1.0
        flat = np.zeros(self.flat_size, dtype)
        exe = self.aot.load_or_compile(self._stage1_flat, 'stage1_flat',
                                       jnp.asarray(flat), jnp.asarray(aux))
        if exe is not None:
            self._stage1_flat_exe = exe
        self.collect_stage1(self.dispatch_stage1_flat((flat, aux)))
