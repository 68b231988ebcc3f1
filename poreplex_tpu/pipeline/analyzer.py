"""Per-batch analysis driver: host orchestration of the batched device
stages, with the reference's per-read control flow and status lattice
(poreplex/signal_analyzer.py:61-286) re-expressed as batch phases:

  A  host FAST5 load (metadata, raw pA signal, pooled head + body)
  B  device stage 1: scaler + QC + scaling + Viterbi + extents + demux NN
  C  host: segments/dumps/gates; batched poly(A) rounds (device kernels);
     basecall event loading; adapter trim; batched unsplit detection
  D  demux resolution from the stage-1 probabilities
  E  report dicts

Each read can stop at any phase with a status from the reference's
taxonomy; later phases skip stopped reads exactly like the sequential
implementation did.
"""

import os
import sys
import traceback

import numpy as np
import pandas as pd

from .. import fast5
from ..utils.profiling import trace
from .engine import DeviceEngine
from .read import ReadRecord
from .polya import PolyaAnalyzer
from .unsplit import UnsplitReadDetector


class SignalAnalysisError(Exception):
    pass


class BatchAnalyzer:
    """Holds all models/engine state; reused across batches (device-resident
    weights replace the reference's per-worker persistence hack,
    poreplex/worker_persistence.py:35-90)."""

    def __init__(self, config):
        self.config = config
        self.inputdir = config['inputdir']
        self.stride = config['signal_processing']['rough_signal_stride']
        self.engine = DeviceEngine(config)

        # production multi-chip: reads are data-parallel over every local
        # device of the preferred platform (SURVEY.md §2.3); stage-1
        # dispatches route through a batch-sharded mesh whenever more than
        # one chip is addressable, with the same wire format and numerics.
        from ..parallel.mesh import make_mesh, select_devices, batch_sharding
        devices = select_devices(config)
        if len(devices) > 1:
            from ..parallel.sharding import ShardedEngine
            self.mesh = make_mesh(devices)
            self.stage1 = ShardedEngine(self.engine, self.mesh)
            self.kernel_sharding = batch_sharding(self.mesh)
            self.kernel_devices = len(devices)
        else:
            self.mesh = None
            self.stage1 = self.engine
            self.kernel_sharding = None
            self.kernel_devices = 1

        if self.engine.scaler.input_stride != self.stride:
            # on-device head reconstruction (engine._derive_heads) needs the
            # scaler head and the segmentation body to share one pooling
            raise ValueError(
                'scaler input stride ({}) must match rough_signal_stride '
                '({})'.format(self.engine.scaler.input_stride, self.stride))

        kmermodel = pd.read_csv(config['kmer_model'], header=0, index_col=0,
                                sep='\t')
        self.kmermodel = kmermodel
        self.kmersize = len(kmermodel.index[0])

        self.polya_analyzer = (
            PolyaAnalyzer(config['polya_dwell'],
                          sharding=self.kernel_sharding,
                          n_devices=self.kernel_devices,
                          use_pallas=self.engine.use_pallas,
                          batch_rows=self.engine.batch_rows,
                          platform=self.engine.platform,
                          aot_extra_key=self.engine.aot.extra_key)
            if config['measure_polya'] else None)
        self.unsplit_detector = (
            UnsplitReadDetector(config, self.engine.unsplitmodel,
                                sharding=self.kernel_sharding,
                                n_devices=self.kernel_devices,
                                batch_rows=self.engine.batch_rows,
                                use_pallas=self.engine.use_pallas,
                                platform=self.engine.platform,
                                aot_extra_key=self.engine.aot.extra_key)
            if config['filter_unsplit_reads'] else None)

        if config['albacore_onthefly']:
            from ..basecall_albacore import AlbacoreBroker
            self.albacore = AlbacoreBroker(config['albacore_configuration'],
                                           self.kmersize)
        else:
            self.albacore = None

        # PHASE A ingest processes: h5py holds the GIL, so ingest THREADS
        # only steal cycles from device orchestration — offload FAST5
        # reads to spawn-context workers (pipeline/ingest.py). 'auto'
        # follows the reference's -p/--parallel worker-count knob
        # (poreplex/pipeline.py:96); albacore mode needs in-process FAST5
        # handles so it keeps the thread path.
        nproc = config.get('ingest_processes', 'auto')
        if nproc == 'auto':
            nproc = config.get('parallel', 1)
            nproc = nproc if nproc >= 2 else 0
        if self.albacore is not None:
            nproc = 0
        if nproc:
            from .ingest import IngestPool
            self.ingest_pool = IngestPool(config, self.engine, int(nproc))
        else:
            self.ingest_pool = None
        from .ingest import MINIMAL_EVENT_COLUMNS
        self._event_columns = (None if config.get('dump_basecalls')
                               else MINIMAL_EVENT_COLUMNS)

        if config['barcoding']:
            self.demux_threshold = self.engine.demux.score_threshold(
                config['barcoding_quality_filter'])

        if config.get('prewarm'):
            self.warmup()

    def warmup(self):
        """Compile every device-program shape the session can hit (stage-1
        flat sizes, poly(A) fused-round buckets, unsplit event buckets)
        before the first batch. TPU compiles cost seconds to minutes;
        without this they land inside batch latency on first contact with
        each shape. Compiles run CONCURRENTLY: each one is mostly
        tunnel-server latency with the host idle, and parallel compile
        requests pipeline (~3x lower warmup wall than serial)."""
        from concurrent.futures import ThreadPoolExecutor
        jobs = [self.stage1.warmup]
        if self.polya_analyzer is not None:
            jobs += self.polya_analyzer.warmup_jobs()
        if self.unsplit_detector is not None:
            jobs += self.unsplit_detector.warmup_jobs()
        if self.ingest_pool is not None:
            def _warm_pool():
                try:
                    self.ingest_pool.warm()
                except Exception:   # cannot prestart => load_batch falls
                    traceback.print_exc()   # back to in-process ingest
            jobs.append(_warm_pool)
        with trace('warmup'):
            with ThreadPoolExecutor(len(jobs)) as pool:
                for f in list(pool.map(lambda job: job(), jobs)):
                    pass

    # ------------------------------------------------------------------
    def load_batch(self, reads):
        """PHASE A only (host FAST5 ingest); safe to run on an ingest
        thread while the previous batch occupies the compute thread.
        Returns the opaque preloaded state for process_batch.

        Deliberately does NOT dispatch stage-1 from here: with several
        ingest threads racing ahead, the prefetched stage-1 programs of
        future batches queue in front of the current batch's poly(A)
        rounds on the single device and its tunnel, inflating the
        critical path (~+6s on the 2048-read bench, measured twice)."""
        results = []
        records = []
        with trace('A:fast5_load'):
            payloads = None
            if self.ingest_pool is not None:
                try:
                    payloads, timers = self.ingest_pool.load(reads)
                except Exception:
                    # a broken worker pool must not take down the session:
                    # disable it and ingest in-process from here on
                    traceback.print_exc()
                    try:
                        self.ingest_pool.shutdown()
                    except Exception:
                        pass
                    self.ingest_pool = None
            if payloads is not None:
                from ..utils.profiling import GLOBAL_TIMER
                with GLOBAL_TIMER.lock:
                    for name, secs in timers.items():
                        GLOBAL_TIMER.totals[name] += secs
                        GLOBAL_TIMER.counts[name] += 1
                self._records_from_payloads(payloads, results, records)
            else:
                self._phase_a(reads, results, records)
        return results, records, None

    def _records_from_payloads(self, payloads, results, records):
        """Reassemble ReadRecords from ingest-worker payloads
        (pipeline/ingest.py), applying the same status lattice as the
        in-process _load_read path."""
        for p in payloads:
            err = p.get('error')
            if err is not None:
                results.append(err)
                continue
            if p['status'] == 'disappeared':
                results.append({'filename': p['filename'],
                                'read_id': p['read_id'],
                                'status': 'disappeared'})
                continue
            rec = ReadRecord(p['filename'], self.inputdir, p['read_id'])
            meta = p.get('meta')
            if meta is not None:
                (rec.sampling_rate, rec.duration, rec.channel,
                 rec.start_time_s, rec.run_id, rec.sample_id) = meta
            if p['status'] != 'okay' or p.get('stopped'):
                rec.set_status(p['status'], stop=p.get('stopped', False))
            if rec.is_stopped():
                results.append(rec.report())
                continue
            rec.raw_dac = p.get('raw_dac')
            rec.raw_pa = p.get('raw_pa')
            rec.calib = p.get('calib', (1.0, 0.0))
            rec.pooled = p['pooled']
            rec.head_len = p['head_len']
            rec.bcall = p.get('bcall')
            rec.bcall_error = p.get('bcall_error')
            records.append(rec)

    def process_batch(self, batchid, reads, preloaded=None):
        """reads: list of (fast5_filename, read_id).
        Returns (results, aux) where results is the list of report dicts and
        aux carries dump payloads for the io layer. ``preloaded`` accepts
        the output of load_batch to skip PHASE A."""
        if preloaded is None:
            preloaded = self.load_batch(reads)
        results, records = preloaded[0], preloaded[1]
        stage1_state = preloaded[2] if len(preloaded) > 2 else None
        aux = {'adapter_dumps': [], 'event_dumps': []}

        if not records:
            return results, aux

        # ---- PHASE B: device stage 1 ----
        with trace('B:device_stage1'):
            if stage1_state is None:
                stage1_state = self._dispatch_stage1(records)
            stage1 = self._collect_stage1(records, stage1_state)

        for i, rec in enumerate(records):
            if not stage1['qc_ok'][i]:
                rec.set_status('scaling_qc_fail', stop=True)
                continue
            rec.set_scaling_params(
                np.asarray(stage1['scaling'][i], np.float32))
            rec.segments = self.engine.segments_for_read(
                stage1['first'][i], stage1['last'][i], stage1['present'][i])

        # ---- PHASE C: per-read flow with batched sub-phases ----
        failed = {}     # rec -> SignalAnalysisError status

        def fail(rec, status):
            failed[rec] = status

        polya_items = []
        demux_slots = {}
        survivors = []
        for i, rec in enumerate(records):
            if rec.is_stopped() or rec in failed:
                continue
            segments = rec.segments
            if 'adapter' not in segments:
                fail(rec, 'adapter_not_detected')
                continue

            if self.config['dump_adapter_signals']:
                self._dump_adapter_signal(rec, stage1['scaling'][i], aux)

            if self.config['barcoding'] and stage1['demux_ok'][i]:
                demux_slots[rec] = stage1['demux_probs'][i]

            if self.config['measure_polya']:
                # windows are built lazily via rec.dac_window
                if 'polya-tail' in segments:
                    rough_range = segments['polya-tail']
                else:
                    rough_range = (segments['adapter'][1] + 1, None)
                polya_items.append((rec, rough_range))
            survivors.append(rec)

        # dispatch the first poly(A) round BEFORE the host-side event
        # loading; from here the wavefront drives itself on the analyzer's
        # daemon thread (downloads, replays, chains extension rounds —
        # coalesced across concurrent batches), so this thread never
        # blocks on a poly(A) round trip until finish_batch (event dumps
        # read rec.polya, so they are deferred until the wavefront
        # completes)
        polya_state = None
        if polya_items:
            try:
                with trace('C:polya'):
                    polya_state = self.polya_analyzer.start_batch(
                        polya_items, self.stride)
            except Exception:
                # batched poly(A) failure must not take down the whole batch
                traceback.print_exc()

        # basecall events + trim
        unsplit_jobs = []       # (rec, payload_start, windows)
        dump_jobs = []          # (rec, events), written after poly(A)
        with trace('C:events_trim'):
            for rec in survivors:
                if rec in failed:
                    continue
                try:
                    events = self._load_events(rec)
                    if self.config['dump_basecalls']:
                        dump_jobs.append((rec, events))
                    if self.config['trim_adapter']:
                        self._trim_adapter(rec, events)
                    if self.config['filter_unsplit_reads']:
                        payload_start, windows = \
                            self.unsplit_detector.collect_windows(
                                rec, rec.segments, self.stride)
                        if windows:
                            unsplit_jobs.append(
                                (rec, payload_start, windows))
                except SignalAnalysisError as exc:
                    fail(rec, exc.args[0])
                except Exception as exc:
                    err = self._pack_unhandled_exception(
                        rec.filename, rec.read_id, exc)
                    rec.set_error(err['status'], err['error_message'])

        # dispatch the unsplit Viterbi + run-extraction BEFORE collecting
        # the poly(A) round, so its device work and downloads ride under
        # the poly(A) wavefront instead of blocking the compute thread
        unsplit_state = None
        unsplit_flat = None
        if unsplit_jobs:
            unsplit_flat = [(rec, lo, hi) for rec, _, windows in unsplit_jobs
                            for lo, hi in windows]
            try:
                with trace('C:unsplit_dispatch'):
                    unsplit_state = self.unsplit_detector.start_decode(
                        unsplit_flat)
            except Exception:
                traceback.print_exc()   # retried synchronously below

        if unsplit_flat is not None:
            runs = None
            with trace('C:unsplit_viterbi'):
                try:
                    runs = (self.unsplit_detector.finish_decode(unsplit_state)
                            if unsplit_state is not None else
                            self.unsplit_detector.decode_runs_batched(
                                unsplit_flat))
                except Exception as exc:
                    # the filter was explicitly requested: a persistent
                    # decode failure must surface per read, not silently
                    # pass unfiltered artifacts downstream
                    for rec, _ps, _w in unsplit_jobs:
                        if rec in failed or rec.error_message:
                            continue
                        err = self._pack_unhandled_exception(
                            rec.filename, rec.read_id, exc)
                        rec.set_error(err['status'], err['error_message'])
        if unsplit_flat is not None and runs is not None:
            cursor = 0
            with trace('C:unsplit_analyze'):
                for rec, payload_start, windows in unsplit_jobs:
                    if rec in failed or rec.error_message:
                        cursor += len(windows)
                        continue
                    wruns = runs[cursor:cursor + len(windows)]
                    cursor += len(windows)
                    try:
                        if self.unsplit_detector.analyze_read(
                                rec, payload_start, windows, wruns):
                            fail(rec, 'unsplit_read')
                    except Exception as exc:
                        err = self._pack_unhandled_exception(
                            rec.filename, rec.read_id, exc)
                        rec.set_error(err['status'], err['error_message'])

        # park until the self-driving wavefront settles this batch's
        # tasks (GIL-free; the other compute thread keeps dispatching),
        # then write the deferred event dumps (their attrs read rec.polya)
        if polya_state is not None:
            try:
                with trace('C:polya'):
                    self.polya_analyzer.finish_batch(polya_state,
                                                     self.stride)
            except Exception:
                traceback.print_exc()
        for rec, events in dump_jobs:
            self._dump_events(rec, events, aux)

        # sequence length filter + labels
        for rec in survivors:
            if rec in failed or rec.error_message:
                continue
            if rec.sequence is not None:
                readlength = len(rec.sequence[0]) - rec.sequence[2]
                if readlength < self.config['minimum_sequence_length']:
                    fail(rec, 'sequence_too_short')

        for rec, status in failed.items():
            outname = 'artifact' if status in ('unsplit_read',) else 'fail'
            rec.set_status(status, stop=True)
            rec.set_label(outname)
        for rec in survivors:
            if rec not in failed and not rec.error_message:
                rec.set_label('pass')

        # ---- PHASE D: demux resolution ----
        if self.config['barcoding']:
            decoys = self.engine.demux.number_of_decoy_labels
            for rec, probs in demux_slots.items():
                bcid = int(np.argmax(probs)) - decoys
                score = float(np.max(probs))
                effective = (bcid if bcid >= 0 and
                             score >= self.demux_threshold else None)
                calib = self.engine.demux.lookup_calibrated_phred_score(score)
                rec.set_barcode(effective, int(bcid), calib)

        # ---- PHASE E: reports ----
        for rec in records:
            results.append(rec.report())
            rec.clear_cache()
            if rec.fast5 is not None:
                rec.fast5.close()
                rec.fast5 = None
        return results, aux

    # ------------------------------------------------------------------
    def _phase_a(self, reads, results, records):
        # all reads of one multi-read file in this batch share one open
        # h5py handle (refcounted; released as each record closes)
        pool = fast5.Fast5FilePool()
        for f5file, read_id in reads:
            if not os.path.exists(os.path.join(self.inputdir, f5file)):
                results.append({'filename': f5file, 'read_id': read_id,
                                'status': 'disappeared'})
                continue
            rec = ReadRecord(f5file, self.inputdir, read_id)
            try:
                self._load_read(rec, pool)
            except Exception as exc:
                results.append(self._pack_unhandled_exception(
                    f5file, read_id, exc))
                continue
            if rec.is_stopped():
                results.append(rec.report())
            else:
                records.append(rec)

    # ------------------------------------------------------------------
    def _load_read(self, rec, pool=None):
        try:
            with trace('A:open'):
                f5 = fast5.Fast5Reader(rec.fullpath, rec.read_id, pool=pool)
        except Exception:
            traceback.print_exc()
            rec.set_status('irregular_fast5', stop=True)
            return
        rec.fast5 = f5
        rec.sampling_rate = f5.sampling_rate
        rec.duration = f5.duration
        rec.channel = f5.channel_number
        rec.start_time_s = round(f5.start_time / f5.sampling_rate, 3)
        rec.run_id = f5.run_id
        rec.sample_id = f5.sample_id

        # minimum-signal gate of the scaler head (poreplex/
        # signal_loader.py:212-231); the head itself is no longer pooled
        # on the host — it is the first <=2000 frames of rec.pooled and
        # gets reconstructed on device from the single wire payload.
        scaler = self.engine.scaler
        sigload_length = min(scaler.input_length, f5.duration)
        sigload_length -= sigload_length % scaler.input_stride
        if sigload_length < scaler.min_length:
            rec.set_status('scaler_signal_too_short', stop=True)
            f5.close()
            return

        with trace('A:raw'):
            raw = f5.get_raw_dac()
        with trace('A:pool'):
            # pool in DAC units and apply the per-read pA affine to the
            # pooled means only (1/stride of the samples): the mean
            # commutes with the affine, so this replaces the reference's
            # per-sample pA conversion (poreplex/fast5_file.py:122-131)
            # with a single small pass. The integer DAC stays on the
            # record so poly(A) windows can ship losslessly (read.py
            # dac_window).
            pa_scale = np.float32(f5.pa_scale)
            pa_shift = np.float32(f5.pa_scale * f5.offset)
            trimmed = raw[:len(raw) - len(raw) % self.stride]
            pooled = trimmed.reshape(-1, self.stride).mean(
                axis=1, dtype=np.float32)
            if raw.dtype.kind in 'iu' and raw.dtype.itemsize <= 2:
                rec.raw_dac = raw
                rec.calib = (float(f5.pa_scale), float(f5.offset))
                rec.pooled = pooled * pa_scale + pa_shift
            else:
                # exotic container (f32 or wide-int signal): fall back to
                # a converted pA array; windows quantize min/max as before
                rec.raw_pa = np.asarray(raw * pa_scale + pa_shift,
                                        np.float32)
                rec.pooled = pooled * pa_scale + pa_shift
        rec.head_len = min(scaler.pooled_length, len(rec.pooled))

        # prefetch the basecall table on the ingest thread: the HDF5 reads
        # are the bulk of the events/trim cost and have no dependency on
        # stage-1, so they come off the compute thread's critical path
        # (the not_basecalled status is still raised in PHASE C, keeping
        # the reference's status-precedence order). A corrupt basecall
        # group must not fail the read here either — stage-1 statuses
        # (e.g. scaler QC) take precedence in the reference, so the error
        # is stashed and re-raised from _load_fast5_events in PHASE C.
        if self.albacore is None:
            try:
                with trace('A:bcall'):
                    rec.bcall = f5.get_basecall(
                        columns=self._event_columns)
            except Exception as exc:
                rec.bcall_error = exc

    def _dispatch_stage1(self, records):
        """Token-packed device dispatch: reads' pooled frames travel as one
        flat stream (engine.pack_stage1_flat), so the wire pays actual
        frames instead of [B, seg_frames] padding. All sub-batches are
        dispatched before any result is awaited, and a daemon pump thread
        collects them (the tunneled computation only progresses while
        something awaits it). Returns opaque state for _collect_stage1."""
        import threading
        frames = self.engine.seg_frames
        reads = [(rec.pooled,
                  min(len(rec.pooled), frames),
                  rec.head_len) for rec in records]
        handles = []
        counts = []
        while reads:
            wire, n = self.stage1.pack_stage1_flat(reads)
            handles.append(self.stage1.dispatch_stage1_flat(wire))
            counts.append(n)
            reads = reads[n:]
        chunks = [None] * len(handles)

        def pump():
            try:        # overlap the per-launch download round trips
                for h in handles:
                    h.copy_to_host_async()
            except Exception:
                pass
            for i, h in enumerate(handles):
                chunks[i] = self.stage1.collect_stage1_flat(h)

        pump_thread = threading.Thread(target=pump, daemon=True)
        pump_thread.start()
        return handles, counts, chunks, pump_thread

    def _collect_stage1(self, records, state):
        handles, counts, chunks, pump_thread = state
        pump_thread.join()
        if any(c is None for c in chunks):      # pump died on an error
            chunks = [self.stage1.collect_stage1_flat(h) for h in handles]
        n = len(records)
        return {k: np.concatenate([c[k][:cnt] for c, cnt in
                                   zip(chunks, counts)])[:n]
                for k in chunks[0]}

    def _scaled_pooled_signal(self, rec, scaling):
        scale, shift = scaling
        return rec.pooled * float(scale) + float(shift)

    # ------------------------------------------------------------------
    def _load_events(self, rec):
        """(poreplex/signal_analyzer.py:311-326)"""
        if self.albacore is not None:
            events = self._call_albacore(rec)
        else:
            events = self._load_fast5_events(rec)

        if rec.scaling_params is None:
            raise Exception('Signal scaling is not available yet.')
        scale, shift = rec.scaling_params
        events['scaled_mean'] = events['mean'] * float(scale) + float(shift)
        events['pos'] = np.cumsum(events['move'])
        duration = np.hstack(
            (np.diff(events['start']), [1])).astype(np.int64)
        events['end'] = events['start'] + duration
        rec.events = events
        return events

    def _load_fast5_events(self, rec):
        if rec.bcall_error is not None:
            raise rec.bcall_error       # deferred PHASE A prefetch failure
        bcall = rec.bcall
        if bcall is None:
            raise SignalAnalysisError('not_basecalled')
        rec.sequence_length = bcall['sequence_length']
        rec.mean_qscore = bcall['mean_qscore']
        rec.num_events = bcall['num_events']
        rec.sequence = (bcall['sequence'], bcall['qstring'], 0)
        return bcall['events']

    def _call_albacore(self, rec):
        rawdata = rec.fast5.get_raw_data()
        bcall = self.albacore.basecall(
            rawdata, rec.fast5,
            os.path.basename(rec.filename).rsplit('.', 1)[0])
        if bcall is None:
            raise SignalAnalysisError('not_basecalled')
        rec.sequence_length = bcall['sequence_length']
        rec.mean_qscore = bcall['mean_qscore']
        rec.num_events = bcall['called_events']
        rec.sequence = (bcall['sequence'], bcall['qstring'], 0)
        return bcall['events']

    def _trim_adapter(self, rec, events):
        """Replicates poreplex/signal_analyzer.py:328-344 including the
        early return when a sequence exists (which makes signal-guided
        trimming a no-op in the reference, see SURVEY.md §3.2); set
        ``fix_trim_adapter: true`` in the preset to enable the evidently
        intended behavior."""
        sequence = rec.sequence
        if sequence is not None and not self.config.get('fix_trim_adapter'):
            return
        if sequence is None:
            return

        adapter_end = rec.segments['adapter'][1] * self.stride
        kmer_lead_size = self.kmersize // 2
        sel = events['start'] <= adapter_end
        if sel.sum() <= 0:
            return
        adapter_basecall_length = int(events['move'][sel].sum()) + \
            kmer_lead_size
        if adapter_basecall_length > len(sequence[0]):
            raise SignalAnalysisError('basecall_table_incomplete')
        elif adapter_basecall_length > 0:
            rec.set_adapter_trimming_length(adapter_basecall_length)

    # ------------------------------------------------------------------
    def _dump_adapter_signal(self, rec, scaling, aux):
        a0, a1 = rec.segments['adapter']
        signal = self._scaled_pooled_signal(rec, scaling)[a0:a1 + 1]
        if len(signal) > 0:
            aux['adapter_dumps'].append(
                (rec.read_id, np.asarray(signal, np.float32),
                 a0 * self.stride, (a1 + 1) * self.stride))

    def _dump_events(self, rec, events, aux):
        attrs = []
        if rec.scaling_params is not None:
            attrs.append(('signal_scale', rec.scaling_params[0]))
            attrs.append(('signal_shift', rec.scaling_params[1]))
        if 'adapter' in rec.segments:
            attrs.append(('adapter_begin',
                          np.uint32(rec.segments['adapter'][0] * self.stride)))
            attrs.append(('adapter_end',
                          np.uint32((rec.segments['adapter'][1] + 1) *
                                    self.stride)))
        if rec.polya is not None:
            if 'polya-tail' in rec.segments:
                attrs.append(('polya_end_debug',
                              np.uint32((rec.segments['polya-tail'][1] + 1) *
                                        self.stride)))
            attrs.append(('polya_begin', np.uint32(rec.polya['begin'])))
            attrs.append(('polya_end', np.uint32(rec.polya['end'])))
            attrs.append(('spikes', repr(rec.polya['spikes']).encode()))
        aux['event_dumps'].append((rec.read_id, events.copy(), attrs))

    def _pack_unhandled_exception(self, f5filename, read_id, exc):
        from ..utils import pack_unhandled_exception
        return pack_unhandled_exception(f5filename, read_id, exc,
                                        sys.exc_info()[2])


# the live analyzer and a strong reference to the exact config object it
# was built from — identity comparison against a held reference cannot be
# fooled by id() reuse after garbage collection
_ANALYZER_CACHE = {'config': None, 'analyzer': None}


def get_analyzer(config):
    if _ANALYZER_CACHE['config'] is not config:
        _ANALYZER_CACHE['analyzer'] = BatchAnalyzer(config)
        _ANALYZER_CACHE['config'] = config
    return _ANALYZER_CACHE['analyzer']


def load_batch(reads, config):
    """PHASE A on an ingest thread; returns opaque preloaded state (or an
    error tuple like process_batch)."""
    try:
        return get_analyzer(config).load_batch(reads)
    except Exception as exc:
        exc_tb = sys.exc_info()[2]
        filename = os.path.split(
            exc_tb.tb_frame.f_code.co_filename)[-1] if exc_tb else '?'
        return (-1, '[{filename}:{lineno}] Unhandled exception {name}: {msg}'
                .format(filename=filename,
                        lineno=exc_tb.tb_lineno if exc_tb else 0,
                        name=type(exc).__name__, msg=str(exc)),
                traceback.format_exc())


def process_batch(batchid, reads, config, preloaded=None):
    """Top-level batch entry with the reference's error packing contract
    (poreplex/signal_analyzer.py:46-58): returns the result list, or a
    (-1, message, traceback) tuple on an unhandled batch-level error.
    The heavyweight BatchAnalyzer persists across calls."""
    try:
        analyzer = get_analyzer(config)
        results, aux = analyzer.process_batch(batchid, reads, preloaded)
        return results, aux
    except Exception as exc:
        exc_tb = sys.exc_info()[2]
        filename = os.path.split(
            exc_tb.tb_frame.f_code.co_filename)[-1] if exc_tb else '?'
        return (-1, '[{filename}:{lineno}] Unhandled exception {name}: {msg}'
                .format(filename=filename,
                        lineno=exc_tb.tb_lineno if exc_tb else 0,
                        name=type(exc).__name__, msg=str(exc)),
                traceback.format_exc())
