"""Asyncio processing session.

Orchestration mirrors the reference's event loop design
(poreplex/pipeline.py:80-583) with one architectural change: compute runs
on the local TPU through a single persistent BatchAnalyzer (device-resident
weights) driven from a one-thread executor, instead of a pickling process
pool. Ingest scanning, live monitoring, batch queueing/dedup, writer
fan-out, stall flushing, early stop and final inventories keep the
reference's semantics.
"""

import asyncio
import os
import sys
import traceback
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor, CancelledError
from io import StringIO
from itertools import cycle

from .. import OUTPUT_NAME_FAILED
from ..fast5 import get_read_ids
from ..utils import errprint
from ..io.writers import (
    FASTQWriter, FAST5Writer, SequencingSummaryWriter,
    NanopolishReadDBWriter, FinalSummaryTracker, DumpWriter,
    create_adapter_dumps_inventory, create_events_inventory)
from .analyzer import process_batch, load_batch

FAST5_SUFFIX = '.fast5'


def scan_dir_worker(dirname, suffix=FAST5_SUFFIX):
    files, dirs = [], []
    for entryname in os.listdir(dirname):
        if entryname.startswith('.'):
            continue
        fullpath = os.path.join(dirname, entryname)
        if os.path.isdir(fullpath):
            dirs.append(entryname)
        elif entryname.lower().endswith(suffix):
            files.append(entryname)
    return dirs, files


class ProcessingSession:

    def __init__(self, config, logger):
        self.running = True
        self.scan_finished = False
        self.reads_queued = self.reads_found = 0
        self.reads_processed = 0
        self.next_batch_id = 0
        self.reads_done = set()
        self.active_batches = 0
        self.error_status_counts = defaultdict(int)
        self.jobstack = []

        self.config = config
        self.logger = logger

        # multi-host: this session owns a deterministic slice of the read
        # entries; final counts are reduced across hosts at the end
        # (SURVEY.md §5.8; jax.distributed must be initialized by the CLI
        # before the session starts)
        from ..parallel import distributed
        self.dist_rank, self.dist_size = distributed.process_info()
        if self.dist_size > 1:
            logger.info('Distributed session: host %d of %d',
                        self.dist_rank, self.dist_size)

        # >1 compute thread keeps the device fed while another batch's
        # host-side phases (poly(A) wavefront rounds, event tables, unsplit
        # analysis) wait on transfers — batches may then complete out of
        # order, which matches the reference's own N-process pool behavior
        # (poreplex/pipeline.py:96); all writers take per-writer locks
        self.executor_compute = ThreadPoolExecutor(
            max(1, config.get('compute_threads', 2)))
        self.executor_io = ThreadPoolExecutor(config.get('io_threads', 2))
        # ingest threads: the poreplex `-p/--parallel` knob
        # (poreplex/pipeline.py:96) maps to host-side FAST5 ingest here —
        # device compute is batched on the accelerator regardless
        self.executor_mon = ThreadPoolExecutor(
            max(2, config.get('parallel', 1)))

        self.loop = None
        self.fastq_writer = self.fast5_writer = None
        self.npreaddb_writer = self.alignment_writer = None
        self.seqsummary_writer = None
        self.dump_writer = None
        self.dashboard = self.pbar = None

        # processed-read manifest: persisted superset of the in-memory
        # reads_done dedup set (the reference loses it on exit,
        # poreplex/pipeline.py:88 / SURVEY.md §5.4); enables --resume
        self.manifest_path = os.path.join(config['outputdir'],
                                          '.processed-reads')
        self.manifest_file = None
        if config.get('resume'):
            self._load_manifest()

    # ------------------------------------------------------------------
    def __enter__(self):
        self.loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self.loop)

        import signal as signal_mod
        for signame in ('SIGINT', 'SIGTERM'):
            try:
                self.loop.add_signal_handler(
                    getattr(signal_mod, signame), self.stop, signame)
            except (NotImplementedError, RuntimeError):
                pass

        if self.config['fastq_output']:
            self.fastq_writer = FASTQWriter(
                self.config['outputdir'], self.config['output_layout'])
        if self.config['fast5_output']:
            self.fast5_writer = FAST5Writer(
                self.config['outputdir'], self.config['output_layout'],
                self.config['inputdir'], self.config['fast5_batch_size'])
        if self.config['nanopolish_output']:
            self.npreaddb_writer = NanopolishReadDBWriter(
                self.config['outputdir'], self.config['output_layout'])
        self.seqsummary_writer = SequencingSummaryWriter(
            self.config, self.config['outputdir'],
            self.config['label_names'], self.config['barcode_names'])
        self.finalsummary_tracker = FinalSummaryTracker(
            self.config['label_names'], self.config['barcode_names'])
        if (self.config['dump_adapter_signals'] or
                self.config['dump_basecalls']):
            self.dump_writer = DumpWriter(self.config)

        if self.config['minimap2_index']:
            self.show_message('==> Loading a minimap2 index file')
            from ..alignment import AlignmentWriter
            self.alignment_writer = AlignmentWriter(
                self.config['minimap2_index'],
                os.path.join(self.config['outputdir'], 'bam', '{}.bam'),
                self.config['output_layout'])
        return self

    def __exit__(self, *args):
        for writer in (self.fastq_writer, self.fast5_writer,
                       self.npreaddb_writer, self.seqsummary_writer,
                       self.alignment_writer, self.dump_writer):
            if writer is not None:
                writer.close()
        self.fastq_writer = self.fast5_writer = None
        self.npreaddb_writer = self.seqsummary_writer = None
        self.alignment_writer = self.dump_writer = None
        if self.manifest_file is not None:
            self.manifest_file.close()
            self.manifest_file = None

        self.executor_mon.shutdown()
        self.executor_io.shutdown()
        self.executor_compute.shutdown()
        self.loop.close()

    # ------------------------------------------------------------------
    def _load_manifest(self):
        if not os.path.exists(self.manifest_path):
            return
        with open(self.manifest_path) as f:
            for line in f:
                parts = line.rstrip('\n').split('\t')
                if len(parts) == 2:
                    self.reads_done.add((parts[0], parts[1]))
        if self.reads_done:
            self.show_message('==> Resuming: {} reads already processed'
                              .format(len(self.reads_done)))

    def _record_processed(self, readpaths):
        if self.manifest_file is None:
            self.manifest_file = open(self.manifest_path, 'a')
        for filename, read_id in readpaths:
            self.manifest_file.write('{}\t{}\n'.format(filename, read_id))
        self.manifest_file.flush()

    # ------------------------------------------------------------------
    def errx(self, message):
        if self.running:
            errprint(message)
            self.stop('ERROR')

    def show_message(self, message):
        if not self.config['quiet']:
            print(message)

    def stop(self, signalname='unknown'):
        if self.running:
            if signalname in ('SIGTERM', 'SIGINT'):
                errprint('\nTermination in process. Please wait for a moment.')
            self.running = False
        for task in asyncio.all_tasks(self.loop):
            task.cancel()

    def run_in_executor_compute(self, *args):
        return self.loop.run_in_executor(self.executor_compute, *args)

    def run_in_executor_io(self, fn, *args):
        return self.loop.run_in_executor(
            self.executor_io, self._timed_io, fn, *args)

    @staticmethod
    def _timed_io(fn, *args):
        # per-writer wall time on the io thread, reported with the other
        # stage timings at session end (SURVEY.md §7.3: output fan-out must
        # be visible next to ingest/device time to spot host-I/O bottlenecks)
        from ..utils.profiling import GLOBAL_TIMER
        with GLOBAL_TIMER.stage(
                'D:io_' + getattr(fn, '__qualname__', 'call')):
            return fn(*args)

    def run_in_executor_mon(self, *args):
        return self.loop.run_in_executor(self.executor_mon, *args)

    # ------------------------------------------------------------------
    async def run_process_batch(self, batchid, files):
        if self.config['analysis_start_delay'] > 0:
            try:
                await asyncio.sleep(self.config['analysis_start_delay'])
            except CancelledError:
                return

        self.active_batches += 1
        try:
            # FAST5 ingest on a monitor thread overlaps the device compute
            # of the previous batch (double-buffered pipeline)
            preloaded = await self.run_in_executor_mon(
                load_batch, files, self.config)
            if isinstance(preloaded, tuple) and len(preloaded) == 3 and \
                    preloaded[0] == -1:
                outcome = preloaded
            else:
                outcome = await self.run_in_executor_compute(
                    process_batch, batchid, files, self.config, preloaded)

            if isinstance(outcome, tuple) and len(outcome) == 3 and \
                    outcome[0] == -1:
                error_message = outcome[1]
                self.logger.error(error_message)
                for line in outcome[2].splitlines():
                    self.logger.error(line)
                self.errx('ERROR: ' + error_message)
                return

            results, aux = outcome

            # dedup (live-mode refeeds) — poreplex/pipeline.py:215-229
            nd_results = []
            newly_done = []
            for result in results:
                readpath = result['filename'], result['read_id']
                if readpath not in self.reads_done:
                    if result['status'] == 'okay':
                        self.reads_done.add(readpath)
                        newly_done.append(readpath)
                    elif 'error_message' in result:
                        self.logger.error(result['error_message'])
                    nd_results.append(result)
                else:
                    self.reads_queued -= 1
                    self.reads_found -= 1
                self.error_status_counts[result['status']] += 1
            if newly_done:
                self._record_processed(newly_done)

            if nd_results:
                if self.config['fastq_output']:
                    await self.run_in_executor_io(
                        self.fastq_writer.write_sequences, nd_results)
                if self.config['fast5_output']:
                    await self.run_in_executor_io(
                        self.fast5_writer.transfer_reads, nd_results)
                if self.config['nanopolish_output']:
                    await self.run_in_executor_io(
                        self.npreaddb_writer.write_sequences, nd_results)
                if self.alignment_writer is not None:
                    rescounts = await self.run_in_executor_io(
                        self.alignment_writer.process, nd_results)
                    if self.dashboard is not None:
                        self.dashboard.feed_mapped(rescounts)
                if self.dump_writer is not None:
                    await self.run_in_executor_io(
                        self.dump_writer.write_aux, batchid, aux)
                await self.run_in_executor_io(
                    self.seqsummary_writer.write_results, nd_results)
                self.finalsummary_tracker.feed_results(nd_results)

            # early stop on non-basecalled stream — poreplex/pipeline.py:252-262
            if (self.error_status_counts['okay'] == 0 and self.running and
                    self.error_status_counts['not_basecalled'] >=
                    self.config['nobasecall_stop_trigger']):
                stopmsg = (
                    'Early stopping: {} out of {} reads are not basecalled. '
                    'Please check if the files are correctly analyzed, or '
                    'add `--basecall\' to the command line.'.format(
                        self.error_status_counts['not_basecalled'],
                        sum(self.error_status_counts.values())))
                self.logger.error(stopmsg)
                self.errx(stopmsg)

        except CancelledError:
            return
        except Exception as exc:
            self.logger.error('Unhandled error during processing reads',
                              exc_info=exc)
            return self.errx('ERROR: Unhandled error ' + str(exc))
        finally:
            self.active_batches -= 1

        self.reads_processed += len(nd_results)
        self.reads_queued -= len(nd_results)

    # ------------------------------------------------------------------
    def queue_processing(self, readpath):
        """Admit one (filename, read_id) entry into the pending batch. On a
        multi-host run only the entries this host owns (stable hash slice)
        are admitted; a full pending batch submits immediately."""
        from ..parallel import distributed
        if not distributed.owns_entry(readpath, self.dist_rank,
                                      self.dist_size):
            return
        self.reads_found += 1
        self.reads_queued += 1
        self.jobstack.append(readpath)
        if len(self.jobstack) >= self.config['batch_chunk_size']:
            self.flush_jobstack()

    def flush_jobstack(self):
        """Submit whatever is pending as one batch task. Entries that
        finished since they were queued (live-mode refeeds) are dropped
        here, with the found/queued counters rolled back."""
        if not (self.running and self.jobstack):
            return
        pending, self.jobstack = self.jobstack, []
        fresh = [entry for entry in pending if entry not in self.reads_done]
        already_done = len(pending) - len(fresh)
        if already_done:
            self.reads_queued -= already_done
            self.reads_found -= already_done
        if fresh:
            batch_id = self.next_batch_id
            self.next_batch_id += 1
            self.loop.create_task(self.run_process_batch(batch_id, fresh))

    async def scan_dir_recursive(self, topdir, dirname=''):
        if not self.running:
            return
        is_topdir = (dirname == '')
        try:
            errormsg = None
            dirs, files = await self.run_in_executor_mon(
                scan_dir_worker, os.path.join(topdir, dirname))
        except CancelledError:
            if is_topdir:
                return
            raise
        except Exception as exc:
            errormsg = str(exc)
        if errormsg is not None:
            return self.errx('ERROR: ' + str(errormsg))

        for filename in files:
            filepath = os.path.join(dirname, filename)
            try:
                for readpath in get_read_ids(filepath, topdir):
                    self.queue_processing(readpath)
            except Exception as exc:
                self.logger.error('Could not list reads in %s: %s',
                                  filepath, exc)

        try:
            for subdir in dirs:
                await self.scan_dir_recursive(
                    topdir, os.path.join(dirname, subdir))
        except CancelledError:
            if is_topdir:
                return
            raise

        if is_topdir:
            self.flush_jobstack()
            self.scan_finished = True

    # ------------------------------------------------------------------
    async def live_watch_inputs(self, topdir, suffix=FAST5_SUFFIX):
        """Watch for new FAST5 files. Uses inotify when importable,
        otherwise a portable mtime-polling fallback
        (role of poreplex/pipeline.py:339-368)."""
        try:
            from inotify.adapters import InotifyTree
            from inotify.constants import IN_CLOSE_WRITE, IN_MOVED_TO
            have_inotify = True
        except ImportError:
            have_inotify = False

        topdir = os.path.abspath(topdir) + '/'
        is_fast5 = lambda fn: fn[:1] != '.' and fn.lower().endswith(suffix)

        try:
            if have_inotify:
                watch_flags = IN_CLOSE_WRITE | IN_MOVED_TO
                evgen = InotifyTree(topdir, mask=watch_flags).event_gen()
                while True:
                    event = await self.run_in_executor_mon(next, evgen)
                    if event is None:
                        continue
                    header, type_names, path, filename = event
                    if 'IN_ISDIR' in type_names:
                        continue
                    if header.mask & watch_flags and is_fast5(filename):
                        common = os.path.commonprefix([topdir, path])
                        if common != topdir:
                            errprint('ERROR: Change of {} detected, which is '
                                     'outside {}.'.format(path, topdir))
                            continue
                        relpath = os.path.join(path[len(common):], filename)
                        for readpath in get_read_ids(relpath, topdir):
                            if readpath not in self.reads_done:
                                self.queue_processing(readpath)
            else:
                seen = {}
                while self.running:
                    await asyncio.sleep(2.0)
                    snapshot = await self.run_in_executor_mon(
                        self._snapshot_tree, topdir, suffix)
                    for relpath, mtime in snapshot.items():
                        if seen.get(relpath) == mtime:
                            continue
                        seen[relpath] = mtime
                        try:
                            for readpath in get_read_ids(relpath, topdir):
                                if readpath not in self.reads_done:
                                    self.queue_processing(readpath)
                        except Exception:
                            pass
        except CancelledError:
            pass

    @staticmethod
    def _snapshot_tree(topdir, suffix):
        snapshot = {}
        for root, dirs, files in os.walk(topdir):
            dirs[:] = [d for d in dirs if not d.startswith('.')]
            for fn in files:
                if fn[:1] != '.' and fn.lower().endswith(suffix):
                    full = os.path.join(root, fn)
                    try:
                        snapshot[os.path.relpath(full, topdir)] = \
                            os.stat(full).st_mtime
                    except OSError:
                        pass
        return snapshot

    # ------------------------------------------------------------------
    async def wait_until_finish(self):
        while self.running:
            try:
                await asyncio.sleep(0.2)
            except CancelledError:
                break
            if self.scan_finished and self.reads_queued <= 0 and \
                    self.active_batches <= 0:
                break

    async def force_flushing_stalled_queue(self):
        """Live-mode watchdog (role of poreplex/pipeline.py:451-472): when
        no new reads have been discovered for two consecutive heartbeats
        while entries sit below the batch threshold, submit them anyway so
        a paused sequencer does not strand a partial batch."""
        heartbeat = max(10, int(self.config['analysis_start_delay']) // 2)
        last_found = -1
        quiet_beats = 0
        while self.running:
            try:
                await asyncio.sleep(heartbeat)
            except CancelledError:
                break
            if self.reads_found != last_found:
                last_found = self.reads_found
                quiet_beats = 0
            elif self.reads_queued > 0:
                quiet_beats += 1
                if quiet_beats >= 2:
                    quiet_beats = 0
                    self.flush_jobstack()

    async def show_progresses_offline(self):
        spinner = cycle(r'/-\|')
        prev_width = 0
        while self.running:
            msg = '\r[{}] {} processed / {} found{}'.format(
                next(spinner), self.reads_processed, self.reads_found,
                '' if self.scan_finished else ' (scanning)')
            if len(msg) < prev_width:
                msg += ' ' * (prev_width - len(msg))
            prev_width = len(msg)
            sys.stdout.write(msg)
            sys.stdout.flush()
            try:
                await asyncio.sleep(0.3)
            except CancelledError:
                break

    async def show_progresses_live(self):
        self.show_message('==> Entering LIVE mode.')
        self.show_message('\nPress Ctrl-C when the sequencing run is '
                          'finished.')
        self.show_message('(!) An analysis starts at least {} seconds after '
                          'the file is discovered.'.format(
                              self.config['analysis_start_delay']))
        spinner = cycle(r'/-\|')
        prev_width = 0
        while self.running:
            msg = '\rLIVE [{}] {} processed, {} queued ({} total reads)'.format(
                next(spinner), self.reads_processed, self.reads_queued,
                self.reads_found)
            if len(msg) < prev_width:
                msg += ' ' * (prev_width - len(msg))
            prev_width = len(msg)
            sys.stdout.write(msg)
            sys.stdout.flush()
            try:
                await asyncio.sleep(0.3)
            except CancelledError:
                break

    def start_dashboard(self):
        from .. import dashboard
        if self.config['contig_aliases'] and self.config['minimap2_index']:
            aliases = dashboard.load_aliases(self.config['contig_aliases'])
        else:
            aliases = {}
        view = dashboard.DashboardView(
            self, self.config['barcode_names'], 'progress', 'mapped_rate',
            self.config['analysis_start_delay'], aliases)
        view.start(self.loop, bool(self.config['minimap2_index']))
        return view

    def finalize_results(self):
        # the catalog tables are written on close; the part files must be
        # finalized before the inventories link into them
        if self.dump_writer is not None:
            self.dump_writer.close()
        if self.config['dump_adapter_signals']:
            self.show_message(
                '==> Creating an inventory for adapter signal dumps')
            prefix = os.path.join(self.config['outputdir'], 'adapter-dumps')
            create_adapter_dumps_inventory(
                os.path.join(prefix, 'inventory.h5'),
                os.path.join(prefix, 'part-*.h5'))
        if self.config['dump_basecalls']:
            self.show_message(
                '==> Creating an inventory for basecalled events')
            prefix = os.path.join(self.config['outputdir'], 'events')
            create_events_inventory(
                os.path.join(prefix, 'inventory.h5'),
                os.path.join(prefix, 'part-*.h5'))

    # ------------------------------------------------------------------
    @classmethod
    def run(cls, config, logger):
        with cls(config, logger) as sess:
            sess.show_message('==> Processing FAST5 files')

            if config['live']:
                mon_task = sess.loop.create_task(
                    sess.force_flushing_stalled_queue())
                finish_task = sess.loop.create_task(sess.wait_for_stop())
            else:
                mon_task = sess.loop.create_task(sess.wait_until_finish())
                finish_task = mon_task

            if config['quiet']:
                pass
            elif config['dashboard']:
                sess.dashboard = sess.start_dashboard()
            elif config['live']:
                sess.loop.create_task(sess.show_progresses_live())
            else:
                sess.loop.create_task(sess.show_progresses_offline())

            sess.loop.create_task(sess.scan_dir_recursive(config['inputdir']))
            if config['live']:
                sess.loop.create_task(
                    sess.live_watch_inputs(config['inputdir']))

            try:
                sess.loop.run_until_complete(finish_task)
            except (CancelledError, asyncio.CancelledError):
                errprint('\nInterrupted')
            except Exception as exc:
                if (isinstance(exc, RuntimeError) and
                        str(exc).startswith('Event loop stopped')):
                    pass
                else:
                    errf = StringIO()
                    traceback.print_exc(file=errf)
                    errprint('\nERROR: ' + str(exc))
                    for line in errf.getvalue().splitlines():
                        logger.error(line)

            if sess.dashboard is not None:
                sess.dashboard.stop()

            # drain remaining tasks
            pending = [t for t in asyncio.all_tasks(sess.loop)
                       if not (t.done() or t.cancelled())]
            for task in pending:
                task.cancel()
                try:
                    sess.loop.run_until_complete(task)
                except (CancelledError, asyncio.CancelledError):
                    pass
                except Exception as exc:
                    if not (isinstance(exc, RuntimeError) and
                            str(exc).startswith('Event loop stopped')):
                        errprint('\nERROR: ' + str(exc))

            if not config['quiet'] and sess.scan_finished:
                sess.show_message('')
            from ..utils.profiling import GLOBAL_TIMER
            GLOBAL_TIMER.report(logger)

            if sess.scan_finished and \
                    sess.reads_found == sess.reads_processed:
                sess.finalize_results()
                if sess.dist_size > 1:
                    # collective: every host must reach this point (the
                    # failure mode of a host dying earlier is fail-fast at
                    # the jax.distributed layer); host 0 prints the merged
                    # count matrix, others stay quiet
                    from collections import defaultdict as _dd
                    from ..parallel import distributed
                    logger.info('Merging final counts across %d hosts',
                                sess.dist_size)
                    merged = distributed.merge_final_counts(
                        sess.finalsummary_tracker)
                    sess.finalsummary_tracker.counts = _dd(int, merged)
                    if sess.dist_rank != 0:
                        sess.show_message('==> Finished (host {}).'.format(
                            sess.dist_rank))
                        return None
                sess.show_message('==> Finished.')
                return sess.finalsummary_tracker.print_results
            elif sess.scan_finished:
                sess.show_message('==> Terminated.')

    async def wait_for_stop(self):
        while self.running:
            try:
                await asyncio.sleep(0.5)
            except CancelledError:
                break
