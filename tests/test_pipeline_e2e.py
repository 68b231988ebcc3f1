"""End-to-end pipeline tests on synthetic FAST5 fixtures: full session run
with all writers, status lattice behavior, and output-file formats."""

import gzip
import logging
import os

import h5py
import numpy as np
import pytest

# full-session / workflow tests take minutes; `-m "not slow"` skips them
pytestmark = pytest.mark.slow

from poreplex_tpu import simulate
from poreplex_tpu.config import build_config
from poreplex_tpu.pipeline.analyzer import process_batch
from poreplex_tpu.pipeline.session import ProcessingSession


@pytest.fixture(scope='module')
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('f5in')
    entries = simulate.make_fixture_dir(str(d), n_reads=6, seed=20,
                                        polya_len=2400)
    sub = d / 'nested'
    entries += [(os.path.join('nested', fn), rid) for fn, rid in
                simulate.make_fixture_dir(str(sub), n_reads=3, seed=21,
                                          multi_read=True, basecall='guppy')]
    return str(d), entries


def run_session(inputdir, outputdir, **options):
    os.makedirs(outputdir, exist_ok=True)
    config = build_config(inputdir, outputdir, device_batch_size=16,
                          **options)
    logger = logging.getLogger('test-e2e')
    printer = ProcessingSession.run(config, logger)
    return config, printer


def test_full_session(fixture_dir, tmp_path):
    inputdir, entries = fixture_dir
    outputdir = str(tmp_path / 'out')
    config, printer = run_session(
        inputdir, outputdir, barcoding=True, measure_polya=True,
        filter_unsplit_reads=True, trim_adapter=True,
        dump_adapter_signals=True, dump_basecalls=True,
        nanopolish_output=True, fast5_output=True)
    assert printer is not None

    # sequencing summary: one line per read + header with expected columns
    with open(os.path.join(outputdir, 'sequencing_summary.txt')) as f:
        lines = f.read().splitlines()
    header = lines[0].split('\t')
    assert header == ['filename', 'read_id', 'run_id', 'channel',
                      'start_time', 'duration', 'num_events',
                      'sequence_length', 'mean_qscore', 'sample_id',
                      'status', 'label', 'barcode', 'barcode_score',
                      'polya_dwell']
    assert len(lines) == 1 + len(entries)
    rows = [dict(zip(header, l.split('\t'))) for l in lines[1:]]
    assert all(r['status'] == 'okay' for r in rows)
    assert all(r['label'] == 'pass' for r in rows)
    # poly(A) dwell close to the simulated 2400-sample tail
    dwells = [float(r['polya_dwell']) for r in rows if r['polya_dwell']]
    assert len(dwells) >= len(entries) - 3
    assert all(abs(d - 2400 / simulate.SAMPLING_RATE) < 0.15 for d in dwells)

    # FASTQ: all passed reads present and gzip-readable
    total_records = 0
    fastq_dir = os.path.join(outputdir, 'fastq', 'pass')
    for name in os.listdir(fastq_dir):
        with gzip.open(os.path.join(fastq_dir, name)) as f:
            content = f.read().decode()
        recs = [l for l in content.splitlines() if l.startswith('@')]
        total_records += len(recs)
    assert total_records == len(entries)

    # FAST5 output: reads re-packed into multi-read files
    repacked = []
    f5dir = os.path.join(outputdir, 'fast5')
    for root, dirs, files in os.walk(f5dir):
        for fn in files:
            with h5py.File(os.path.join(root, fn), 'r') as f5:
                repacked += [k for k in f5.keys() if k.startswith('read_')]
    assert len(repacked) == len(entries)

    # nanopolish readdb
    np_dir = os.path.join(outputdir, 'nanopolish')
    fasta_sizes = sum(
        os.path.getsize(os.path.join(root, fn))
        for root, dirs, files in os.walk(np_dir)
        for fn in files if fn.endswith('.fasta'))
    assert fasta_sizes > 0

    # dump inventories with resolvable external links
    with h5py.File(os.path.join(outputdir, 'adapter-dumps',
                                'inventory.h5')) as f:
        catalog = f['catalog/adapter'][:]
        assert len(catalog) == len(entries)
        rid = catalog[0]['read_id'].decode()
        assert f['adapter/' + rid[:3] + '/' + rid].shape[0] > 0
    with h5py.File(os.path.join(outputdir, 'events', 'inventory.h5')) as f:
        groups = list(f['basecalled_events'].keys())
        assert groups
        rid = list(f['basecalled_events'][groups[0]].keys())[0]
        table = f['basecalled_events'][groups[0]][rid]
        assert set(table.dtype.names) == {
            'mean', 'start', 'stdv', 'length', 'model_state', 'move',
            'pos', 'end', 'scaled_mean'}


def test_unsplit_read_flagged(tmp_path):
    """A read with an internal leader+adapter and a second transcript must
    be labeled as an artifact by the chimera filter."""
    rng = np.random.RandomState(33)
    inp = str(tmp_path / 'in')
    os.makedirs(inp)
    normal = simulate.simulate_read(rng, transcript_len=30000)
    fused = simulate.simulate_read(rng, transcript_len=30000,
                                   extra_adapter_at=0.4, seq_per_event=0.8)
    simulate.write_single_read_fast5(os.path.join(inp, 'normal.fast5'),
                                     normal)
    simulate.write_single_read_fast5(os.path.join(inp, 'fused.fast5'), fused)

    config = build_config(inp, str(tmp_path / 'out'),
                          filter_unsplit_reads=True, device_batch_size=4)
    results, aux = process_batch(0, [('normal.fast5', normal.read_id),
                                     ('fused.fast5', fused.read_id)], config)
    by_file = {r['filename']: r for r in results}
    assert by_file['normal.fast5']['label'] == 'pass'
    assert by_file['fused.fast5']['status'] == 'unsplit_read'
    assert by_file['fused.fast5']['label'] == 'artifact'


def test_not_basecalled_and_short_reads(tmp_path):
    rng = np.random.RandomState(44)
    inp = str(tmp_path / 'in')
    os.makedirs(inp)
    nobc = simulate.simulate_read(rng)
    tiny = simulate.simulate_read(rng, preleader_len=200, leader_len=200,
                                  adapter_len=2000, polya_len=500,
                                  transcript_len=2000)
    tiny.raw_dac = tiny.raw_dac[:5000]   # < 9000 samples -> scaler too short
    simulate.write_single_read_fast5(os.path.join(inp, 'nobc.fast5'), nobc,
                                     basecall=None)
    simulate.write_single_read_fast5(os.path.join(inp, 'tiny.fast5'), tiny)

    config = build_config(inp, str(tmp_path / 'out'), device_batch_size=4)
    results, aux = process_batch(
        0, [('nobc.fast5', nobc.read_id), ('tiny.fast5', tiny.read_id),
            ('gone.fast5', 'does-not-exist')], config)
    by_file = {r['filename']: r for r in results}
    assert by_file['nobc.fast5']['status'] == 'not_basecalled'
    assert by_file['nobc.fast5']['label'] == 'fail'
    assert by_file['tiny.fast5']['status'] == 'scaler_signal_too_short'
    assert 'label' not in by_file['tiny.fast5']
    assert by_file['gone.fast5']['status'] == 'disappeared'


def test_live_mode_polling_discovery(tmp_path):
    """The live watcher's mtime-polling fallback (no inotify installed
    here) must pick up FAST5 files created AFTER the watch starts, and
    must not re-queue reads already recorded as done
    (role of poreplex/pipeline.py:339-368)."""
    import asyncio
    import time

    inputdir = str(tmp_path / 'livein')
    outputdir = str(tmp_path / 'liveout')
    os.makedirs(inputdir)
    os.makedirs(outputdir)
    config = build_config(inputdir, outputdir, live=True,
                          batch_chunk_size=1000)   # accumulate, don't flush
    logger = logging.getLogger('test-live')

    with ProcessingSession(config, logger) as sess:
        async def scenario():
            watch = sess.loop.create_task(
                sess.live_watch_inputs(inputdir))
            await asyncio.sleep(0.2)     # watcher is polling an empty dir
            entries = simulate.make_fixture_dir(inputdir, n_reads=2, seed=5)
            sess.reads_done.add(entries[0])   # dedup: must not re-queue
            deadline = time.time() + 20
            while time.time() < deadline and not sess.jobstack:
                await asyncio.sleep(0.2)
            watch.cancel()
            try:
                await watch
            except asyncio.CancelledError:
                pass
            return entries
        entries = sess.loop.run_until_complete(scenario())
        assert entries[1] in sess.jobstack
        assert entries[0] not in sess.jobstack
        assert sess.reads_found == 1


def test_live_mode_inotify_discovery(tmp_path, monkeypatch):
    """The inotify branch of the live watcher (the one production live
    mode uses when the inotify package exists) driven by an injected fake
    inotify module: directory events and out-of-tree paths are skipped,
    fast5 close-write events queue exactly the reads not already done
    (role of poreplex/pipeline.py:339-368)."""
    import asyncio
    import sys
    import time
    import types

    inputdir = str(tmp_path / 'livein')
    outputdir = str(tmp_path / 'liveout')
    os.makedirs(inputdir)
    os.makedirs(outputdir)
    entries = simulate.make_fixture_dir(inputdir, n_reads=2, seed=6)
    topdir = os.path.abspath(inputdir) + '/'

    IN_CLOSE_WRITE, IN_MOVED_TO = 0x8, 0x80
    hdr = types.SimpleNamespace

    class FakeInotifyTree:
        created = []

        def __init__(self, path, mask=0):
            self.path = path
            self.mask = mask
            FakeInotifyTree.created.append(self)

        def event_gen(self):
            yield None                                       # heartbeat
            yield (hdr(mask=IN_CLOSE_WRITE), ['IN_ISDIR'],
                   topdir, 'subdir')                         # dir: skipped
            yield (hdr(mask=IN_CLOSE_WRITE), [], '/elsewhere',
                   'evil.fast5')                             # outside tree
            yield (hdr(mask=IN_CLOSE_WRITE), [], topdir,
                   'notes.txt')                              # not a fast5
            yield (hdr(mask=IN_CLOSE_WRITE), [], topdir, entries[0][0])
            yield (hdr(mask=IN_MOVED_TO), [], topdir, entries[1][0])
            while True:                                      # idle heartbeat
                time.sleep(0.05)
                yield None

    fake_pkg = types.ModuleType('inotify')
    fake_adapters = types.ModuleType('inotify.adapters')
    fake_adapters.InotifyTree = FakeInotifyTree
    fake_constants = types.ModuleType('inotify.constants')
    fake_constants.IN_CLOSE_WRITE = IN_CLOSE_WRITE
    fake_constants.IN_MOVED_TO = IN_MOVED_TO
    fake_pkg.adapters = fake_adapters
    fake_pkg.constants = fake_constants
    monkeypatch.setitem(sys.modules, 'inotify', fake_pkg)
    monkeypatch.setitem(sys.modules, 'inotify.adapters', fake_adapters)
    monkeypatch.setitem(sys.modules, 'inotify.constants', fake_constants)

    config = build_config(inputdir, outputdir, live=True,
                          batch_chunk_size=1000)   # accumulate, don't flush
    logger = logging.getLogger('test-live-inotify')

    with ProcessingSession(config, logger) as sess:
        sess.reads_done.add(entries[0])     # dedup: must not re-queue

        async def scenario():
            watch = sess.loop.create_task(sess.live_watch_inputs(inputdir))
            deadline = time.time() + 20
            while time.time() < deadline and not sess.jobstack:
                await asyncio.sleep(0.1)
            watch.cancel()
            try:
                await watch
            except asyncio.CancelledError:
                pass
        sess.loop.run_until_complete(scenario())
        assert entries[1] in sess.jobstack
        assert entries[0] not in sess.jobstack
        assert sess.reads_found == 1
        # the watch was registered on the slash-suffixed absolute root
        # (the containment check depends on it)
        assert FakeInotifyTree.created[0].path == topdir
        assert FakeInotifyTree.created[0].mask == (IN_CLOSE_WRITE |
                                                  IN_MOVED_TO)


def test_live_snapshot_tree(tmp_path):
    (tmp_path / 'a.fast5').write_bytes(b'x')
    (tmp_path / '.hidden.fast5').write_bytes(b'x')
    (tmp_path / 'notes.txt').write_bytes(b'x')
    sub = tmp_path / 'sub'
    sub.mkdir()
    (sub / 'b.FAST5').write_bytes(b'x')
    hidden_dir = tmp_path / '.cache'
    hidden_dir.mkdir()
    (hidden_dir / 'c.fast5').write_bytes(b'x')
    snap = ProcessingSession._snapshot_tree(str(tmp_path), '.fast5')
    assert set(snap) == {'a.fast5', os.path.join('sub', 'b.FAST5')}
    assert all(isinstance(v, float) for v in snap.values())


def test_bgzf_writer_roundtrip(tmp_path):
    from poreplex_tpu.io.bgzf import BGZFWriter, BGZF_EOF
    path = str(tmp_path / 'x.gz')
    payload = b'hello bgzf\n' * 100000   # spans multiple blocks
    with BGZFWriter(path) as w:
        w.write(payload)
    raw = open(path, 'rb').read()
    assert raw.endswith(BGZF_EOF)
    assert gzip.open(path).read() == payload
    # every block must carry the BC extra subfield
    assert raw[:4] == bytes.fromhex('1f8b0804')


def test_process_ingest_matches_thread_ingest(fixture_dir, tmp_path):
    """PHASE A via spawn-context worker processes (pipeline/ingest.py)
    must produce byte-identical summaries to the in-process thread path —
    same statuses, barcodes, poly(A) dwells, and read set."""
    inputdir, entries = fixture_dir

    def summary_rows(outdir):
        with open(os.path.join(outdir, 'sequencing_summary.txt')) as f:
            lines = f.read().splitlines()
        return sorted(lines[1:])

    out_t = str(tmp_path / 'out-threads')
    run_session(inputdir, out_t, barcoding=True, measure_polya=True,
                filter_unsplit_reads=True, trim_adapter=True,
                ingest_processes=0)
    out_p = str(tmp_path / 'out-procs')
    run_session(inputdir, out_p, barcoding=True, measure_polya=True,
                filter_unsplit_reads=True, trim_adapter=True,
                ingest_processes=2)

    rows_t = summary_rows(out_t)
    rows_p = summary_rows(out_p)
    assert len(rows_t) == len(entries)
    assert rows_t == rows_p


def test_broken_ingest_pool_falls_back_in_process(fixture_dir, tmp_path):
    """A dead ingest worker pool must not take down the session: the
    analyzer disables it and ingests in-process with identical results."""
    from poreplex_tpu.config import build_config
    from poreplex_tpu.pipeline.analyzer import BatchAnalyzer

    inputdir, entries = fixture_dir
    config = build_config(inputdir, str(tmp_path / 'out'), barcoding=True,
                          trim_adapter=True, device_batch_size=16,
                          ingest_processes=2)
    analyzer = BatchAnalyzer(config)
    assert analyzer.ingest_pool is not None
    # simulate a broken pool: every load raises
    class Dead:
        def load(self, reads):
            raise RuntimeError('worker pool died')
        def shutdown(self):
            pass
    analyzer.ingest_pool = Dead()

    results, aux = analyzer.process_batch(0, entries[:6])
    assert analyzer.ingest_pool is None          # disabled after failure
    assert len(results) == 6
    assert all(r['status'] == 'okay' for r in results)
