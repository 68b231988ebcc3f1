"""FAST5 (HDF5) access layer.

Covers both container layouts and both basecaller event encodings handled by
the reference reader (poreplex/fast5_file.py):

* single-read files (``UniqueGlobalKey`` + ``Raw/Reads/...``) and multi-read
  files (``read_<id>`` groups)   [fast5_file.py:37-84]
* raw DAC -> picoampere conversion  [fast5_file.py:122-131]
* albacore >= 2.3 ``Events`` tables (14 columns)  [fast5_file.py:176-179]
* guppy ``Move`` tables, including flip-flop 1-mer -> 5-mer reframing and
  event reconstruction from block strides with a median prefilter
  [fast5_file.py:183-230]
* read subtree copy for FAST5 output  [fast5_file.py:232-264]
"""

import os.path

import h5py
from h5py import h5a, h5o
import numpy as np
from scipy.signal import medfilt


def _read_attrs(handle, path, names):
    """Read named attributes of one object through the low-level h5py API:
    the high-level ``group[...].attrs[...]`` path costs ~120 us per access
    in proxy-object construction, which dominates FAST5 ingest at
    ~15 attribute reads per read."""
    oid = h5o.open(handle.id, path.encode())
    out = []
    for name in names:
        aid = h5a.open(oid, name.encode())
        arr = np.empty(aid.shape, dtype=aid.dtype)
        aid.read(arr)
        out.append(arr[()] if arr.shape == () else arr)
    return out

__all__ = ['get_read_ids', 'Fast5Reader', 'Fast5FilePool', 'EventTable',
           'DuplicatedReadError']


class EventTable:
    """Column-store basecalled-event table: a dict of aligned numpy arrays
    with the tiny pandas-like surface the pipeline consumes. Replaces the
    per-read ``pd.DataFrame`` the reference passed around
    (poreplex/fast5_file.py:176, signal_analyzer.py:311-326) — DataFrame
    construction and column insertion cost ~3 ms of BlockManager overhead
    per read on the batch hot path."""

    __slots__ = ('_cols',)

    def __init__(self, cols=None):
        self._cols = {}
        for name, vals in (cols or {}).items():
            self._cols[name] = np.asarray(vals)

    @classmethod
    def from_structured(cls, arr):
        return cls({name: arr[name] for name in arr.dtype.names})

    def __getitem__(self, name):
        return self._cols[name]

    def __setitem__(self, name, vals):
        self._cols[name] = np.asarray(vals)

    def __contains__(self, name):
        return name in self._cols

    def __len__(self):
        for vals in self._cols.values():
            return len(vals)
        return 0

    @property
    def columns(self):
        return list(self._cols)

    def copy(self):
        return EventTable(self._cols)


class Fast5FilePool:
    """Refcounted h5py.File handles: every read of a multi-read FAST5 in a
    batch shares ONE open file instead of paying a fresh open per read
    (the reference opened the file once per read,
    poreplex/signal_loader.py:77-87 -> fast5_file.py:61). Not thread-safe;
    scope one pool per ingest batch."""

    def __init__(self):
        self._files = {}    # path -> [h5py.File, refcount]

    def open(self, path):
        entry = self._files.get(path)
        if entry is None:
            entry = self._files[path] = [h5py.File(path, 'r'), 0]
        entry[1] += 1
        return entry[0]

    def release(self, path):
        entry = self._files.get(path)
        if entry is None:
            return
        entry[1] -= 1
        if entry[1] <= 0:
            entry[0].close()
            del self._files[path]


class DuplicatedReadError(Exception):
    pass


def get_read_ids(filename, basedir=None):
    """List (filename, read_id) pairs contained in a FAST5 file
    (poreplex/fast5_file.py:37-58)."""
    fast5path = os.path.join(basedir, filename) if basedir else filename

    with h5py.File(fast5path, 'r') as f5:
        if 'UniqueGlobalKey' in f5:
            try:
                first_read = next(iter(f5['Raw/Reads'].values()))
                return [(filename, _decode(first_read.attrs['read_id']))]
            except KeyError:
                return []

        return [(filename, node[5:]) for node in f5
                if node.startswith('read_')]


def _decode(value):
    return value.decode() if isinstance(value, bytes) else str(value)


class Fast5Reader:

    RAWSIGNAL_PREFILTER_SIZE = 5  # guppy event reconstruction only

    def __init__(self, path, read_id=None, pool=None):
        self.path = path
        self.read_id = read_id
        self.pool = pool
        self.handle = pool.open(path) if pool is not None else \
            h5py.File(path, 'r')

        self.is_multiread = 'UniqueGlobalKey' not in self.handle
        if self.is_multiread:
            base = 'read_{}'.format(read_id)
            self.read_node = base + '/Raw'
            self.channel_node = base + '/channel_id'
            self.tracking_node = base + '/tracking_id'
            self.analyses_node = base + '/Analyses'
        else:
            first_read = next(iter(self.handle['Raw/Reads'].keys()))
            self.read_node = 'Raw/Reads/' + first_read
            self.channel_node = 'UniqueGlobalKey/channel_id'
            self.tracking_node = 'UniqueGlobalKey/tracking_id'
            self.analyses_node = 'Analyses'

        self._load_metadata()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        if self.handle is not None:
            if self.pool is not None:
                self.pool.release(self.path)
            else:
                self.handle.close()
            self.handle = None

    def _load_metadata(self):
        duration, start_time, read_id = _read_attrs(
            self.handle, self.read_node,
            ('duration', 'start_time', 'read_id'))
        self.duration = int(duration)
        self.start_time = int(start_time)
        file_read_id = _decode(read_id)
        if self.read_id is None:
            self.read_id = file_read_id
        elif file_read_id != self.read_id:
            raise ValueError('Unexpected read {} found in {}'.format(
                file_read_id, self.path))

        channel, digitisation, offset, rng, rate = _read_attrs(
            self.handle, self.channel_node,
            ('channel_number', 'digitisation', 'offset', 'range',
             'sampling_rate'))
        self.channel_number = _decode(channel)
        self.digitisation = float(digitisation)
        self.offset = float(offset)
        self.range = float(rng)
        self.sampling_rate = float(rate)

        run_id, sample_id = _read_attrs(self.handle, self.tracking_node,
                                        ('run_id', 'sample_id'))
        self.run_id = _decode(run_id)
        self.sample_id = _decode(sample_id)

    @property
    def pa_scale(self):
        """pA per DAC step; pA = pa_scale * (dac + offset)
        (poreplex/fast5_file.py:122-131)."""
        return self.range / self.digitisation

    def get_raw_dac(self, start=None, end=None):
        """Raw signal slice in instrument DAC units, dtype as stored
        (i16 in every ONT layout). The pA conversion is the per-read
        affine ``pa_scale * (dac + offset)`` — keeping the integers lets
        the pipeline fold that affine into the wire dequantization and
        ship DAC losslessly instead of converting every sample on the
        host."""
        signode = self.handle[self.read_node + '/Signal']
        if end is None or end > len(signode):
            end = len(signode)
        start = start or 0
        return signode[start:end]

    def get_raw_data(self, start=None, end=None):
        """Raw signal slice converted to picoamperes
        (poreplex/fast5_file.py:122-131)."""
        raw = self.get_raw_dac(start, end)
        return np.asarray(self.range / self.digitisation * (raw + self.offset),
                          dtype=np.float32)

    def get_basecall(self, analysis_group='Basecall_1D', columns=None):
        """Extract the newest basecall analysis with its event table
        (poreplex/fast5_file.py:133-164). Returns None when absent.

        ``columns`` restricts the albacore 14-column Events read to the
        named compound members (HDF5 member selection — a fraction of the
        bytes and conversion work when the pipeline only consumes
        mean/start/move/p_model_state); guppy Move tables are unaffected
        (their columns are all derived)."""
        try:
            analnode = self.handle[self.analyses_node]
        except KeyError:
            return None

        groups = [name for name in analnode.keys()
                  if name.startswith(analysis_group)]
        if not groups:
            return None

        analyses = analnode[max(groups)]
        groupno = analyses.name.rsplit('_', 1)[-1]
        summary = {}

        fastqenc = _decode(analyses['BaseCalled_template/Fastq'][()]).split('\n')
        summary['sequence'] = fastqenc[1]
        summary['qstring'] = fastqenc[3]

        num_events, first_sample = _read_attrs(
            analnode, 'Segmentation_{}/Summary/segmentation'.format(groupno),
            ('num_events_template', 'first_sample_template'))
        summary_path = 'Summary/{}_template'.format(analysis_group.lower())
        sequence_length, mean_qscore = _read_attrs(
            analyses, summary_path, ('sequence_length', 'mean_qscore'))
        summary_oid = h5o.open(analyses.id, summary_path.encode())
        if h5a.exists(summary_oid, b'block_stride'):
            stride, = _read_attrs(analyses, summary_path, ('block_stride',))
        else:
            stride = 15
        summary['block_stride'] = int(stride)
        summary['sequence_length'] = int(sequence_length)
        summary['mean_qscore'] = float(mean_qscore)
        summary['num_events'] = int(num_events)
        summary['first_sample_template'] = int(first_sample)

        summary['events'] = self._load_events(analyses, summary, columns)
        return summary

    def _load_events(self, analyses, summary, columns=None):
        """Dispatch between albacore Events and guppy Move encodings
        (poreplex/fast5_file.py:166-181)."""
        if 'BaseCalled_template/Events' in analyses:
            dset = analyses['BaseCalled_template/Events']
            names = dset.dtype.names or ()
            if len(names) <= 3 and 'move' in names:  # guppy-style Events
                return self._reconstruct_guppy_events(
                    EventTable.from_structured(dset[()]), summary)
            if len(names) == 14:  # albacore >= 2.3.0
                if columns:
                    use = tuple(c for c in columns if c in names)
                    return EventTable.from_structured(dset.fields(use)[()])
                return EventTable.from_structured(dset[()])
            raise Exception('Unsupported event table found.')
        elif 'BaseCalled_template/Move' in analyses:
            evdf = self._events_from_moves(analyses, summary)
            return self._reconstruct_guppy_events(evdf, summary)
        raise Exception(
            "Neither `Events' or `Move' table found in the basecall.")

    def _events_from_moves(self, analyses, summary):
        """Rebuild a minimal event table from a guppy Move table, with the
        flip-flop 1-mer -> 5-mer reframing (role of
        poreplex/fast5_file.py:183-208) done as one vectorized window
        gather over the 3'->5' sequence instead of per-row string slicing.

        The move sum tells the model's kmer size apart: classic RNN models
        emit (seqlen - 4) 5-mers (center base at +2), flip-flop models emit
        one base per move, so the window is completed by padding both ends
        with ``__``."""
        moves = analyses['BaseCalled_template/Move'][()]
        pos = (moves.cumsum() - 1).astype(np.int64)
        kmer_size = len(summary['sequence']) - int(moves.sum()) + 1
        revseq = summary['sequence'][::-1].replace('U', 'T')

        if kmer_size == 5:
            center_offset = 2
        elif kmer_size == 1:
            revseq = '__' + revseq + '__'
            center_offset = 0
        else:
            raise Exception('Move table is encoded with an unknown kmer-size.')

        seqbuf = np.frombuffer(revseq.encode(), dtype='S1')
        window = pos[:, None] + np.arange(5)
        kmers = (seqbuf[np.minimum(window, len(seqbuf) - 1)]
                 .view('S5').ravel().astype('U5'))

        base_qual = 1.0 - np.power(
            10.0, -(np.frombuffer(summary['qstring'].encode(), 'B') - 33) / 10)

        return EventTable({
            'model_state': kmers,
            'p_model_state': base_qual[pos + center_offset],
            'move': moves,
        })

    def _reconstruct_guppy_events(self, events, summary):
        """Derive per-event start/mean/stdv/length from fixed-stride raw
        signal blocks (role of poreplex/fast5_file.py:210-230): one block
        of ``block_stride`` samples per move-table row, statistics taken
        after the median prefilter; a truncated final block is completed
        with NaN so its statistics flag the truncation."""
        stride = summary['block_stride']
        first = summary['first_sample_template']
        nblocks = len(events)

        filtered = medfilt(self.get_raw_data(first, first + stride * nblocks),
                           self.RAWSIGNAL_PREFILTER_SIZE)
        if -(-len(filtered) // stride) != nblocks:
            raise Exception(
                'Numbers of events and raw data strides does not match.')
        blocks = np.full(nblocks * stride, np.nan)
        blocks[:len(filtered)] = filtered
        blocks = blocks.reshape(nblocks, stride)

        events['start'] = first + stride * np.arange(nblocks)
        events['mean'] = blocks.mean(axis=1)
        events['stdv'] = blocks.std(axis=1)
        events['length'] = stride
        return events

    def copyto(self, dstfile):
        """Copy this read's subtree into a (multi-read) output FAST5
        (poreplex/fast5_file.py:232-264)."""
        nodepath = 'read_' + self.read_id

        if self.is_multiread:
            try:
                dstfile.copy(self.handle[nodepath], dstfile, nodepath)
                return
            except (RuntimeError, ValueError) as exc:
                if 'already exists' in str(exc):
                    raise DuplicatedReadError(str(exc))
                raise

        if nodepath in dstfile:
            raise DuplicatedReadError(
                "Duplicated read '{}' found.".format(self.read_id))

        dstgrp = dstfile.create_group(nodepath)
        dstgrp.attrs['run_id'] = self.run_id
        dstgrp.copy(self.handle[self.read_node], 'Raw')
        for grpname, grpobj in self.handle['UniqueGlobalKey'].items():
            dstgrp.copy(grpobj, dstgrp, grpname)
        for grpname, grpobj in self.handle.items():
            if grpname not in ('Raw', 'UniqueGlobalKey'):
                dstgrp.copy(grpobj, grpname)
