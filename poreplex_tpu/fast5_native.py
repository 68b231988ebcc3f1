"""ctypes binding for the native FAST5 ingest library
(src/fast5_ingest.cc) — the C++-backed HDF5 reader SURVEY.md §2.2/§7.1
reserves for when h5py throughput is insufficient.

Used by the PHASE A ingest workers (pipeline/ingest.py): metadata
attributes, raw DAC signal and albacore event columns are read through
the HDF5 C API with one C call per logical operation, eliminating the
~3 ms/read of h5py proxy-object overhead profiled on the bench host.
Guppy Move tables, full-table event dumps, and any per-read error fall
back to the h5py reader transparently (``None`` returns here mean
"use the fallback").

libhdf5 itself is dlopen'd at runtime (no headers in this image): the
system libhdf5_serial is preferred — keeping its global state separate
from h5py's bundled copy — with h5py's library as fallback.
"""

import ctypes
import glob
import os
import subprocess

import numpy as np

_LIBNAME = 'libpptpu_fast5.so'
_LIBDIR = os.path.join(os.path.dirname(__file__), 'native_lib')
_LIBPATH = os.path.join(_LIBDIR, _LIBNAME)

EVENT_DTYPE = np.dtype([('mean', '<f8'), ('p_model_state', '<f8'),
                        ('start', '<u8'), ('move', '<i8'),
                        ('model_state', 'S8')])
assert EVENT_DTYPE.itemsize == 40

_STR_CAP = 256
_lib = None
_lib_tried = False

# per-process scratch reused across reads (ingest workers are
# single-threaded): a fresh 5 MB event buffer per read showed up as the
# dominant ingest cost in the e2e profile
_EVENT_BUF = None
_FASTQ_BUF = None


def _event_scratch(max_events):
    global _EVENT_BUF
    if _EVENT_BUF is None or len(_EVENT_BUF) < max_events:
        _EVENT_BUF = np.empty(max_events, EVENT_DTYPE)
    return _EVENT_BUF


def _fastq_scratch(cap):
    global _FASTQ_BUF
    if _FASTQ_BUF is None or ctypes.sizeof(_FASTQ_BUF) < cap:
        _FASTQ_BUF = ctypes.create_string_buffer(cap)
    return _FASTQ_BUF


def _hdf5_candidates():
    env = os.environ.get('PPTPU_HDF5_LIB')
    if env:
        yield env
    yield 'libhdf5_serial.so.103'
    yield 'libhdf5_serial.so'
    yield 'libhdf5.so.103'
    yield 'libhdf5.so'
    try:
        import h5py
        libsdir = os.path.join(
            os.path.dirname(os.path.dirname(h5py.__file__)), 'h5py.libs')
        for path in sorted(glob.glob(os.path.join(libsdir, 'libhdf5-*.so*'))):
            yield path
    except Exception:
        pass


def _build_library():
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'src', 'fast5_ingest.cc')
    if not os.path.exists(src):
        return False
    os.makedirs(_LIBDIR, exist_ok=True)
    tmp = '{}.build.{}'.format(_LIBPATH, os.getpid())
    try:
        # build to a private name + atomic rename: several ingest worker
        # processes may race to build on first use
        subprocess.check_call(
            ['g++', '-O3', '-fPIC', '-std=c++17', '-shared', '-o', tmp,
             src, '-ldl'])
        os.replace(tmp, _LIBPATH)
        return True
    except (OSError, subprocess.CalledProcessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_library():
    """The loaded + initialized ctypes library, or None."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get('PPTPU_NO_NATIVE_FAST5'):
        return None
    if not os.path.exists(_LIBPATH) and not _build_library():
        return None
    try:
        lib = ctypes.CDLL(_LIBPATH)
    except OSError:
        return None

    c_ll = ctypes.c_longlong
    lib.f5i_init.argtypes = [ctypes.c_char_p]
    lib.f5i_init.restype = ctypes.c_int
    lib.f5i_available.restype = ctypes.c_int
    lib.f5i_open.argtypes = [ctypes.c_char_p]
    lib.f5i_open.restype = ctypes.c_int64
    lib.f5i_close.argtypes = [ctypes.c_int64]
    lib.f5i_exists.argtypes = [ctypes.c_int64, ctypes.c_char_p]
    lib.f5i_exists.restype = ctypes.c_int
    lib.f5i_first_child.argtypes = [ctypes.c_int64, ctypes.c_char_p,
                                    ctypes.c_char_p, ctypes.c_int]
    lib.f5i_first_child.restype = ctypes.c_int
    lib.f5i_list_children.argtypes = [ctypes.c_int64, ctypes.c_char_p,
                                      ctypes.c_char_p, c_ll]
    lib.f5i_list_children.restype = c_ll
    lib.f5i_read_meta.argtypes = [
        ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(c_ll),
        ctypes.c_char_p, ctypes.c_int]
    lib.f5i_read_meta.restype = ctypes.c_int
    lib.f5i_read_signal_i16.argtypes = [ctypes.c_int64, ctypes.c_char_p,
                                        ctypes.c_void_p, c_ll]
    lib.f5i_read_signal_i16.restype = c_ll
    lib.f5i_read_string_dataset.argtypes = [ctypes.c_int64, ctypes.c_char_p,
                                            ctypes.c_char_p, c_ll]
    lib.f5i_read_string_dataset.restype = c_ll
    lib.f5i_read_events.argtypes = [ctypes.c_int64, ctypes.c_char_p,
                                    ctypes.c_void_p, c_ll,
                                    ctypes.POINTER(c_ll),
                                    ctypes.POINTER(c_ll)]
    lib.f5i_read_events.restype = c_ll
    lib.f5i_read_attr_f64.argtypes = [ctypes.c_int64, ctypes.c_char_p,
                                      ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_double)]
    lib.f5i_read_attr_f64.restype = ctypes.c_int
    lib.f5i_read_attr_i64.argtypes = [ctypes.c_int64, ctypes.c_char_p,
                                      ctypes.c_char_p, ctypes.POINTER(c_ll)]
    lib.f5i_read_attr_i64.restype = ctypes.c_int
    lib.f5i_attr_exists.argtypes = [ctypes.c_int64, ctypes.c_char_p,
                                    ctypes.c_char_p]
    lib.f5i_attr_exists.restype = ctypes.c_int

    for cand in _hdf5_candidates():
        if lib.f5i_init(cand.encode()) == 0:
            _lib = lib
            return _lib
    return None


class NativeFast5:
    """One open FAST5 file; shared across the reads of a batch like
    fast5.Fast5FilePool shares h5py handles."""

    def __init__(self, lib, fid, path):
        self.lib = lib
        self.fid = fid
        self.path = path
        self.is_multiread = lib.f5i_exists(fid, b'UniqueGlobalKey') == 0

    @classmethod
    def open(cls, path):
        lib = get_library()
        if lib is None:
            return None
        fid = lib.f5i_open(path.encode())
        if fid < 0:
            return None
        return cls(lib, fid, path)

    def close(self):
        if self.fid is not None:
            self.lib.f5i_close(self.fid)
            self.fid = None

    def list_children(self, group, cap=1 << 14):
        """Child link names of a group, or None on failure (group
        missing, unreadable, or the name buffer too small)."""
        buf = ctypes.create_string_buffer(cap)
        n = self.lib.f5i_list_children(self.fid, group.encode(), buf, cap)
        if n < 0:
            return None
        if n == 0:
            return []
        try:
            return buf.value.decode().split('\n')
        except UnicodeDecodeError:
            return None     # exotic link names: let the h5py path decide

    def nodes_for(self, read_id):
        """(raw, channel, tracking, signal, analyses) node paths, or None
        when the layout cannot be resolved."""
        if self.is_multiread:
            base = 'read_' + read_id
            if not self.lib.f5i_exists(self.fid, base.encode()):
                return None
            return (base + '/Raw', base + '/channel_id',
                    base + '/tracking_id', base + '/Raw/Signal',
                    base + '/Analyses')
        buf = ctypes.create_string_buffer(_STR_CAP)
        if self.lib.f5i_first_child(self.fid, b'Raw/Reads', buf,
                                    _STR_CAP) != 0:
            return None
        first = buf.value.decode()
        raw = 'Raw/Reads/' + first
        return (raw, 'UniqueGlobalKey/channel_id',
                'UniqueGlobalKey/tracking_id', raw + '/Signal', 'Analyses')

    def read_meta(self, raw_node, channel_node, tracking_node):
        dbl4 = (ctypes.c_double * 4)()
        i64_2 = (ctypes.c_longlong * 2)()
        strbuf = ctypes.create_string_buffer(4 * _STR_CAP)
        rc = self.lib.f5i_read_meta(
            self.fid, raw_node.encode(), channel_node.encode(),
            tracking_node.encode(), dbl4, i64_2, strbuf, _STR_CAP)
        if rc != 0:
            return None
        def _s(i):
            return strbuf[i * _STR_CAP:(i + 1) * _STR_CAP].split(b'\0')[0] \
                .decode()
        return {
            'digitisation': dbl4[0], 'offset': dbl4[1], 'range': dbl4[2],
            'sampling_rate': dbl4[3],
            'duration': int(i64_2[0]), 'start_time': int(i64_2[1]),
            'read_id': _s(0), 'channel_number': _s(1),
            'run_id': _s(2), 'sample_id': _s(3),
        }

    def read_signal(self, signal_path, expect):
        """Raw DAC as int16; ``expect`` sizes the buffer (the read's
        duration attribute — retried with the probed length when the
        dataset is longer)."""
        cap = max(int(expect), 1)
        for _ in range(2):
            buf = np.empty(cap, np.int16)
            n = self.lib.f5i_read_signal_i16(
                self.fid, signal_path.encode(),
                buf.ctypes.data_as(ctypes.c_void_p), cap)
            if n >= 0:
                return buf[:n] if n < cap else buf
            if n == -4:     # buffer too small: probe the true length
                true_n = self.lib.f5i_read_signal_i16(
                    self.fid, signal_path.encode(), None, 0)
                if true_n <= 0:
                    return None
                cap = int(true_n)
                continue
            return None
        return None

    def read_basecall(self, analyses_node, max_events=1 << 17,
                      fastq_cap=1 << 22):
        """Albacore basecall summary dict (fast5.Fast5Reader.get_basecall
        contract, minimal event columns), or None when absent, or the
        string 'fallback' when present but not nativily readable (guppy
        Move tables, oversized tables)."""
        lib = self.lib
        if lib.f5i_exists(self.fid, analyses_node.encode()) != 1:
            return None             # no Analyses group: not basecalled
        # one listing call, then the h5py reader's exact picker: max()
        # over child names starting with 'Basecall_1D'
        # (fast5.Fast5Reader.get_basecall) — replaces the previous 16
        # descending existence probes (each a full multi-level path walk,
        # ~0.4 ms/read of the ~1.4 ms native ingest)
        kids = self.list_children(analyses_node)
        if kids is None:
            return 'fallback'
        groups = [k for k in kids if k.startswith('Basecall_1D')]
        if not groups:
            return None             # matches the h5py reader's None
        groupno = max(groups).rsplit('_', 1)[-1]
        if len(groupno) != 3 or not groupno.isdigit():
            return 'fallback'       # exotic naming: h5py decides
        group = '{}/{}'.format(analyses_node, max(groups))

        events_path = group + '/BaseCalled_template/Events'
        if lib.f5i_exists(self.fid, events_path.encode()) != 1:
            return 'fallback'       # guppy Move encoding
        nmem = ctypes.c_longlong(0)
        ssize = ctypes.c_longlong(5)
        rows = _event_scratch(max_events)
        n = lib.f5i_read_events(self.fid, events_path.encode(),
                                rows.ctypes.data_as(ctypes.c_void_p),
                                max_events, ctypes.byref(nmem),
                                ctypes.byref(ssize))
        if n < 0:
            return 'fallback'   # guppy/enormous/odd tables: h5py decides
        if nmem.value != 14:
            # only albacore's 14-column layout is natively parsed; the
            # h5py reader rejects other widths as unsupported — keep the
            # two paths' accept/reject behavior identical
            return 'fallback'

        fastq = _fastq_scratch(fastq_cap)
        fq_n = lib.f5i_read_string_dataset(
            self.fid, (group + '/BaseCalled_template/Fastq').encode(),
            fastq, fastq_cap)
        if fq_n < 0:
            return 'fallback'
        fastqenc = fastq.value.decode().split('\n')
        if len(fastqenc) < 4:
            return 'fallback'

        segnode = '{}/Segmentation_{}/Summary/segmentation'.format(
            analyses_node, groupno)
        sumnode = group + '/Summary/basecall_1d_template'
        num_events = ctypes.c_longlong(0)
        first_sample = ctypes.c_longlong(0)
        seqlen = ctypes.c_longlong(0)
        qscore = ctypes.c_double(0)
        if (lib.f5i_read_attr_i64(self.fid, segnode.encode(),
                                  b'num_events_template',
                                  ctypes.byref(num_events)) != 0 or
                lib.f5i_read_attr_i64(self.fid, segnode.encode(),
                                      b'first_sample_template',
                                      ctypes.byref(first_sample)) != 0 or
                lib.f5i_read_attr_i64(self.fid, sumnode.encode(),
                                      b'sequence_length',
                                      ctypes.byref(seqlen)) != 0 or
                lib.f5i_read_attr_f64(self.fid, sumnode.encode(),
                                      b'mean_qscore',
                                      ctypes.byref(qscore)) != 0):
            return 'fallback'
        stride = ctypes.c_longlong(15)
        if lib.f5i_attr_exists(self.fid, sumnode.encode(),
                               b'block_stride') == 1:
            lib.f5i_read_attr_i64(self.fid, sumnode.encode(),
                                  b'block_stride', ctypes.byref(stride))

        from .fast5 import EventTable
        rows = rows[:n]
        # copy the columns out — ``rows`` is the reused scratch buffer
        events = EventTable({
            'mean': rows['mean'].copy(),
            'start': rows['start'].copy(),
            'move': rows['move'].copy(),
            'p_model_state': rows['p_model_state'].copy(),
            'model_state': rows['model_state'].astype(
                'S{}'.format(max(1, int(ssize.value)))),
        })
        return {
            'sequence': fastqenc[1],
            'qstring': fastqenc[3],
            'block_stride': int(stride.value),
            'sequence_length': int(seqlen.value),
            'mean_qscore': float(qscore.value),
            'num_events': int(num_events.value),
            'first_sample_template': int(first_sample.value),
            'events': events,
        }
