"""ctypes bindings for the native C++ signal-processing library
(src/sigproc.cc). Plays the role of the reference's CPython extension
``poreplex.csupport`` (src/csupport.c:70-124) — host-side event detection
and ingest transforms — built as a plain shared library consumed via
ctypes so no build-time Python headers are required.

The library is built by the top-level Makefile; if it is missing, a build
is attempted on first import, falling back to the NumPy reference
implementations when no compiler is available.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIBNAME = 'libpptpu_sigproc.so'
_LIBDIR = os.path.join(os.path.dirname(__file__), 'native_lib')
_LIBPATH = os.path.join(_LIBDIR, _LIBNAME)

_lib = None


def _build_library():
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'src', 'sigproc.cc')
    if not os.path.exists(src):
        return False
    os.makedirs(_LIBDIR, exist_ok=True)
    try:
        subprocess.check_call(
            ['g++', '-O3', '-fPIC', '-std=c++17', '-shared', '-o', _LIBPATH,
             src])
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIBPATH) and not _build_library():
        return None

    lib = ctypes.CDLL(_LIBPATH)
    lib.pptpu_detect_events.restype = ctypes.c_int64
    lib.pptpu_detect_events.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.pptpu_pool_mean.restype = ctypes.c_int64
    lib.pptpu_pool_mean.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    lib.pptpu_to_pa.restype = None
    lib.pptpu_to_pa.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_float)]
    lib.pptpu_viterbi.restype = ctypes.c_double
    lib.pptpu_viterbi.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def detect_events(signal, window_length1=7, window_length2=20, threshold1=3,
                  threshold2=8, peak_height=4):
    """Native event detection; same output layout as
    refimpl.event_detection.detect_events. Falls back to the NumPy oracle
    when the library is unavailable."""
    lib = get_library()
    signal = np.ascontiguousarray(signal, np.float32)
    if lib is None:
        from .refimpl.event_detection import detect_events as np_detect
        return np_detect(signal, window_length1, window_length2, threshold1,
                         threshold2, peak_height)

    max_events = len(signal) + 1
    starts = np.empty(max_events, np.int64)
    lengths = np.empty(max_events, np.float32)
    means = np.empty(max_events, np.float32)
    stdvs = np.empty(max_events, np.float32)
    n = lib.pptpu_detect_events(
        _fptr(signal), len(signal), window_length1, window_length2,
        float(threshold1), float(threshold2), float(peak_height), max_events,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _fptr(lengths), _fptr(means), _fptr(stdvs))
    out = np.empty(n, dtype=[('start', np.int64), ('length', np.float32),
                             ('mean', np.float32), ('stdv', np.float32)])
    out['start'] = starts[:n]
    out['length'] = lengths[:n]
    out['mean'] = means[:n]
    out['stdv'] = stdvs[:n]
    return out


def viterbi(obs, log_start, log_trans, mus, sigmas, logws):
    """Native GMM-HMM Viterbi for one sequence (CPU baseline / host
    fallback of ops.viterbi). Returns (path int32 [T], logp)."""
    lib = get_library()
    obs = np.ascontiguousarray(obs, np.float32)
    if lib is None:
        from .refimpl.hmm import viterbi_path
        path, logp = viterbi_path(obs, log_start, log_trans, mus, sigmas,
                                  logws)
        return path.astype(np.int32), float(logp)
    S, K = np.asarray(mus).shape
    # keep the converted arrays alive through the call
    ls, lt = np.ascontiguousarray(log_start, np.float64), \
        np.ascontiguousarray(log_trans, np.float64)
    mu, sg = np.ascontiguousarray(mus, np.float64), \
        np.ascontiguousarray(sigmas, np.float64)
    lw = np.ascontiguousarray(np.where(np.isfinite(logws), logws, -1e300),
                              np.float64)
    path = np.empty(len(obs), np.int32)
    logp = lib.pptpu_viterbi(
        _fptr(obs), len(obs), S, K,
        ls.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mu.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        sg.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lw.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return path, float(logp)


def pool_mean(signal, stride):
    """Native stride-mean pooling (poreplex/signal_loader.py:244-247)."""
    lib = get_library()
    signal = np.ascontiguousarray(signal, np.float32)
    if lib is None:
        n = len(signal) - len(signal) % stride
        return signal[:n].reshape(-1, stride).mean(axis=1, dtype=np.float32)
    out = np.empty(len(signal) // stride, np.float32)
    lib.pptpu_pool_mean(_fptr(signal), len(signal), stride, _fptr(out))
    return out


def to_pa(raw, range_, digitisation, offset):
    """Raw DAC samples -> picoamperes (poreplex/fast5_file.py:122-131)."""
    lib = get_library()
    raw = np.ascontiguousarray(raw, np.int16)
    if lib is None:
        return np.asarray(range_ / digitisation * (raw + offset), np.float32)
    out = np.empty(len(raw), np.float32)
    lib.pptpu_to_pa(raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                    len(raw), float(range_), float(digitisation),
                    float(offset), _fptr(out))
    return out
