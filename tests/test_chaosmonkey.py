"""Fault-injection build of the native library: with CHAOSMONKEY=p a
fraction of allocations fail, and the C ABI must return its error
sentinels instead of crashing the process (counterpart of the reference's
dormant scrappie_stdlib.h:10-27 macros)."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module')
def chaos_lib(tmp_path_factory):
    out = str(tmp_path_factory.mktemp('chaos') / 'libchaos.so')
    subprocess.run(
        ['g++', '-O2', '-std=c++17', '-fPIC', '-DCHAOSMONKEY=0.05',
         '-shared', '-o', out, os.path.join(REPO, 'src', 'sigproc.cc')],
        check=True)
    lib = ctypes.CDLL(out)
    lib.pptpu_detect_events.restype = ctypes.c_int64
    return lib


def test_alloc_failures_surface_as_error_sentinels(chaos_lib):
    rng = np.random.RandomState(0)
    sig = rng.normal(100, 3, 4096).astype(np.float32)
    max_events = 2048
    starts = np.zeros(max_events, np.int64)
    lengths = np.zeros(max_events, np.float32)
    means = np.zeros(max_events, np.float32)
    stdvs = np.zeros(max_events, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    outcomes = set()
    for _ in range(200):
        n = chaos_lib.pptpu_detect_events(
            sig.ctypes.data_as(f32p), ctypes.c_int64(len(sig)),
            ctypes.c_int64(7), ctypes.c_int64(20),
            ctypes.c_double(3.0), ctypes.c_double(8.0),
            ctypes.c_double(4.0), ctypes.c_int64(max_events),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lengths.ctypes.data_as(f32p), means.ctypes.data_as(f32p),
            stdvs.ctypes.data_as(f32p))
        assert n >= -1
        outcomes.add(n == -1)
    # with 5% alloc failure both paths must occur: clean completions AND
    # gracefully-reported failures
    assert outcomes == {True, False}
