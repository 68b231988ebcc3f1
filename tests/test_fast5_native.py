"""Native C++ HDF5 reader (src/fast5_ingest.cc via fast5_native.py) vs
the h5py reader: metadata, raw DAC signal, and albacore event columns
must agree exactly on simulated fixtures."""

import os

import numpy as np
import pytest

from poreplex_tpu import fast5, fast5_native, simulate

COLS = ('mean', 'start', 'move', 'p_model_state')


@pytest.fixture(scope='module')
def lib():
    lib = fast5_native.get_library()
    if lib is None:
        pytest.skip('native fast5 library unavailable (no libhdf5)')
    return lib


@pytest.fixture(scope='module')
def fixtures(tmp_path_factory):
    d = str(tmp_path_factory.mktemp('nativef5'))
    entries = simulate.make_fixture_dir(d, n_reads=6, seed=31,
                                        multi_read=True)
    entries += simulate.make_fixture_dir(d + '/single', n_reads=2, seed=32)
    return d, entries


def test_native_reader_matches_h5py(lib, fixtures, tmp_path):
    d, _ = fixtures
    checked = 0
    for root, _dirs, files in os.walk(d):
        for fn in sorted(files):
            if not fn.endswith('.fast5'):
                continue
            path = os.path.join(root, fn)
            nf = fast5_native.NativeFast5.open(path)
            assert nf is not None
            for _f, rid in fast5.get_read_ids(path):
                f5 = fast5.Fast5Reader(path, rid)
                nodes = nf.nodes_for(rid)
                assert nodes is not None
                meta = nf.read_meta(*nodes[:3])
                assert meta['read_id'] == rid == f5.read_id
                assert meta['duration'] == f5.duration
                assert meta['channel_number'] == f5.channel_number
                assert meta['run_id'] == f5.run_id
                assert meta['sample_id'] == f5.sample_id
                for k, v in (('digitisation', f5.digitisation),
                             ('offset', f5.offset), ('range', f5.range),
                             ('sampling_rate', f5.sampling_rate)):
                    assert abs(meta[k] - v) < 1e-12

                sig = nf.read_signal(nodes[3], meta['duration'])
                assert np.array_equal(sig, f5.get_raw_dac())

                bc_n = nf.read_basecall(nodes[4])
                bc_h = f5.get_basecall(columns=COLS)
                assert isinstance(bc_n, dict)
                assert bc_n['sequence'] == bc_h['sequence']
                assert bc_n['qstring'] == bc_h['qstring']
                assert bc_n['sequence_length'] == bc_h['sequence_length']
                assert bc_n['num_events'] == bc_h['num_events']
                assert abs(bc_n['mean_qscore'] - bc_h['mean_qscore']) < 1e-9
                for col in COLS:
                    assert np.array_equal(
                        np.asarray(bc_n['events'][col], np.float64),
                        np.asarray(bc_h['events'][col], np.float64)), col
                f5.close()
                checked += 1
            nf.close()
    assert checked >= 8


def test_native_reader_guppy_falls_back(lib, tmp_path):
    """Guppy Move-encoded basecalls are not natively readable; the reader
    must request the h5py fallback rather than mis-parse."""
    d = str(tmp_path / 'guppy')
    entries = simulate.make_fixture_dir(d, n_reads=2, seed=33,
                                        basecall='guppy')
    fn = sorted(f for f in os.listdir(d) if f.endswith('.fast5'))[0]
    path = os.path.join(d, fn)
    nf = fast5_native.NativeFast5.open(path)
    for _f, rid in fast5.get_read_ids(path):
        nodes = nf.nodes_for(rid)
        assert nf.read_basecall(nodes[4]) == 'fallback'
        break
    nf.close()
