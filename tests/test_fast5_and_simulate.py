"""FAST5 reader + simulator round-trip tests covering both container
layouts and both basecall encodings (poreplex/fast5_file.py semantics)."""

import os

import h5py
import numpy as np
import pytest

from poreplex_tpu import fast5, simulate


@pytest.fixture()
def single_dir(tmp_path):
    entries = simulate.make_fixture_dir(str(tmp_path), n_reads=3, seed=1)
    return str(tmp_path), entries


def test_get_read_ids_single(single_dir):
    d, entries = single_dir
    for fn, rid in entries:
        assert fast5.get_read_ids(fn, d) == [(fn, rid)]


def test_get_read_ids_multi(tmp_path):
    entries = simulate.make_fixture_dir(str(tmp_path), n_reads=4, seed=2,
                                        multi_read=True)
    fn = entries[0][0]
    found = fast5.get_read_ids(fn, str(tmp_path))
    assert sorted(found) == sorted(entries)


def test_metadata_and_signal(single_dir):
    d, entries = single_dir
    fn, rid = entries[0]
    with fast5.Fast5Reader(os.path.join(d, fn), rid) as r:
        assert r.sampling_rate == simulate.SAMPLING_RATE
        assert r.duration > 0
        sig = r.get_raw_data()
        assert sig.dtype == np.float32
        assert len(sig) == r.duration
        # pA conversion formula (poreplex/fast5_file.py:122-131)
        with h5py.File(os.path.join(d, fn), 'r') as raw:
            node = next(iter(raw['Raw/Reads'].values()))['Signal'][:10]
        expected = r.range / r.digitisation * (node + r.offset)
        np.testing.assert_allclose(sig[:10], expected, rtol=1e-6)
        # partial load
        head = r.get_raw_data(end=100)
        np.testing.assert_array_equal(head, sig[:100])


def test_wrong_read_id_raises(single_dir):
    d, entries = single_dir
    fn, _ = entries[0]
    with pytest.raises(ValueError):
        fast5.Fast5Reader(os.path.join(d, fn), 'nonexistent-read-id')


def test_albacore_events(single_dir):
    d, entries = single_dir
    fn, rid = entries[0]
    with fast5.Fast5Reader(os.path.join(d, fn), rid) as r:
        bc = r.get_basecall()
    assert bc is not None
    assert len(bc['events'].columns) == 14
    ev = bc['events']
    assert (np.diff(ev['start'].astype(np.int64)) >= 0).all()
    assert bc['sequence_length'] == len(bc['sequence'])
    assert len(bc['qstring']) == len(bc['sequence'])


def test_guppy_move_reconstruction(tmp_path):
    entries = simulate.make_fixture_dir(str(tmp_path), n_reads=2, seed=3,
                                        basecall='guppy')
    fn, rid = entries[0]
    with fast5.Fast5Reader(os.path.join(str(tmp_path), fn), rid) as r:
        bc = r.get_basecall()
    ev = bc['events']
    # reconstructed events: fixed stride, model_state from 5-mer reframing
    assert set(ev.columns) >= {'model_state', 'p_model_state', 'move',
                               'start', 'mean', 'stdv', 'length'}
    assert (ev['length'] == bc['block_stride']).all()
    strides = np.diff(ev['start'])
    assert (strides == bc['block_stride']).all()


def test_no_basecall_returns_none(tmp_path):
    entries = simulate.make_fixture_dir(str(tmp_path), n_reads=1, seed=4,
                                        basecall=None)
    fn, rid = entries[0]
    with fast5.Fast5Reader(os.path.join(str(tmp_path), fn), rid) as r:
        assert r.get_basecall() is None


def test_copyto_and_duplicate_detection(tmp_path):
    entries = simulate.make_fixture_dir(str(tmp_path), n_reads=1, seed=5)
    fn, rid = entries[0]
    out = str(tmp_path / 'out.fast5')
    with fast5.Fast5Reader(os.path.join(str(tmp_path), fn), rid) as r:
        with h5py.File(out, 'w') as dst:
            r.copyto(dst)
            with pytest.raises(fast5.DuplicatedReadError):
                r.copyto(dst)
    # the copied read must be loadable as a multi-read FAST5
    found = fast5.get_read_ids(out)
    assert found == [(out, rid)]
    with fast5.Fast5Reader(out, rid) as r2:
        assert r2.is_multiread
        assert r2.get_basecall() is not None


def test_unsplit_simulation_has_internal_adapter():
    rng = np.random.RandomState(6)
    read = simulate.simulate_read(rng, extra_adapter_at=0.5)
    sig = read.signal_pa()
    t0, t1 = read.segments['transcript']
    mid = (t0 + t1) // 2
    # the injected adapter region sits at ~80 pA inside the transcript
    inner = sig[mid + 1000:mid + 3000]
    assert abs(inner.mean() - simulate.STATE_LEVELS['adapter'][0]) < 5
