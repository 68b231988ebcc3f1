"""Normalization kernels vs scipy/numpy semantics + misc host components
(mmidx header parser, dashboard statistics, interval union)."""

import os
import struct

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.signal import medfilt as scipy_medfilt

from poreplex_tpu.ops import normalize
from poreplex_tpu.utils.intervals import union_intervals


def test_masked_median_matches_numpy():
    rng = np.random.RandomState(0)
    for n in (5, 6, 99, 100):
        x = rng.normal(0, 10, (3, 120)).astype(np.float32)
        valid = np.zeros((3, 120), bool)
        valid[:, :n] = True
        got = np.asarray(normalize.masked_median(jnp.asarray(x),
                                                 jnp.asarray(valid)))
        for b in range(3):
            np.testing.assert_allclose(got[b], np.median(x[b, :n]),
                                       rtol=1e-6)


def test_med_mad_normalize_matches_reference_formula():
    """(sig - med) / max(0.01, mad * 1.4826) — poreplex/barcoding.py:77-81."""
    rng = np.random.RandomState(1)
    x = rng.normal(80, 7, (2, 300)).astype(np.float32)
    valid = np.ones((2, 300), bool)
    got = np.asarray(normalize.med_mad_normalize(jnp.asarray(x),
                                                 jnp.asarray(valid)))
    for b in range(2):
        med = np.median(x[b])
        mad = np.median(np.abs(x[b] - med))
        expected = (x[b] - med) / max(0.01, mad * 1.4826)
        np.testing.assert_allclose(got[b], expected, rtol=1e-4, atol=1e-4)


def test_medfilt_matches_scipy():
    rng = np.random.RandomState(2)
    x = rng.normal(100, 10, (2, 257)).astype(np.float32)
    lens = np.array([257, 100])
    valid = np.arange(257)[None, :] < lens[:, None]
    got = np.asarray(normalize.medfilt(jnp.asarray(x), jnp.asarray(valid), 7))
    for b in range(2):
        expected = scipy_medfilt(x[b, :lens[b]], 7)
        np.testing.assert_allclose(got[b, :lens[b]], expected, rtol=1e-6)
    assert (got[1, 100:] == 0).all()


def test_pool_mean_matches_reference():
    rng = np.random.RandomState(3)
    x = rng.normal(0, 1, (2, 109)).astype(np.float32)
    got = np.asarray(normalize.pool_mean(jnp.asarray(x), 15))
    n = 109 - 109 % 15
    expected = x[:, :n].reshape(2, -1, 15).mean(axis=2)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_union_intervals_reference_semantics():
    assert union_intervals([]) == []
    assert union_intervals([[5, 9], [1, 3]]) == [[1, 3], [5, 9]]
    assert union_intervals([[1, 5], [4, 9], [9, 12]]) == [[1, 12]]
    assert union_intervals([[1, 5], [6, 9]]) == [[1, 5], [6, 9]]


def test_mmidx_header_parser(tmp_path):
    """Parse the binary minimap2 .mmi header layout
    (poreplex/alignment_writer.py:90-113)."""
    from poreplex_tpu.alignment import (get_indexed_sequence_list,
                                        check_minimap2_index, MM_IDX_MAGIC)
    path = str(tmp_path / 'idx.mmi')
    seqs = [(b'chr1', 1000), (b'contig|x', 250)]
    with open(path, 'wb') as f:
        f.write(MM_IDX_MAGIC)
        f.write(struct.pack('<IIIII', 10, 15, 14, len(seqs), 0))
        for name, ln in seqs:
            f.write(bytes([len(name)]))
            f.write(name)
            f.write(struct.pack('<I', ln))
    check_minimap2_index(path)
    seqlist, opts = get_indexed_sequence_list(path)
    assert seqlist == [{'LN': 1000, 'SN': 'chr1'},
                       {'LN': 250, 'SN': 'contig|x'}]
    assert opts == 'minimap2 -w 10 -k 15'

    bad = str(tmp_path / 'bad.mmi')
    with open(bad, 'wb') as f:
        f.write(b'NOPE')
    with pytest.raises(Exception):
        check_minimap2_index(bad)


def test_dashboard_statistics():
    from poreplex_tpu.dashboard import ReadMappingStatistics
    stats = ReadMappingStatistics(aliases={'NC_0001': 'chr1'})
    stats.feed({'mapped': {0: ['NC_0001', 'NC_0001', 'chrM']},
                'failed': {0: 2}, 'unmapped': {0: 1}})
    stats.feed({'mapped': {None: ['chrX']}})
    assert stats.total[0] == 3
    assert stats.failed[0] == 2
    assert stats.unmapped[0] == 1
    assert stats.top_contigs(0) == [('chr1', 2), ('chrM', 1)]
    assert stats.groups() == [0, None]


def test_dashboard_load_aliases(tmp_path):
    from poreplex_tpu.dashboard import load_aliases
    p = tmp_path / 'aliases.txt'
    p.write_text('NC_0001\tchr1\nNC_0002\tchr2\n')
    assert load_aliases(str(p)) == {'NC_0001': 'chr1', 'NC_0002': 'chr2'}
