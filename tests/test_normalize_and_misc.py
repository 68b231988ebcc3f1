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


def test_dashboard_format_bar():
    from poreplex_tpu.dashboard import format_bar
    row = format_bar('progress', 0.5, 40)
    assert row.startswith('progress [')
    assert row.endswith('  50.0%')
    assert len(row) <= 40
    inner = row[row.index('[') + 1:row.index(']')]
    assert inner.count('#') == round(len(inner) * 0.5)
    # clamping
    assert format_bar('x', 1.7, 30).endswith(' 100.0%')
    assert '#' not in format_bar('x', -0.2, 30)


def test_dashboard_rates():
    from poreplex_tpu.dashboard import (demux_rate, mapped_rate,
                                        ReadMappingStatistics)
    counts = {('pass', 0, 'okay'): 30, ('pass', None, 'okay'): 10,
              ('fail', None, 'adapter_not_detected'): 10}
    rate, total = demux_rate(counts)
    assert total == 50 and rate == pytest.approx(0.6)
    assert demux_rate({}) == (0.0, 0)

    stats = ReadMappingStatistics()
    stats.feed({'mapped': {0: ['chr1'] * 6}, 'unmapped': {0: 3},
                'failed': {None: 1}})
    rate, denom = mapped_rate(stats)
    assert denom == 10 and rate == pytest.approx(0.6)


def test_dashboard_render_layout():
    """Pure renderer: header, two progress bars, group stats and the
    top-contig panel fit the given screen and clamp to it
    (poreplex/dashboard.py:140-505 feature set)."""
    from poreplex_tpu.dashboard import render_dashboard
    state = {
        'elapsed_s': 3723.0,   # 01:02:03
        'reads_found': 100, 'reads_processed': 40, 'reads_queued': 60,
        'scan_finished': False,
        'rate_label': 'demuxed', 'rate_fraction': 0.25,
        'group_name': 'BC1', 'mapped': 7, 'unmapped': 2, 'failed': 1,
        'top_contigs': [('chr{}'.format(i), 50 - i) for i in range(60)],
    }
    width, height = 72, 20
    rows = render_dashboard(state, width, height)
    assert len(rows) <= height
    assert all(len(r) <= width for r in rows)
    assert '01:02:03' in rows[0]
    assert 'found 100' in rows[0] and 'processed 40' in rows[0]
    assert rows[1].startswith('progress') and '40.0%' in rows[1]
    assert '(scanning)' in rows[1]
    assert rows[2].startswith('demuxed') and '25.0%' in rows[2]
    assert 'Group: BC1' in rows[4]
    assert 'mapped 7  unmapped 2  failed 1' in rows[5]
    assert rows[7] == 'Top mapped contigs:'
    # contig panel clipped to the remaining rows
    assert 'chr0' in rows[8]
    assert len(rows) == height


def test_dashboard_snapshot_state():
    from collections import defaultdict
    from poreplex_tpu.dashboard import DashboardView

    class FakeTracker:
        counts = {('pass', 1, 'okay'): 8, ('pass', None, 'okay'): 2}

    class FakeSession:
        reads_found = 20
        reads_processed = 10
        reads_queued = 10
        scan_finished = True
        finalsummary_tracker = FakeTracker()

    view = DashboardView(FakeSession(), {1: 'BC2', None: 'undetermined'},
                         'progress', 'demux_rate', 0, {})
    view.stats.feed({'mapped': {1: ['chr2', 'chr2']}, 'unmapped': {1: 1}})
    view.selected_group = 99     # clamps to the known groups
    state = view.snapshot_state()
    assert view.selected_group == 0
    assert state['group_name'] == 'BC2'
    assert state['mapped'] == 2 and state['unmapped'] == 1
    assert state['rate_label'] == 'demuxed'
    assert state['rate_fraction'] == pytest.approx(0.8)
    assert state['top_contigs'] == [('chr2', 2)]

    view.rate_stat = 'mapped_rate'
    state = view.snapshot_state()
    assert state['rate_label'] == 'mapped'
    assert state['rate_fraction'] == pytest.approx(2 / 3)


def test_kmer_model_loader_contract():
    """The kmer table loads through the exact production path
    (pd.read_csv(sep='\t', index_col=0) + len(index[0]), mirroring
    poreplex/worker_persistence.py:64-66) and satisfies the upstream
    nanoporetech/kmer_models file contract, so the real
    r9.4_180mv_70bps_5mer_RNA/template_median69pA.model drops in with no
    code change (PARITY.md 'Kmer model table')."""
    import pandas as pd
    from poreplex_tpu.config import load_preset

    config = load_preset()
    kmermodel = pd.read_csv(config['kmer_model'], header=0, index_col=0,
                            sep='\t')
    kmersize = len(kmermodel.index[0])

    assert kmersize == 5
    assert len(kmermodel) == 4 ** 5            # complete 5-mer table
    assert kmermodel.index.is_unique
    assert set(''.join(kmermodel.index)) == set('ACGT')
    assert 'level_mean' in kmermodel.columns   # the consumed column
    assert kmermodel['level_mean'].between(40, 160).all()   # pA range
