"""Alignment-writer logic without mappy/pysam: SAM row construction, flag
assignment, clip/orientation handling, adapter trimming, and dashboard
tallies, driven by a fake aligner (semantics pinned to
poreplex/alignment_writer.py:115-182)."""

import numpy as np
import pytest

from poreplex_tpu import alignment
from poreplex_tpu.alignment import (AlignmentWriter, SAM_FUNMAP,
                                    SAM_FREVERSE, SAM_FSECONDARY,
                                    SAM_FSUPPLEMENTARY,
                                    get_indexed_sequence_list)

COMPLEMENT = str.maketrans('ACGT', 'TGCA')


class FakeMappy:
    @staticmethod
    def revcomp(seq):
        return seq.translate(COMPLEMENT)[::-1]


class FakeHit:
    def __init__(self, ctg='chr1', r_st=99, q_st=0, q_en=None, strand=1,
                 mapq=60, cigar_str='10M', NM=1, is_primary=True, qlen=10):
        self.ctg = ctg
        self.r_st = r_st
        self.q_st = q_st
        self.q_en = qlen if q_en is None else q_en
        self.strand = strand
        self.mapq = mapq
        self.cigar_str = cigar_str
        self.NM = NM
        self.is_primary = is_primary


class FakeAligner:
    def __init__(self, hits):
        self.hits = hits
        self.queries = []

    def map(self, seq):
        self.queries.append(seq)
        return iter(self.hits)


class RecordingBAM:
    def __init__(self):
        self.rows = []

    def write(self, fields):
        self.rows.append(fields)


def make_writer(hits, streams=(('pass', None),)):
    w = object.__new__(AlignmentWriter)
    w._mappy = FakeMappy
    w.aligner = FakeAligner(list(hits))
    w.writers = {sid: RecordingBAM() for sid in streams}
    return w


def test_unmapped_row():
    w = make_writer([])
    rows = w.sam_records('r1', 'ACGUACGUAC', 'IIIIIIIIII')
    assert rows == [('r1', SAM_FUNMAP, '*', 0, 0, '*', '*', 0, 0,
                     'ACGTACGTAC', 'IIIIIIIIII')]
    # RNA U must be mapped as T
    assert w.aligner.queries == ['ACGTACGTAC']


def test_forward_primary_with_clips():
    hit = FakeHit(q_st=2, q_en=7, qlen=10, cigar_str='5M', r_st=99)
    w = make_writer([hit])
    (row,) = w.sam_records('r1', 'ACGTACGTAC', '0123456789')
    name, flag, ctg, pos, mapq, cigar, rnext, pnext, tlen, seq, qual, nm = row
    assert (name, flag, ctg, pos, mapq) == ('r1', 0, 'chr1', 100, 60)
    assert cigar == '2S5M3S'
    assert (seq, qual) == ('ACGTACGTAC', '0123456789')
    assert nm == 'NM:i:1'


def test_reverse_secondary_swaps_clips_and_revcomps():
    hits = [FakeHit(), FakeHit(ctg='chr2', q_st=2, q_en=7, qlen=10,
                               strand=-1, cigar_str='5M')]
    w = make_writer(hits)
    rows = w.sam_records('r1', 'ACGTACGTAC', '0123456789')
    assert rows[0][1] == 0
    flag = rows[1][1]
    assert flag == SAM_FSECONDARY | SAM_FREVERSE
    # clips swap sides when flipped to reference orientation
    assert rows[1][5] == '3S5M2S'
    assert rows[1][9] == FakeMappy.revcomp('ACGTACGTAC')
    assert rows[1][10] == '9876543210'


def test_demoted_first_hit_is_supplementary():
    (row,) = make_writer([FakeHit(is_primary=False)]).sam_records(
        'r1', 'ACGTACGTAC', 'IIIIIIIIII')
    assert row[1] == SAM_FSUPPLEMENTARY


def test_map_and_write_trims_adapter_and_reports_contig():
    hit = FakeHit(ctg='ENST0001|GENE', qlen=8, q_en=8, cigar_str='8M')
    w = make_writer([hit], streams=(('pass', 0),))
    contig = w.map_and_write(('pass', 0), 'r1', 'ACGTACGTAC', '0123456789', 2)
    assert contig == 'ENST0001'            # display name cut at '|'
    rows = w.writers[('pass', 0)].rows
    assert len(rows) == 1
    assert rows[0][9] == 'ACGTACGT'        # 3' adapter removed pre-mapping
    assert rows[0][10] == '01234567'


def test_process_tallies_by_barcode():
    w = make_writer([], streams=(('pass', 0), ('pass', 1), ('fail', None)))
    # one unmapped pass read, one sequence-less failure
    out = w.process([
        {'read_id': 'a', 'label': 'pass', 'barcode': 0,
         'sequence': ('ACGT', 'IIII', 0)},
        {'label': 'fail', 'barcode': None, 'status': 'not_basecalled'},
    ])
    assert out['unmapped'][0] == 1
    assert out['failed'][None] == 1
    assert not out['mapped']

    w2 = make_writer([FakeHit(qlen=4, q_en=4, cigar_str='4M')],
                     streams=(('pass', 1),))
    out2 = w2.process([{'read_id': 'b', 'label': 'pass', 'barcode': 1,
                        'sequence': ('ACGU', 'IIII', 0)}])
    assert out2['mapped'][1] == ['chr1']


def test_mmidx_parser_roundtrip(tmp_path):
    """Binary .mmi header parse (same fixture format as the reference's
    raw parser, poreplex/alignment_writer.py:90-113)."""
    import struct
    path = str(tmp_path / 'x.mmi')
    with open(path, 'wb') as f:
        f.write(b'MMI\2')
        f.write(struct.pack('<IIIII', 10, 15, 14, 2, 0))
        for name, ln in ((b'chr1', 1000), (b'tig00042', 77)):
            f.write(bytes([len(name)]) + name + struct.pack('<I', ln))
    seqs, opts = get_indexed_sequence_list(path)
    assert seqs == [{'SN': 'chr1', 'LN': 1000}, {'SN': 'tig00042', 'LN': 77}]
    assert opts == 'minimap2 -w 10 -k 15'

    with pytest.raises(Exception, match='magic'):
        bad = str(tmp_path / 'bad.mmi')
        open(bad, 'wb').write(b'XXXX')
        get_indexed_sequence_list(bad)
