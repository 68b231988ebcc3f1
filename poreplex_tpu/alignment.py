"""Real-time minimap2 alignment + BAM output.

Role of poreplex/alignment_writer.py: map basecalls with mappy as they
stream out of the pipeline and emit per-(label, barcode) BAMs. mappy and
pysam are optional; when absent, configuration fails early with a clear
message (same policy as the reference's keras gate,
poreplex/commandline.py:223-227).
"""

from collections import defaultdict
from struct import unpack, calcsize
from threading import Lock

from .utils import ensure_dir_exists

MM_IDX_MAGIC = b'MMI\2'

# SAM FLAG bits (SAM spec v1; fixed values, identical to pysam's F* consts)
SAM_FUNMAP = 4
SAM_FREVERSE = 16
SAM_FSECONDARY = 256
SAM_FSUPPLEMENTARY = 2048


def check_minimap2_index(filename):
    """(poreplex/alignment_writer.py:34-38)"""
    with open(filename, 'rb') as idxf:
        if idxf.read(4) != MM_IDX_MAGIC:
            raise Exception('File magic is not found from ' + filename)


def _read_exact(stream, nbytes, filename):
    data = stream.read(nbytes)
    if len(data) != nbytes:
        raise Exception('Unexpected end of file during reading a '
                        'header: ' + filename)
    return data


def get_indexed_sequence_list(indexfile):
    """Recover the SQ lines (name, length) and the indexing options from a
    raw minimap2 ``.mmi`` binary (role of
    poreplex/alignment_writer.py:90-113; format: 4-byte magic ``MMI\\2``,
    five LE u32 header words [w, k, bucket bits, n_seq, flags], then per
    sequence a u8 name length, the name bytes, and a LE u32 length)."""
    with open(indexfile, 'rb') as stream:
        if stream.read(4) != MM_IDX_MAGIC:
            raise Exception('File magic is not found from ' + indexfile)
        window, kmer, _bits, n_seq, _flags = unpack(
            '<IIIII', _read_exact(stream, calcsize('<IIIII'), indexfile))
        sequences = []
        for _ in range(n_seq):
            name_len = _read_exact(stream, 1, indexfile)[0]
            name = _read_exact(stream, name_len, indexfile).decode()
            length, = unpack('<I', _read_exact(stream, 4, indexfile))
            sequences.append({'SN': name, 'LN': length})
    return sequences, 'minimap2 -w {} -k {}'.format(window, kmer)


class BAMWriter:
    """(poreplex/alignment_writer.py:41-66)"""

    def __init__(self, output, indexed_sequence_list, index_options):
        from pysam import AlignmentFile
        header = {'SQ': indexed_sequence_list,
                  'PG': [{'ID': 'minimap2', 'PN': 'minimap2',
                          'CL': index_options,
                          'DS': 'minimap2 invoked by poreplex-tpu'}]}
        ensure_dir_exists(output)
        self.writer = AlignmentFile(output, 'wb', header=header)
        self.lock = Lock()

    def close(self):
        if hasattr(self, 'writer'):
            self.writer.close()
            del self.writer

    def write(self, fields):
        from pysam import AlignedSegment
        line = '\t'.join(map(str, fields))
        segment = AlignedSegment.fromstring(line, self.writer.header)
        with self.lock:
            self.writer.write(segment)


class AlignmentWriter:
    """(poreplex/alignment_writer.py:69-182)"""

    def __init__(self, indexfile, output, output_layout):
        import mappy
        self._mappy = mappy
        self.aligner = mappy.Aligner(indexfile)
        if not self.aligner:
            raise Exception(
                'Could not open minimap2 index {}.'.format(indexfile))
        indexed_sequences, index_options = \
            get_indexed_sequence_list(indexfile)
        self.writers = {
            muxid: BAMWriter(output.format(name), indexed_sequences,
                             index_options)
            for muxid, name in output_layout.items()}

    def close(self):
        for writer in self.writers.values():
            writer.close()
        self.writers.clear()

    def _hit_flag(self, hit, rank):
        """SAM FLAG for one mappy hit: the first reported hit is either the
        primary alignment (0) or, when mappy demoted it, supplementary;
        every later hit is secondary; reverse-strand adds FREVERSE in
        _hit_row."""
        if rank > 0:
            return SAM_FSECONDARY
        if not hit.is_primary:
            return SAM_FSUPPLEMENTARY
        return 0

    def _hit_row(self, hit, rank, name, seq, qual):
        """One SAM row for one mappy hit: soft-clip the unaligned query
        ends, flip to reference orientation on minus-strand hits (clips
        swap sides with the sequence), 1-based position, NM tag."""
        flag = self._hit_flag(hit, rank)
        clips = ['{}S'.format(hit.q_st) if hit.q_st > 0 else '',
                 '{}S'.format(len(seq) - hit.q_en)
                 if hit.q_en < len(seq) else '']
        if hit.strand <= 0:
            flag |= SAM_FREVERSE
            seq = self._mappy.revcomp(seq)
            qual = qual[::-1]
            clips.reverse()
        cigar = clips[0] + hit.cigar_str + clips[1]
        return (name, flag, hit.ctg, hit.r_st + 1, hit.mapq, cigar,
                '*', 0, 0, seq, qual, 'NM:i:{}'.format(hit.NM))

    def sam_records(self, name, seq, qual):
        """All SAM rows for one read (DNA-alphabet query); a read with no
        hits yields the single unmapped record."""
        seq = seq.replace('U', 'T')
        hits = list(self.aligner.map(seq))
        if not hits:
            return [(name, SAM_FUNMAP, '*', 0, 0, '*', '*', 0, 0, seq,
                     qual)]
        return [self._hit_row(hit, rank, name, seq, qual)
                for rank, hit in enumerate(hits)]

    # name kept for callers expecting the reference's interface
    map = sam_records

    def map_and_write(self, streamid, name, seq, qual, adapter_length):
        """Align one read and emit its rows into the stream's BAM. Returns
        the contig of the first row ('*' when unmapped), shortened at the
        first '|' for display (dashboard contig panel)."""
        if adapter_length > 0:
            seq, qual = seq[:-adapter_length], qual[:-adapter_length]
        rows = self.sam_records(name, seq, qual)
        writer = self.writers[streamid]
        for row in rows:
            writer.write(row)
        contig = rows[0][2]
        if not contig.startswith('|'):
            contig = contig.split('|')[0]
        return contig

    def process(self, results):
        """Map a batch of report dicts; returns per-barcode mapped contig
        lists + failed/unmapped tallies for the dashboard."""
        outcome = {'mapped': defaultdict(list), 'failed': defaultdict(int),
                   'unmapped': defaultdict(int)}
        for result in results:
            barcode = result.get('barcode')
            if result.get('sequence') is None or 'read_id' not in result:
                outcome['failed'][barcode] += 1
                continue
            streamid = result.get('label', 'fail'), barcode
            contig = self.map_and_write(streamid, result['read_id'],
                                        *result['sequence'])
            if contig == '*':
                outcome['unmapped'][barcode] += 1
            else:
                outcome['mapped'][barcode].append(contig)
        return outcome
