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


def check_minimap2_index(filename):
    """(poreplex/alignment_writer.py:34-38)"""
    with open(filename, 'rb') as idxf:
        if idxf.read(4) != MM_IDX_MAGIC:
            raise Exception('File magic is not found from ' + filename)


def get_indexed_sequence_list(indexfile):
    """Parse SQ names/lengths straight out of the minimap2 .mmi binary
    header (poreplex/alignment_writer.py:90-113)."""
    seqlist = []
    with open(indexfile, 'rb') as idxf:
        if idxf.read(4) != MM_IDX_MAGIC:
            raise Exception('File magic is not found from ' + indexfile)
        header_format = '<IIIII'
        header = idxf.read(calcsize(header_format))
        if len(header) != calcsize(header_format):
            raise Exception('Unexpected end of file during reading a '
                            'header: ' + indexfile)
        w, k, b, n_seq, flag = unpack(header_format, header)
        index_options = 'minimap2 -w {} -k {}'.format(w, k)
        for _ in range(n_seq):
            namlen = idxf.read(1)[0]
            name_seqlen = idxf.read(namlen + 4)
            name = name_seqlen[:-4].decode()
            seqlen = unpack('<I', name_seqlen[-4:])[0]
            seqlist.append({'LN': seqlen, 'SN': name})
    return seqlist, index_options


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

    def map(self, name, seq, qual):
        from pysam import FUNMAP, FREVERSE, FSECONDARY, FSUPPLEMENTARY
        mappy = self._mappy
        seq = seq.replace('U', 'T')
        seqmaps = list(self.aligner.map(seq))
        if not seqmaps:
            yield (name, int(FUNMAP), '*', 0, 0, '*', '*', 0, 0, seq, qual)
            return

        for i, h in enumerate(seqmaps):
            if i > 0:
                flag = int(FSECONDARY)
            elif not h.is_primary:
                flag = int(FSUPPLEMENTARY)
            else:
                flag = 0

            leftclip = '{}S'.format(h.q_st) if h.q_st > 0 else ''
            rightclip = ('{}S'.format(len(seq) - h.q_en)
                         if h.q_en < len(seq) else '')

            if h.strand > 0:
                seq_f, qual_f = seq, qual
            else:
                seq_f = mappy.revcomp(seq)
                qual_f = qual[::-1]
                leftclip, rightclip = rightclip, leftclip
                flag |= FREVERSE

            fullcigar = leftclip + h.cigar_str + rightclip
            yield (name, flag, h.ctg, h.r_st + 1, h.mapq, fullcigar, '*',
                   0, 0, seq_f, qual_f, 'NM:i:{}'.format(h.NM))

    def map_and_write(self, streamid, name, seq, qual, adapter_length):
        writer = self.writers[streamid]
        mapped_seqname = None
        if adapter_length > 0:
            seq = seq[:-adapter_length]
            qual = qual[:-adapter_length]
        for row in self.map(name, seq, qual):
            if mapped_seqname is None:
                mapped_seqname = row[2]
            writer.write(row)
        if mapped_seqname is not None and not mapped_seqname.startswith('|'):
            mapped_seqname = mapped_seqname.split('|')[0]
        return mapped_seqname

    def process(self, results):
        mapped_seqs = defaultdict(list)
        failed_counts = defaultdict(int)
        unmapped_counts = defaultdict(int)
        for result in results:
            barcode = result.get('barcode')
            streamid = result.get('label', 'fail'), barcode
            if result.get('sequence') is None or 'read_id' not in result:
                failed_counts[barcode] += 1
            else:
                mapped = self.map_and_write(streamid, result['read_id'],
                                            *result['sequence'])
                if mapped == '*':
                    unmapped_counts[barcode] += 1
                else:
                    mapped_seqs[barcode].append(mapped)
        return {'mapped': mapped_seqs, 'failed': failed_counts,
                'unmapped': unmapped_counts}
