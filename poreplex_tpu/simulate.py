"""Synthetic nanopore DRS read simulator + FAST5 fixture writer.

The reference ships no test fixtures at all (SURVEY.md §4); this module
fills that gap by synthesizing reads whose signal follows the preset HMM's
state sequence (pre-leader -> leader -> adapter -> poly(A) -> transcript,
presets/rna-r941.cfg:61-101) and writing them as single- or multi-read
FAST5 files with albacore-style Events or guppy-style Move basecall groups
(layouts mirrored from poreplex/fast5_file.py:37-58, :133-230).
"""

import os
import uuid

import h5py
import numpy as np

DIGITISATION = 8192.0
RANGE = 1169.0
OFFSET = 3.0
SAMPLING_RATE = 3012.0

STATE_LEVELS = {
    'pre-leader': (71.5, 3.66),
    'leader-low': (102.07, 3.91),
    'leader-high': (112.02, 4.80),
    'adapter': (80.49, 7.41),
    'polya-tail': (108.95, 2.55),
    'transcript': (96.0, 11.0),
}

BASES = 'ACGT'


class SimulatedRead:

    def __init__(self, read_id, raw_dac, segments, sequence, qstring,
                 events, moves, channel='101', run_id=None,
                 sample_id='simulated', start_time=0):
        self.read_id = read_id
        self.raw_dac = raw_dac
        self.segments = segments          # {state: (start_sample, end_sample)}
        self.sequence = sequence          # RNA bases (with U)
        self.qstring = qstring
        self.events = events              # dict of numpy columns (albacore)
        self.moves = moves                # uint8 move table (guppy)
        self.channel = channel
        self.run_id = run_id or uuid.uuid4().hex
        self.sample_id = sample_id
        self.start_time = start_time

    @property
    def duration(self):
        return len(self.raw_dac)

    def signal_pa(self):
        return np.asarray(RANGE / DIGITISATION * (self.raw_dac + OFFSET),
                          np.float32)


def _to_dac(pa):
    dac = pa / (RANGE / DIGITISATION) - OFFSET
    return np.clip(np.round(dac), -32768, 32767).astype(np.int16)


def simulate_read(rng, transcript_len=9000, polya_len=2500, adapter_len=5500,
                  preleader_len=700, leader_len=900, seq_per_event=0.35,
                  read_id=None, noise=1.0, polya_spikes=0,
                  extra_adapter_at=None, barcode=None):
    """Generate one synthetic read.

    Durations are in raw samples. ``extra_adapter_at`` (fraction of
    transcript) injects a second leader+adapter inside the transcript to
    create a pseudo-fusion (unsplit) read for chimera-filter testing.
    ``barcode`` (0..3) modulates the adapter segment with that barcode's
    characteristic low-frequency signature (training.data.BARCODE_FREQS),
    emulating a barcoded control run for demux-training workflows.
    """
    # ids derive from the caller's rng so a fixture set is byte-identical
    # across invocations with one seed (the whole-run golden test and the
    # bench fixture cache rely on this)
    read_id = read_id or str(uuid.UUID(bytes=rng.bytes(16), version=4))
    run_id = uuid.UUID(bytes=rng.bytes(16), version=4).hex
    parts = []
    segments = {}
    layout = [
        ('pre-leader', preleader_len),
        ('leader-low', leader_len * 2 // 3),
        ('leader-high', leader_len - leader_len * 2 // 3),
        ('adapter', adapter_len),
        ('polya-tail', polya_len),
        ('transcript', transcript_len),
    ]
    pos = 0
    for state, dur in layout:
        mu, sd = STATE_LEVELS[state]
        seg = rng.normal(mu, sd * noise, dur)
        if state == 'adapter' and barcode is not None:
            from .training.data import BARCODE_AMPS, BARCODE_FREQS
            # the demux window covers the last 300 POOLED frames, so the
            # signature rides at the pooled-frame frequency (stride 15)
            t = np.arange(dur) / 15.0
            seg += BARCODE_AMPS[barcode] * np.sin(
                2 * np.pi * BARCODE_FREQS[barcode] * t +
                rng.uniform(0, 2 * np.pi))
        if state == 'polya-tail' and polya_spikes:
            for _ in range(polya_spikes):
                at = rng.randint(dur // 4, 3 * dur // 4)
                w = rng.randint(20, 60)
                seg[at:at + w] += rng.normal(-25, 3)
        if state == 'transcript':
            # transcript signal wanders between kmer levels
            nlevels = max(2, -(-transcript_len // 35))
            levels = rng.normal(mu, sd, nlevels)
            seg = np.repeat(levels, 35)[:dur] + rng.normal(0, 2.0, dur)
            if extra_adapter_at is not None:
                at = int(dur * extra_adapter_at)
                lmu, lsd = STATE_LEVELS['leader-high']
                amu, asd = STATE_LEVELS['adapter']
                ldur = min(900, max(0, dur - at))
                adur = min(4000, max(0, dur - at - ldur))
                seg[at:at + ldur] = rng.normal(lmu, lsd, ldur)
                seg[at + ldur:at + ldur + adur] = rng.normal(amu, asd, adur)
        seg_start = pos
        pos += len(seg)
        if state.startswith('leader'):
            segments.setdefault('leader', [seg_start, pos - 1])
            segments['leader'][1] = pos - 1
        else:
            segments[state] = (seg_start, pos - 1)
        parts.append(seg)

    signal_pa = np.concatenate(parts).astype(np.float32)

    # Basecalled sequence + event table over the transcript region.
    tr_start, tr_end = segments['transcript']
    n_events = max(8, int((tr_end - tr_start + 1) / 35))
    moves = (rng.uniform(size=n_events) < seq_per_event).astype(np.uint8)
    moves[0] = 1
    seqlen = int(moves.sum()) + 4  # 5-mer model: kmer_size - 1 extra bases
    sequence = ''.join(rng.choice(list(BASES), seqlen))
    qstring = ''.join(chr(33 + q) for q in
                      rng.randint(4, 30, seqlen))

    ev_starts = np.linspace(tr_start, tr_end - 35, n_events).astype(np.int64)
    ev_lengths = np.diff(np.append(ev_starts, tr_end)).astype(np.int64)
    pos_idx = np.cumsum(moves) - 1
    model_states = np.array(
        [sequence[min(p, seqlen - 5):min(p, seqlen - 5) + 5]
         .replace('U', 'T').encode() for p in pos_idx], dtype='S5')
    ev_means = np.array([signal_pa[s:s + max(l, 1)].mean()
                         for s, l in zip(ev_starts, ev_lengths)], np.float32)
    ev_stdvs = np.array([signal_pa[s:s + max(l, 1)].std()
                         for s, l in zip(ev_starts, ev_lengths)], np.float32)
    p_model = rng.uniform(0.2, 0.95, n_events)

    events = {
        'mean': ev_means,
        'start': ev_starts.astype(np.uint64),
        'stdv': ev_stdvs,
        'length': ev_lengths.astype(np.uint64),
        'model_state': model_states,
        'move': moves.astype(np.int64),
        'p_model_state': p_model,
    }

    # RNA is sequenced 3'->5'; poreplex reverses and T->U on output.
    rna_sequence = sequence

    return SimulatedRead(read_id, _to_dac(signal_pa), segments, rna_sequence,
                         qstring, events, moves, run_id=run_id)


# ---------------------------------------------------------------- writers

ALBACORE_FILLER_COLS = ['weights', 'p_A', 'p_C', 'p_G', 'p_U', 'raw_index',
                        'prev_state']   # pad table to albacore's 14 columns


def _write_albacore_events(group, read):
    n = len(read.events['mean'])
    dtype = [('mean', '<f8'), ('start', '<u8'), ('stdv', '<f8'),
             ('length', '<u8'), ('model_state', 'S5'), ('move', '<i8'),
             ('p_model_state', '<f8')]
    dtype += [(c, '<f8') for c in ALBACORE_FILLER_COLS]
    table = np.zeros(n, dtype=dtype)
    for k in ('mean', 'start', 'stdv', 'length', 'model_state', 'move',
              'p_model_state'):
        table[k] = read.events[k]
    group.create_dataset('BaseCalled_template/Events', data=table)


def _write_basecall(parent, read, style='albacore'):
    """Create Analyses/{Basecall_1D_000,Segmentation_000} groups."""
    analyses = parent.require_group('Analyses')
    bc = analyses.require_group('Basecall_1D_000')
    seg = analyses.require_group('Segmentation_000')

    fastq = '@{}\n{}\n+\n{}\n'.format(read.read_id, read.sequence,
                                      read.qstring)
    if style == 'albacore':
        _write_albacore_events(bc, read)
    elif style == 'guppy':
        bc.create_dataset('BaseCalled_template/Move',
                          data=read.moves.astype(np.uint8))
    bc.create_dataset('BaseCalled_template/Fastq',
                      data=np.bytes_(fastq))

    summ = bc.require_group('Summary/basecall_1d_template')
    summ.attrs['sequence_length'] = len(read.sequence)
    summ.attrs['mean_qscore'] = 9.5
    summ.attrs['block_stride'] = 10
    segsum = seg.require_group('Summary/segmentation')
    segsum.attrs['num_events_template'] = len(read.events['mean'])
    segsum.attrs['first_sample_template'] = int(
        read.segments['transcript'][0])


def _write_channel_tracking(parent, read):
    ch = parent.require_group('channel_id') if 'read_' in parent.name \
        else parent.require_group('UniqueGlobalKey/channel_id')
    tr = parent.require_group('tracking_id') if 'read_' in parent.name \
        else parent.require_group('UniqueGlobalKey/tracking_id')
    ch.attrs['channel_number'] = np.bytes_(read.channel)
    ch.attrs['digitisation'] = DIGITISATION
    ch.attrs['offset'] = OFFSET
    ch.attrs['range'] = RANGE
    ch.attrs['sampling_rate'] = SAMPLING_RATE
    tr.attrs['run_id'] = np.bytes_(read.run_id)
    tr.attrs['sample_id'] = np.bytes_(read.sample_id)


def write_single_read_fast5(path, read, basecall='albacore'):
    """Single-read layout: UniqueGlobalKey + Raw/Reads/Read_N
    (poreplex/fast5_file.py:76-82)."""
    with h5py.File(path, 'w') as f5:
        raw = f5.create_group('Raw/Reads/Read_1001')
        raw.attrs['read_id'] = np.bytes_(read.read_id)
        raw.attrs['duration'] = read.duration
        raw.attrs['start_time'] = read.start_time
        raw.create_dataset('Signal', data=read.raw_dac)
        _write_channel_tracking(f5, read)
        if basecall:
            _write_basecall(f5, read, basecall)


def write_multi_read_fast5(path, reads, basecall='albacore'):
    """Multi-read layout: read_<id> groups (poreplex/fast5_file.py:70-75)."""
    with h5py.File(path, 'w') as f5:
        for read in reads:
            grp = f5.create_group('read_' + read.read_id)
            raw = grp.create_group('Raw')
            raw.attrs['read_id'] = np.bytes_(read.read_id)
            raw.attrs['duration'] = read.duration
            raw.attrs['start_time'] = read.start_time
            raw.create_dataset('Signal', data=read.raw_dac)
            _write_channel_tracking(grp, read)
            if basecall:
                _write_basecall(grp, read, basecall)


def make_fixture_dir(outdir, n_reads=8, seed=0, basecall='albacore',
                     multi_read=False, **simkw):
    """Write a directory of synthetic FAST5s; returns list of
    (filename, read_id)."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.RandomState(seed)
    reads = [simulate_read(rng, **simkw) for _ in range(n_reads)]
    entries = []
    if multi_read:
        fname = 'batch0.fast5'
        write_multi_read_fast5(os.path.join(outdir, fname), reads, basecall)
        entries = [(fname, r.read_id) for r in reads]
    else:
        for i, read in enumerate(reads):
            fname = 'read{:03d}.fast5'.format(i)
            write_single_read_fast5(os.path.join(outdir, fname), read,
                                    basecall)
            entries.append((fname, read.read_id))
    return entries
