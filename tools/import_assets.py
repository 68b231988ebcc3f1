#!/usr/bin/env python3
"""Convert the reference poreplex model assets into poreplex-tpu's own
framework-neutral formats.

Reads the pre-trained Keras HDF5 bundles shipped with the reference
(poreplex/presets/MIN106-RNA001/{scaler-r3,demux-tetra-r4}.hdf5 — layer
layout documented in SURVEY.md §7.2) and the numeric preset
(poreplex/presets/rna-r941.cfg), and emits:

  poreplex_tpu/presets/rna-r941.yaml                    numeric knobs + HMM spec
  poreplex_tpu/presets/MIN106-RNA001/scaler-r3.npz      LSTM48/LSTM48/Dense2 weights
  poreplex_tpu/presets/MIN106-RNA001/demux-tetra-r4.npz BiLSTM48/LSTM64/Dense5 weights
  poreplex_tpu/presets/kmer_models/.../template_median69pA.model
        synthetic 5-mer table (upstream ships this as a git submodule that is
        not vendored; only the k-mer *size* affects runtime behavior here)

Weight arrays are stored in Keras gate order [i, f, c, o] exactly as found in
the source file; the JAX forward pass consumes them in the same order so
numerical parity is bit-exact at the weight level.
"""

import itertools
import json
import os
import sys

import h5py
import numpy as np
import yaml

REFERENCE = os.environ.get('POREPLEX_REFERENCE', '/root/reference')
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUTDIR = os.path.join(REPO, 'poreplex_tpu', 'presets')


def import_scaler(src, dst):
    out = {}
    with h5py.File(src, 'r') as f:
        mw = f['model_weights']
        for ours, theirs in [('lstm1', 'lstm_1/lstm_1'),
                             ('lstm2', 'lstm_2/lstm_2')]:
            out[ours + '/kernel'] = mw[theirs + '/kernel:0'][:]
            out[ours + '/recurrent'] = mw[theirs + '/recurrent_kernel:0'][:]
            out[ours + '/bias'] = mw[theirs + '/bias:0'][:]
        out['dense/kernel'] = mw['dense_2/dense_2/kernel:0'][:]
        out['dense/bias'] = mw['dense_2/dense_2/bias:0'][:]

        input_defs = eval(mw.attrs['input_defs'].decode()
                          if isinstance(mw.attrs['input_defs'], bytes)
                          else mw.attrs['input_defs'])
        xfrm = eval(mw.attrs['output_transform'].decode()
                    if isinstance(mw.attrs['output_transform'], bytes)
                    else mw.attrs['output_transform'])
        out['meta'] = np.frombuffer(json.dumps({
            'input': input_defs,
            'output_transform': xfrm,
            'model_version': (mw.attrs['model_version'].decode()
                              if isinstance(mw.attrs['model_version'], bytes)
                              else str(mw.attrs['model_version'])),
        }).encode(), dtype=np.uint8)
    np.savez(dst, **out)
    print('wrote', dst)


def import_demux(src, dst):
    out = {}
    with h5py.File(src, 'r') as f:
        mw = f['model_weights']
        for ours, theirs in [
                ('bilstm_fwd', 'bidirectional_2/bidirectional_2/forward_rnn'),
                ('bilstm_bwd', 'bidirectional_2/bidirectional_2/backward_rnn'),
                ('lstm2', 'rnn_1/rnn_1')]:
            out[ours + '/kernel'] = mw[theirs + '/kernel:0'][:]
            out[ours + '/recurrent'] = mw[theirs + '/recurrent_kernel:0'][:]
            out[ours + '/bias'] = mw[theirs + '/bias:0'][:]
        out['dense/kernel'] = mw['dense_2/dense_2/kernel:0'][:]
        out['dense/bias'] = mw['dense_2/dense_2/bias:0'][:]

        calib = f['poreplex_params/calibration'][:]
        assert np.all(calib['phred'] == np.arange(len(calib))), \
            'calibration table must be phred-continuous'
        out['calibration'] = calib['pred_score'].astype(np.float64)
        out['loss_weights'] = f['poreplex_params/loss_weights'][:]
    np.savez(dst, **out)
    print('wrote', dst)


def import_preset(src, dst):
    with open(src) as f:
        preset = yaml.safe_load(f)
    # Re-point model assets at our converted bundles.
    preset['signal_processing']['scaler_model'] = 'MIN106-RNA001/scaler-r3.npz'
    preset['demultiplexing']['demux_model'] = 'MIN106-RNA001/demux-tetra-r4.npz'
    preset['preset_name'] = 'rna-r941'
    with open(dst, 'w') as f:
        f.write('# poreplex-tpu preset converted from the reference '
                'rna-r941.cfg\n# (numeric knobs and HMM specifications are '
                'behavioral constants required for\n# output parity; model '
                'paths point at the converted .npz weight bundles)\n')
        yaml.safe_dump(preset, f, sort_keys=False)
    print('wrote', dst)


def synthesize_kmer_model(dst):
    """The upstream kmer_models git submodule is not vendored in the
    reference snapshot. Only the k-mer size (5) influences runtime behavior
    (poreplex/worker_persistence.py:66, signal_analyzer.py:334); the level
    means are used only by the albacore on-the-fly path which depends on the
    proprietary albacore package. Emit a deterministic synthetic 5-mer RNA
    table with plausible level means so the loader semantics stay intact."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    bases = 'ACGT'
    # Simple deterministic per-base contribution model around the DRS pore
    # level range (~60..130 pA).
    contrib = {'A': 108.9, 'C': 78.0, 'G': 92.5, 'T': 86.3}
    poswt = [0.35, 0.25, 0.2, 0.12, 0.08]
    with open(dst, 'w') as f:
        print('kmer', 'level_mean', 'level_stdv', 'sd_mean', 'sd_stdv',
              'weight', sep='\t', file=f)
        for kmer in map(''.join, itertools.product(bases, repeat=5)):
            level = sum(contrib[b] * w for b, w in zip(kmer, poswt)) / sum(poswt)
            print(kmer, format(level, '.6f'), '2.5', '1.5', '0.5', '1000',
                  sep='\t', file=f)
    print('wrote', dst)


def main():
    presets_src = os.path.join(REFERENCE, 'poreplex', 'presets')
    os.makedirs(os.path.join(OUTDIR, 'MIN106-RNA001'), exist_ok=True)

    import_scaler(os.path.join(presets_src, 'MIN106-RNA001', 'scaler-r3.hdf5'),
                  os.path.join(OUTDIR, 'MIN106-RNA001', 'scaler-r3.npz'))
    import_demux(os.path.join(presets_src, 'MIN106-RNA001', 'demux-tetra-r4.hdf5'),
                 os.path.join(OUTDIR, 'MIN106-RNA001', 'demux-tetra-r4.npz'))
    import_preset(os.path.join(presets_src, 'rna-r941.cfg'),
                  os.path.join(OUTDIR, 'rna-r941.yaml'))
    synthesize_kmer_model(
        os.path.join(OUTDIR, 'kmer_models', 'r9.4_180mv_70bps_5mer_RNA',
                     'template_median69pA.model'))


if __name__ == '__main__':
    sys.exit(main())
