"""Training pipeline smoke/parity tests (short runs on synthetic data)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

# full-session / workflow tests take minutes; `-m "not slow"` skips them
pytestmark = pytest.mark.slow

from poreplex_tpu.training import losses
from poreplex_tpu.training.train_demux import (
    train as train_demux, compute_calibration_table)
from poreplex_tpu.training.train_scaler import train as train_scaler
from poreplex_tpu.models.demux import DemuxModel
from poreplex_tpu.models.scaler import ScalerModel


def test_weighted_loss_matches_reference_semantics():
    """sample weight = cost_mat[argmax true, argmax pred]
    (poreplex/keras_wrap.py:63-79)."""
    cost = jnp.asarray(np.array([[1., 2.], [3., 4.]], np.float32))
    y_true = jnp.asarray(np.array([[1., 0.], [0., 1.]], np.float32))
    y_pred = jnp.asarray(np.array([[0.2, 0.8], [0.1, 0.9]], np.float32))
    w = np.asarray(losses.sample_weights(y_true, y_pred, cost))
    np.testing.assert_allclose(w, [2.0, 4.0])
    acc = float(losses.weighted_categorical_accuracy(y_true, y_pred, cost))
    # only sample 2 correct, weighted: 4 / (2 + 4)
    assert abs(acc - 4.0 / 6.0) < 1e-6


def test_calibration_table_monotone():
    rng = np.random.RandomState(0)
    scores = rng.uniform(0.2, 1.0, 5000)
    correct = rng.uniform(size=5000) < scores       # higher score, more correct
    table = compute_calibration_table(scores, correct)
    assert len(table) == 29
    assert (np.diff(table) >= 0).all()
    assert table[0] == 0.0


def test_calibration_table_small_data_fallback():
    rng = np.random.RandomState(3)
    scores = rng.uniform(0.2, 1.0, 200)    # below the smallest window size
    correct = rng.uniform(size=200) < scores
    table = compute_calibration_table(scores, correct)
    assert len(table) == 29
    assert (np.diff(table) >= 0).all()


def test_calibration_table_inverts_known_error_curve():
    """Multiscale procedure pinned against the reference script's math
    (training/barcodes/scripts/compute_score_calibration_table.py:122-158):

    * phreds in the extrapolated range (phred <= -10*log10(score_lo), the
      reference's own boundary formula) must come off the linear fit
      through the lowest EXTRAPOLATION_SUPPORT_POINTS windows;
    * phreds whose target error rate falls inside the sampled error range
      must invert error(score) = 1 - score to score = 1 - 10^(-phred/10)
      (the loess stand-in's accuracy guarantee);
    * every populated threshold must meet the phred's error budget.

    Scores are concentrated near 1.0 like real softmax outputs (the
    committed reference table maps phred 28 <-> score 0.99901)."""
    from poreplex_tpu.training.calibration import (
        build_calibration_table, build_multiscale_error_table,
        EXTRAPOLATION_SUPPORT_POINTS)
    rng = np.random.RandomState(7)
    n = 60000
    scores = rng.power(15, n)
    correct = rng.uniform(size=n) < scores
    table = build_calibration_table(scores, correct)

    assert len(table) == 29
    assert (np.diff(table) >= 0).all()
    assert table[0] == 0.0

    order = np.argsort(-scores)
    errortbl = build_multiscale_error_table(scores[order], correct[order])
    score_lo = errortbl[-1, 1]
    err_hi = errortbl[-1, 0]        # error rate at the bottom of the range
    err_lo = errortbl[0, 0]         # error rate at the top of the range
    extrapol_phred_max = int(-np.log10(score_lo) * 10)
    supports = errortbl[-EXTRAPOLATION_SUPPORT_POINTS:]
    a, b = np.polyfit(supports[:, 1], supports[:, 0], 1)

    interpolated_checked = 0
    for phred in range(1, 29):
        if table[phred] >= 1.0:     # unattainable at this data size
            continue
        target = 10 ** (-phred / 10)
        if phred <= extrapol_phred_max:
            # reference extrapolation: invert error ~ a*score + b
            expected = (target - b) / a
            assert abs(table[phred] - expected) < 1e-9, (phred, table[phred])
        elif err_lo <= target <= err_hi:
            # root exists in the sampled curve: must invert 1 - score
            expected = 1.0 - target
            assert abs(table[phred] - expected) < 0.05, (phred, table[phred])
            interpolated_checked += 1
        sel = scores >= table[phred]
        if sel.sum() >= 500:
            err = (~correct[sel]).mean()
            assert err <= 1.6 * target, (phred, err)
    assert interpolated_checked >= 10   # the sampled range covers the bulk


def test_train_demux_and_load(tmp_path):
    path = str(tmp_path / 'demux.npz')
    acc = train_demux(path, steps=60, n_per_class=60, log=lambda *a: None)
    assert acc > 0.4          # must beat the 5-class chance level
    model = DemuxModel(path)
    labels, scores = model.predict(np.zeros((2, 300), np.float32))
    assert labels.shape == (2,)
    assert len(model.calibration_table) == 29


def test_train_scaler_and_load(tmp_path):
    path = str(tmp_path / 'scaler.npz')
    stats = train_scaler(path, steps=80, n_samples=300,
                         log=lambda *a: None)
    assert stats['scale']['pearson_r'] > 0.2
    model = ScalerModel(path)
    scaling, qc = model.predict(np.zeros((2, model.pooled_length),
                                         np.float32))
    assert scaling.shape == (2, 2)


def _write_adapter_inventory(path, signals):
    """Write {read_id: signal} in the dump-inventory layout
    (adapter/<read_id[:3]>/<read_id>)."""
    import h5py
    with h5py.File(path, 'w') as h5:
        for read_id, signal in signals.items():
            h5.create_dataset('adapter/{}/{}'.format(read_id[:3], read_id),
                              data=np.asarray(signal, np.float32))


def test_load_adapter_windows_trim_and_pad(tmp_path):
    """Window prep must match the reference's training data prep
    (prepare_training_data.py:69-87): long signals -> normalize(last T);
    short signals -> pad(normalize(sig)) with -1000 on the left."""
    from poreplex_tpu.training.data import (load_adapter_windows,
                                            normalize_signal)
    rng = np.random.RandomState(0)
    long_sig = rng.normal(80, 5, 450).astype(np.float32)
    short_sig = rng.normal(80, 5, 120).astype(np.float32)
    inv = str(tmp_path / 'inventory.h5')
    _write_adapter_inventory(inv, {'aaa-long': long_sig,
                                   'bbb-short': short_sig})
    windows, ids = load_adapter_windows(inv, trim_length=300)
    by_id = dict(zip(ids, windows))
    np.testing.assert_allclose(by_id['aaa-long'],
                               normalize_signal(long_sig[-300:]), rtol=1e-5)
    np.testing.assert_array_equal(by_id['bbb-short'][:180], -1000.0)
    np.testing.assert_allclose(by_id['bbb-short'][180:],
                               normalize_signal(short_sig), rtol=1e-5)


def test_train_demux_from_dumps(tmp_path):
    """End-to-end L9 flow: barcoded control dumps -> dataset -> training ->
    loadable model (the reference's Snakemake pipeline role)."""
    from poreplex_tpu.training.data import (dumps_dataset,
                                            make_adapter_window)
    rng = np.random.RandomState(1)
    runs = []
    for label in range(5):      # decoy + BC1..BC4
        sigs = {}
        for i in range(24):
            # un-normalized adapter-region signal in pA space
            w = make_adapter_window(rng, label - 1) * 5.0 + 80.0
            sigs['{:03x}-read{}-{}'.format(label * 256 + i, label, i)] = w
        inv = str(tmp_path / 'inv{}.h5'.format(label))
        _write_adapter_inventory(inv, sigs)
        runs.append((inv, label))

    windows, labels = dumps_dataset(runs, rng=rng)
    assert windows.shape == (120, 300)
    assert set(labels) == set(range(5))

    path = str(tmp_path / 'demux-dumps.npz')
    acc = train_demux(path, steps=40, data=(windows, labels),
                      log=lambda *a: None)
    model = DemuxModel(path)
    out_labels, scores = model.predict(windows[:4])
    assert out_labels.shape == (4,)


def test_train_demux_data_parallel_mesh(tmp_path, cpu_devices):
    """DP training on the virtual 8-device mesh must run and produce a
    loadable checkpoint (batch sharded, params replicated)."""
    from poreplex_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(cpu_devices[:8])
    path = str(tmp_path / 'demux-dp.npz')
    train_demux(path, steps=10, n_per_class=30, batch_size=16, mesh=mesh,
                log=lambda *a: None)
    model = DemuxModel(path)
    labels, _ = model.predict(np.zeros((2, 300), np.float32))
    assert labels.shape == (2,)


def test_training_workflow_end_to_end(tmp_path):
    """The full prepare -> train -> evaluate DAG (the reference's
    training/barcodes/Snakefile role): barcoded control FAST5 runs go
    through the production session with adapter dumping, the dumps train
    the demux network, and evaluation.txt reports held-out accuracy well
    above chance on the signature-separable barcodes."""
    from poreplex_tpu.simulate import make_fixture_dir
    from poreplex_tpu.training.workflow import run_workflow

    runs = []
    for bc in range(2):                     # two classes keep the test fast
        rundir = str(tmp_path / 'run-bc{}'.format(bc + 1))
        make_fixture_dir(rundir, n_reads=10, seed=50 + bc, barcode=bc,
                         transcript_len=3000, polya_len=1200,
                         adapter_len=5200)
        runs.append(('BC{}'.format(bc + 1), rundir))
    outdir = str(tmp_path / 'training-out')

    logs = []
    acc = run_workflow(runs, outdir, steps=120, seed=3, log=logs.append)

    assert os.path.exists(os.path.join(outdir, 'demux-model.npz'))
    evalpath = os.path.join(outdir, 'evaluation.txt')
    assert os.path.exists(evalpath)
    with open(evalpath) as f:
        first = f.readline().split('\t')
    assert first[0] == 'accuracy'
    assert acc == float(first[1])
    assert acc >= 0.7, 'barcode signatures should separate: ' + str(logs)

    # the trained checkpoint must load through the production model class
    from poreplex_tpu.models.demux import DemuxModel
    model = DemuxModel(os.path.join(outdir, 'demux-model.npz'))
    assert model.calibration_table.ndim == 1

    # DAG freshness: a second invocation reuses every stage
    logs2 = []
    run_workflow(runs, outdir, steps=120, seed=3, log=logs2.append)
    assert all('up to date' in line for line in logs2)


def test_contamination_filter_drops_cross_aligned_reads(tmp_path):
    """The alignment-based contamination filter (role of the reference's
    training/barcodes/workflows/sequence_alignments.py + process_scores):
    reads whose best alignment lands on ANOTHER barcode's transcriptome
    must be dropped from that run's training set, and the per-run
    alignment-scores tables must be written."""
    from poreplex_tpu.simulate import make_fixture_dir
    from poreplex_tpu.training.workflow import (run_workflow,
                                                _read_fastq_sequences)

    runs = []
    for bc in range(2):
        rundir = str(tmp_path / 'run-bc{}'.format(bc + 1))
        make_fixture_dir(rundir, n_reads=8, seed=70 + bc, barcode=bc,
                         transcript_len=3000, polya_len=1200,
                         adapter_len=5200)
        runs.append(('BC{}'.format(bc + 1), rundir))
    outdir = str(tmp_path / 'training-out')

    # fake per-reference aligners: every read maps to its own run's
    # reference except one designated contaminant read per run, which
    # maps (better) to the OTHER reference
    contaminants = set()

    class Hit:
        def __init__(self, m):
            self.cigar_str = '{}M'.format(m)

    class FakeRefAligner:
        def __init__(self, reference):
            self.label = os.path.basename(reference).split('.')[0]

        def map(self, seq):
            own = seq_home[seq]
            if seq in contaminated_seqs:
                # contaminant: strong hit on the OTHER reference
                yield Hit(900 if self.label != own else 100)
            elif self.label == own:
                yield Hit(800)

    refs = {label: os.path.join(str(tmp_path), label + '.fa')
            for label, _ in runs}

    # run prepare once (no filter) to learn the sequences, then mark one
    # read per run as a contaminant and run the filtered workflow
    seq_home = {}
    contaminated_seqs = set()
    acc = run_workflow(runs, outdir, steps=60, seed=3,
                       log=lambda *a: None)
    for label, _ in runs:
        pdir = os.path.join(outdir, 'prepare', label)
        pairs = list(_read_fastq_sequences(pdir))
        assert pairs, 'prepare produced no FASTQ for ' + label
        for read_id, seq in pairs:
            seq_home[seq] = label
        contaminants.add(pairs[0][0])
        contaminated_seqs.add(pairs[0][1])

    logs = []
    run_workflow(runs, outdir, steps=60, seed=3, force=True,
                 references=refs, make_aligner=FakeRefAligner,
                 log=logs.append)

    for label, _ in runs:
        table = os.path.join(outdir, 'tables',
                             'alignment-scores-{}.tsv'.format(label))
        assert os.path.exists(table)
        with open(table) as f:
            header = f.readline().rstrip('\n').split('\t')
            rows = {r.split('\t')[0]: r.rstrip('\n').split('\t')
                    for r in f}
        verdict = dict(zip(header, [None] * len(header)))
        dropped = {rid for rid, row in rows.items() if row[-1] == 'drop'}
        kept = {rid for rid, row in rows.items() if row[-1] == 'keep'}
        assert dropped == {rid for rid in contaminants if rid in rows}
        assert len(kept) == len(rows) - len(dropped)
    assert any('filter:' in line for line in logs)


def test_calculate_scaling_params_recovers_affine():
    """Theil-Sen target derivation (extract-signals.py semantics): event
    means generated as the inverse affine of the kmer model levels must
    regress back to the planted (scale, shift)."""
    import pandas as pd
    from poreplex_tpu.config import load_preset
    from poreplex_tpu.training.scaler_workflow import calculate_scaling_params

    kmertbl = pd.read_csv(load_preset()['kmer_model'], header=0,
                          index_col=0, sep='\t')
    levels = kmertbl['level_mean'].to_dict()
    kmers = list(levels)[:120]

    rng = np.random.RandomState(4)
    scale, shift = 1.07, -4.2          # level = scale * mean + shift
    events = {
        'move': np.ones(len(kmers), np.int64),
        'model_state': np.asarray(kmers, dtype='S5'),
        'mean': np.asarray([(levels[k] - shift) / scale for k in kmers]) +
        rng.normal(0, 0.05, len(kmers)),
    }
    got = calculate_scaling_params(events, levels)
    assert got is not None
    assert abs(got[0] - scale) < 0.02
    assert abs(got[1] - shift) < 1.5


def test_scaler_workflow_end_to_end(tmp_path):
    """The scaler-training DAG (role of training/signal-scaling/
    Snakefile): extract (events + signal heads from basecalled FAST5
    runs) -> purify -> split/redisperse -> train -> evaluate, with
    freshness skipping on the second invocation."""
    import h5py
    import pandas as pd
    from poreplex_tpu.config import load_preset
    from poreplex_tpu.simulate import make_fixture_dir
    from poreplex_tpu.training import scaler_workflow

    preset = load_preset()
    kmertbl = pd.read_csv(preset['kmer_model'], header=0, index_col=0,
                          sep='\t')
    levels = kmertbl['level_mean'].to_dict()
    rng = np.random.RandomState(9)

    runs = []
    for r in range(2):
        rundir = str(tmp_path / 'run{}'.format(r))
        make_fixture_dir(rundir, n_reads=10, seed=90 + r,
                         transcript_len=3000, polya_len=1200,
                         adapter_len=5200)
        # rewrite event means as a per-read affine of the kmer levels so
        # the Theil-Sen targets are well-defined
        for fn in sorted(os.listdir(rundir)):
            if not fn.endswith('.fast5'):
                continue
            with h5py.File(os.path.join(rundir, fn), 'r+') as f5:
                for node in f5:
                    if not node.startswith('read_'):
                        continue
                    scale = rng.uniform(0.85, 1.15)
                    shift = rng.uniform(-8, 8)
                    for dsname in ['{}/Analyses/Basecall_1D_000/'
                                   'BaseCalled_template/Events'.format(node)]:
                        ev = f5[dsname][()]
                        states = [s.decode() if isinstance(s, bytes)
                                  else str(s) for s in ev['model_state']]
                        lv = np.asarray([levels.get(s, 92.0)
                                         for s in states])
                        ev['mean'] = ((lv - shift) / scale +
                                      rng.normal(0, 0.05, len(lv)))
                        del f5[dsname]
                        f5.create_dataset(dsname, data=ev)
        runs.append(rundir)

    outdir = str(tmp_path / 'scaler-out')
    logs = []
    lines = scaler_workflow.run_workflow(runs, outdir,
                                         preset['kmer_model'],
                                         steps=60, log=logs.append)
    assert os.path.exists(os.path.join(outdir, 'scaler-model.npz'))
    assert os.path.exists(os.path.join(outdir, 'evaluation.txt'))
    assert any(l.startswith('pearson_r\tscale') for l in lines)
    assert any(l.startswith('rmsd\tshift') for l in lines)

    # checkpoint loads through the production model class
    from poreplex_tpu.models.scaler import ScalerModel
    model = ScalerModel(os.path.join(outdir, 'scaler-model.npz'), 0.001)
    pred, qc = model.predict(np.zeros((2, model.pooled_length), np.float32))
    assert pred.shape == (2, 2)

    logs2 = []
    scaler_workflow.run_workflow(runs, outdir, preset['kmer_model'],
                                 steps=60, log=logs2.append)
    assert all('up to date' in line for line in logs2)
