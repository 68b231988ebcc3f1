"""End-to-end demultiplexer training workflow.

TPU-native equivalent of the reference's Snakemake DAG
(training/barcodes/Snakefile + workflows/perform_training.py): one
barcoded control run per class is pushed through the production pipeline
with adapter-signal dumping, the dumped windows train the demux network
with the cost-matrix-weighted loss, the held-out split is evaluated into
``evaluation.txt`` (mirroring train_demux_nn.py:209-237's outputs), and
the phred calibration table is derived from held-out errors and embedded
in the checkpoint (compute_score_calibration_table.py's role).

Steps are skipped when their outputs already exist (Snakemake-style
freshness by presence; pass force=True to rebuild), so a failed run
resumes at the failed stage.

    python -m poreplex_tpu.training.workflow \
        --run BC1=/runs/bc1 --run BC2=/runs/bc2 \
        --run BC3=/runs/bc3 --run BC4=/runs/bc4 -o training-out
"""

import argparse
import logging
import os
import sys

import numpy as np

from .train_demux import LABEL_IDS, train

INVENTORY_RELPATH = os.path.join('adapter-dumps', 'inventory.h5')


def prepare_run(inputdir, outdir, log=print, config_overrides=None):
    """Run the production session over one control run with adapter-signal
    dumping enabled; returns the dump inventory path."""
    from ..config import build_config
    from ..pipeline.session import ProcessingSession

    inventory = os.path.join(outdir, INVENTORY_RELPATH)
    if os.path.exists(inventory):
        log('prepare: {} up to date'.format(inventory))
        return inventory

    os.makedirs(outdir, exist_ok=True)
    config = build_config(inputdir, outdir, barcoding=False,
                          dump_adapter_signals=True, quiet=True,
                          **(config_overrides or {}))
    logger = logging.getLogger('poreplex-train-prepare')
    logger.addHandler(logging.NullHandler())
    logger.propagate = False
    if ProcessingSession.run(config, logger) is None:
        raise RuntimeError('prepare failed for ' + inputdir)
    if not os.path.exists(inventory):
        raise RuntimeError('prepare produced no dump inventory for ' +
                           inputdir)
    log('prepare: {} -> {}'.format(inputdir, inventory))
    return inventory


def evaluate(model_path, data, outpath, eval_fraction=0.25, log=print):
    """Held-out evaluation report (accuracy, weighted accuracy by the
    training cost matrix, per-class counts) like the reference's
    ``models/*/evaluation.txt``."""
    import jax.numpy as jnp
    from ..models.demux import DemuxModel
    from .train_demux import DEFAULT_COST_MAT

    windows, labels = data
    n_eval = int(len(windows) * eval_fraction)
    eval_w, eval_l = windows[:n_eval], labels[:n_eval]
    model = DemuxModel(model_path, number_of_decoy_labels=1)
    probs = np.asarray(model._apply(jnp.asarray(eval_w, jnp.float32)))
    pred = probs.argmax(axis=1)

    acc = float((pred == eval_l).mean())
    weights = DEFAULT_COST_MAT[eval_l, pred]
    weighted_acc = float(((pred == eval_l) * weights).sum() / weights.sum())

    lines = ['accuracy\t{:.6f}'.format(acc),
             'weighted_accuracy\t{:.6f}'.format(weighted_acc),
             'n_eval\t{}'.format(len(eval_l))]
    names = {v: k for k, v in LABEL_IDS.items()}
    for label in sorted(set(int(v) for v in eval_l)):
        sel = eval_l == label
        lines.append('class_accuracy\t{}\t{:.6f}\t{}'.format(
            names.get(label, label), float((pred[sel] == label).mean()),
            int(sel.sum())))
    with open(outpath, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    log('evaluate: accuracy {:.4f} (weighted {:.4f}) -> {}'.format(
        acc, weighted_acc, outpath))
    return acc


def run_workflow(runs, outdir, steps=300, seed=0, force=False, log=print,
                 data_parallel=False, config_overrides=None):
    """runs: list of (label_name, input_dir) with label_name one of
    decoy/BC1..BC4. Returns the held-out accuracy."""
    os.makedirs(outdir, exist_ok=True)
    model_path = os.path.join(outdir, 'demux-model.npz')
    eval_path = os.path.join(outdir, 'evaluation.txt')
    if force:
        for path in (model_path, eval_path):
            if os.path.exists(path):
                os.unlink(path)

    inventories = []
    for label_name, inputdir in runs:
        stage_dir = os.path.join(outdir, 'prepare', label_name)
        if force and os.path.exists(
                os.path.join(stage_dir, INVENTORY_RELPATH)):
            os.unlink(os.path.join(stage_dir, INVENTORY_RELPATH))
        inventories.append(
            (prepare_run(inputdir, stage_dir, log=log,
                         config_overrides=config_overrides),
             LABEL_IDS[label_name]))

    from .data import dumps_dataset
    data = dumps_dataset(inventories, rng=np.random.RandomState(seed))
    if len(data[0]) == 0:
        raise RuntimeError('no adapter windows dumped by the prepare stage')

    mesh = None
    if data_parallel:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()

    if os.path.exists(model_path):
        log('train: {} up to date'.format(model_path))
    else:
        train(model_path, steps=steps, seed=seed, data=data, log=log,
              mesh=mesh)

    if os.path.exists(eval_path):
        log('evaluate: {} up to date'.format(eval_path))
        with open(eval_path) as f:
            return float(f.readline().split('\t')[1])
    return evaluate(model_path, data, eval_path, log=log)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--run', action='append', required=True,
                        metavar='LABEL=FAST5_DIR',
                        help='barcoded control run; LABEL one of '
                             'decoy/BC1..BC4; repeatable')
    parser.add_argument('-o', '--output', required=True)
    parser.add_argument('--steps', type=int, default=300)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--force', action='store_true',
                        help='rebuild all stages')
    parser.add_argument('--data-parallel', action='store_true')
    args = parser.parse_args()

    runs = []
    for spec in args.run:
        label, path = spec.split('=', 1)
        if label not in LABEL_IDS:
            parser.error('unknown label ' + label)
        runs.append((label, path))
    run_workflow(runs, args.output, steps=args.steps, seed=args.seed,
                 force=args.force, data_parallel=args.data_parallel)


if __name__ == '__main__':
    sys.exit(main())
