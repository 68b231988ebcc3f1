#!/usr/bin/env python3
"""Demultiplexer training: BiLSTM(48) -> LSTM(64) -> Dense(5, softmax) with
the cost-matrix-weighted crossentropy, phred calibration table computation,
and an npz checkpoint loadable by models.demux.DemuxModel.

TPU-first re-design of training/barcodes/scripts/train_demux_nn.py
(Keras + MirroredStrategy): the forward pass is the same JAX code used at
inference (ops/rnn.py), the train step is jit-compiled with optax, and data
parallelism shards the batch over a 1-D mesh.
"""

import argparse
import math
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops import rnn
from . import losses
from .calibration import compute_calibration_table  # noqa: F401 (re-export)
from .data import demux_dataset

NUM_CLASSES = 5
DEFAULT_COST_MAT = np.array(
    [[1.0] * 5] + [[1.0, 2.0, 2.0, 2.0, 2.0]] * 4, np.float32)


def init_params(rng_key, hidden1=48, hidden2=64):
    def lstm_params(key, in_dim, hidden):
        k1, k2 = jax.random.split(key)
        lim = math.sqrt(6.0 / (in_dim + 4 * hidden))
        bias = np.zeros(4 * hidden, np.float32)
        bias[hidden:2 * hidden] = 1.0        # unit forget bias
        return {
            'kernel': jax.random.uniform(k1, (in_dim, 4 * hidden),
                                         minval=-lim, maxval=lim),
            'recurrent': jax.nn.initializers.orthogonal()(
                k2, (hidden, 4 * hidden)),
            'bias': jnp.asarray(bias),
        }
    keys = jax.random.split(rng_key, 5)
    lim = math.sqrt(6.0 / (hidden2 + NUM_CLASSES))
    return {
        'bilstm_fwd': lstm_params(keys[0], 1, hidden1),
        'bilstm_bwd': lstm_params(keys[1], 1, hidden1),
        'lstm2': lstm_params(keys[2], 2 * hidden1, hidden2),
        'dense': {
            'kernel': jax.random.uniform(keys[3],
                                         (hidden2, NUM_CLASSES),
                                         minval=-lim, maxval=lim),
            'bias': jnp.zeros(NUM_CLASSES),
        },
    }


def forward(params, windows, noise_key=None, noise_stddev=0.05):
    """Same network as inference (models/demux.py), plus train-time
    GaussianNoise like the reference model's first layer."""
    x = windows[..., None]
    if noise_key is not None:
        x = x + noise_stddev * jax.random.normal(noise_key, x.shape)
    h = rnn.bidirectional_lstm(params['bilstm_fwd'], params['bilstm_bwd'], x)
    h = rnn.lstm(params['lstm2'], h, return_sequences=False)
    return jax.nn.softmax(rnn.dense(params['dense'], h), axis=-1)


def make_train_step(optimizer, cost_mat):
    def loss_fn(params, windows, labels, key):
        probs = forward(params, windows, noise_key=key)
        onehot = jax.nn.one_hot(labels, NUM_CLASSES)
        return losses.weighted_categorical_crossentropy(
            onehot, probs, cost_mat)

    @jax.jit
    def train_step(params, opt_state, windows, labels, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, windows, labels,
                                                  key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step


def save_checkpoint(path, params, calibration, cost_mat):
    flat = {}
    for name in ('bilstm_fwd', 'bilstm_bwd', 'lstm2'):
        for k in ('kernel', 'recurrent', 'bias'):
            flat['{}/{}'.format(name, k)] = np.asarray(params[name][k])
    flat['dense/kernel'] = np.asarray(params['dense']['kernel'])
    flat['dense/bias'] = np.asarray(params['dense']['bias'])
    flat['calibration'] = np.asarray(calibration, np.float64)
    flat['loss_weights'] = np.asarray(cost_mat, np.float32)
    np.savez(path, **flat)


def train(output_path, steps=300, batch_size=64, n_per_class=400, seed=0,
          learning_rate=1e-3, eval_fraction=0.25, log=print, data=None,
          mesh=None):
    """data: optional (windows, labels) — e.g. from data.dumps_dataset over
    adapter-signal dump inventories of barcoded control runs; defaults to
    the synthetic set. mesh: optional jax.sharding.Mesh for data-parallel
    training (batch sharded, params replicated; XLA inserts the gradient
    all-reduce)."""
    rng = np.random.RandomState(seed)
    windows, labels = data if data is not None else \
        demux_dataset(n_per_class, rng)
    n_eval = int(len(windows) * eval_fraction)
    train_w, train_l = windows[n_eval:], labels[n_eval:]
    eval_w, eval_l = windows[:n_eval], labels[:n_eval]

    cost_mat = jnp.asarray(DEFAULT_COST_MAT)
    params = init_params(jax.random.PRNGKey(seed))
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    train_step = make_train_step(optimizer, cost_mat)

    put_batch = jnp.asarray
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated_sharding
        bs = batch_sharding(mesh)
        put_batch = lambda x: jax.device_put(jnp.asarray(x), bs)
        repl = replicated_sharding(mesh)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        # keep the batch divisible by the mesh so shards are even
        nd = mesh.devices.size
        batch_size = max(nd, batch_size - batch_size % nd)

    key = jax.random.PRNGKey(seed + 1)
    for step in range(steps):
        idx = rng.randint(0, len(train_w), batch_size)
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(
            params, opt_state, put_batch(train_w[idx]),
            put_batch(train_l[idx]), sub)
        if step % 50 == 0 or step == steps - 1:
            log('step {:4d} loss {:.4f}'.format(step, float(loss)))

    probs = np.asarray(forward(params, jnp.asarray(eval_w)))
    pred = probs.argmax(axis=1)
    scores = probs.max(axis=1)
    acc = float((pred == eval_l).mean())
    # calibration uses barcode-vs-barcode errors only (decoys excluded,
    # reference: compute_score_calibration_table.py:63-66)
    mask = (eval_l > 0) & (pred > 0)
    calibration = compute_calibration_table(scores[mask],
                                            (pred == eval_l)[mask])
    save_checkpoint(output_path, params, calibration, DEFAULT_COST_MAT)
    log('eval accuracy {:.4f}; checkpoint -> {}'.format(acc, output_path))
    return acc


LABEL_IDS = {'decoy': 0, 'BC1': 1, 'BC2': 2, 'BC3': 3, 'BC4': 4}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('-o', '--output', required=True)
    parser.add_argument('--steps', type=int, default=300)
    parser.add_argument('--batch-size', type=int, default=64)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--dumps', action='append', default=[],
                        metavar='LABEL=INVENTORY_H5',
                        help='adapter-signal dump inventory of a barcoded '
                             'control run (--dump-adapter-signals output); '
                             'LABEL one of decoy/BC1..BC4; repeatable — '
                             'when given, trains on the dumps instead of '
                             'synthetic data')
    parser.add_argument('--data-parallel', default=False,
                        action='store_true',
                        help='shard training batches over all local devices')
    args = parser.parse_args()

    data = None
    if args.dumps:
        from .data import dumps_dataset
        runs = []
        for spec in args.dumps:
            label, path = spec.split('=', 1)
            runs.append((path, LABEL_IDS[label]))
        data = dumps_dataset(runs, rng=np.random.RandomState(args.seed))

    mesh = None
    if args.data_parallel:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()

    train(args.output, steps=args.steps, batch_size=args.batch_size,
          seed=args.seed, data=data, mesh=mesh)


if __name__ == '__main__':
    sys.exit(main())
