#!/usr/bin/env python3
"""Scaler training: LSTM(48) -> LSTM(48) -> Dense(2) regression of per-read
(scale, shift), with standardized targets and the output-transform metadata
stored in the checkpoint — loadable by models.scaler.ScalerModel.

TPU-first re-design of training/signal-scaling/scripts/learn-scaling.py
(Keras + MirroredStrategy): inference-shared JAX forward, optax adam,
jit-compiled step, Pearson-r/RMSD evaluation like the reference prints.
"""

import argparse
import json
import math
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops import rnn
from .data import scaler_dataset


def init_params(rng_key, hidden=48):
    def lstm_params(key, in_dim, n):
        k1, k2 = jax.random.split(key)
        lim = math.sqrt(6.0 / (in_dim + 4 * n))
        bias = np.zeros(4 * n, np.float32)
        bias[n:2 * n] = 1.0
        return {
            'kernel': jax.random.uniform(k1, (in_dim, 4 * n),
                                         minval=-lim, maxval=lim),
            'recurrent': jax.nn.initializers.orthogonal()(k2, (n, 4 * n)),
            'bias': jnp.asarray(bias),
        }
    keys = jax.random.split(rng_key, 3)
    lim = math.sqrt(6.0 / (hidden + 2))
    return {
        'lstm1': lstm_params(keys[0], 1, hidden),
        'lstm2': lstm_params(keys[1], hidden, hidden),
        'dense': {
            'kernel': jax.random.uniform(keys[2], (hidden, 2),
                                         minval=-lim, maxval=lim),
            'bias': jnp.zeros(2),
        },
    }


def forward(params, heads):
    h = rnn.lstm2_stacked(params['lstm1'], params['lstm2'],
                          heads[..., None])
    return rnn.dense(params['dense'], h)


def make_train_step(optimizer):
    def loss_fn(params, heads, targets_std):
        pred = forward(params, heads)
        return jnp.mean((pred - targets_std) ** 2)

    @jax.jit
    def train_step(params, opt_state, heads, targets_std):
        loss, grads = jax.value_and_grad(loss_fn)(params, heads, targets_std)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step


def save_checkpoint(path, params, transform, input_defs):
    flat = {}
    for name in ('lstm1', 'lstm2'):
        for k in ('kernel', 'recurrent', 'bias'):
            flat['{}/{}'.format(name, k)] = np.asarray(params[name][k])
    flat['dense/kernel'] = np.asarray(params['dense']['kernel'])
    flat['dense/bias'] = np.asarray(params['dense']['bias'])
    flat['meta'] = np.frombuffer(json.dumps({
        'input': input_defs,
        'output_transform': transform,
        'model_version': 'poreplex-tpu-scaler (retrained)',
    }).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def train(output_path, steps=400, batch_size=32, n_samples=2000, seed=0,
          learning_rate=1e-3, eval_fraction=0.2, log=print, mesh=None,
          data=None):
    """mesh: optional jax.sharding.Mesh for data-parallel training (batch
    sharded over the 1-D 'batch' axis, params replicated — the pjit DP
    layout of SURVEY.md §2.3). data: optional (heads [N, 2000], targets
    [N, 2]) override — the scaler DAG (scaler_workflow.py) passes its
    extracted + redispersed arrays here; default is the synthetic set."""
    rng = np.random.RandomState(seed)
    heads, targets = (data if data is not None
                      else scaler_dataset(n_samples, rng))
    heads = np.asarray(heads, np.float32)
    targets = np.asarray(targets, np.float32)
    n_samples = len(heads)
    n_eval = int(n_samples * eval_fraction)
    tr_h, tr_t = heads[n_eval:], targets[n_eval:]
    ev_h, ev_t = heads[:n_eval], targets[:n_eval]

    # standardize targets; the stats become the stored output transform
    # (poreplex/signal_loader.py:58-60 applies std * pred + mean)
    mean = tr_t.mean(axis=0)
    std = tr_t.std(axis=0)
    transform = {'scale_mean': float(mean[0]), 'scale_std': float(std[0]),
                 'shift_mean': float(mean[1]), 'shift_std': float(std[1])}
    tr_std = (tr_t - mean) / std

    params = init_params(jax.random.PRNGKey(seed))
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    train_step = make_train_step(optimizer)

    put_batch = jnp.asarray
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated_sharding
        bs = batch_sharding(mesh)
        put_batch = lambda x: jax.device_put(jnp.asarray(x), bs)
        repl = replicated_sharding(mesh)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        nd = mesh.devices.size
        batch_size = max(nd, batch_size - batch_size % nd)

    for step in range(steps):
        idx = rng.randint(0, len(tr_h), batch_size)
        params, opt_state, loss = train_step(
            params, opt_state, put_batch(tr_h[idx]),
            put_batch(tr_std[idx]))
        if step % 50 == 0 or step == steps - 1:
            log('step {:4d} loss {:.4f}'.format(step, float(loss)))

    pred = np.asarray(forward(params, jnp.asarray(ev_h))) * std + mean
    stats = {}
    for i, name in enumerate(('scale', 'shift')):
        r = np.corrcoef(pred[:, i], ev_t[:, i])[0, 1]
        rmsd = float(np.sqrt(np.mean((pred[:, i] - ev_t[:, i]) ** 2)))
        stats[name] = {'pearson_r': float(r), 'rmsd': rmsd}
        log('{}: pearson r {:.4f}  rmsd {:.4f}'.format(name, r, rmsd))

    save_checkpoint(output_path, params, transform,
                    {'dtype': 'float32', 'stride': 15, 'length': 30000,
                     'min_length': 9000})
    log('checkpoint -> {}'.format(output_path))
    return stats


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('-o', '--output', required=True)
    parser.add_argument('--steps', type=int, default=400)
    parser.add_argument('--batch-size', type=int, default=32)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--data-parallel', default=False,
                        action='store_true',
                        help='shard training batches over all local devices')
    args = parser.parse_args()
    mesh = None
    if args.data_parallel:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()
    train(args.output, steps=args.steps, batch_size=args.batch_size,
          seed=args.seed, mesh=mesh)


if __name__ == '__main__':
    sys.exit(main())
