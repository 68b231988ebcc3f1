#!/usr/bin/env python3
"""Generate golden outputs for the neural models using TensorFlow as the
independent oracle (the reference runs these nets through Keras/TF:
poreplex/signal_loader.py:96, poreplex/barcoding.py:106).

The goldens are committed to tests/golden/ so the test suite never needs
TensorFlow at run time. Regenerate with:  python tools/make_goldens.py
"""

import os

os.environ.setdefault('CUDA_VISIBLE_DEVICES', '-1')
os.environ.setdefault('TF_ENABLE_ONEDNN_OPTS', '0')
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESETS = os.path.join(REPO, 'poreplex_tpu', 'presets', 'MIN106-RNA001')
GOLDEN_DIR = os.path.join(REPO, 'tests', 'golden')


def build_scaler_tf(d):
    import tensorflow as tf
    m = tf.keras.Sequential([
        tf.keras.layers.Input((2000, 1)),
        tf.keras.layers.LSTM(48, return_sequences=True),
        tf.keras.layers.LSTM(48),
        tf.keras.layers.Dense(2),
    ])
    m.layers[0].set_weights([d['lstm1/kernel'], d['lstm1/recurrent'],
                             d['lstm1/bias']])
    m.layers[1].set_weights([d['lstm2/kernel'], d['lstm2/recurrent'],
                             d['lstm2/bias']])
    m.layers[2].set_weights([d['dense/kernel'], d['dense/bias']])
    return m


def build_demux_tf(d):
    import tensorflow as tf
    m = tf.keras.Sequential([
        tf.keras.layers.Input((300, 1)),
        tf.keras.layers.Bidirectional(
            tf.keras.layers.LSTM(48, return_sequences=True),
            merge_mode='concat'),
        tf.keras.layers.LSTM(64),
        tf.keras.layers.Dense(5, activation='softmax'),
    ])
    m.layers[0].forward_layer.set_weights(
        [d['bilstm_fwd/kernel'], d['bilstm_fwd/recurrent'], d['bilstm_fwd/bias']])
    m.layers[0].backward_layer.set_weights(
        [d['bilstm_bwd/kernel'], d['bilstm_bwd/recurrent'], d['bilstm_bwd/bias']])
    m.layers[1].set_weights([d['lstm2/kernel'], d['lstm2/recurrent'],
                             d['lstm2/bias']])
    m.layers[2].set_weights([d['dense/kernel'], d['dense/bias']])
    return m


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    rng = np.random.RandomState(20180917)

    scaler_w = np.load(os.path.join(PRESETS, 'scaler-r3.npz'))
    demux_w = np.load(os.path.join(PRESETS, 'demux-tetra-r4.npz'))

    # Scaler: pooled pA-scale inputs (values ~N(90, 12) like real DRS signal)
    scaler_in = rng.normal(90, 12, (16, 2000, 1)).astype(np.float32)
    # A couple with leading zero-padding like short reads get
    scaler_in[0, :700] = 0.0
    scaler_in[1, :1400] = 0.0
    scaler_out = build_scaler_tf(scaler_w).predict(scaler_in, verbose=0)

    # Demux: med/MAD-normalized windows (roughly standard normal), plus
    # left-padded -1000 filler rows like short adapters get
    demux_in = rng.normal(0, 1.2, (16, 300, 1)).astype(np.float32)
    demux_in[0, :40] = -1000.0
    demux_in[1, :10] = -1000.0
    demux_out = build_demux_tf(demux_w).predict(demux_in, verbose=0)

    np.savez_compressed(
        os.path.join(GOLDEN_DIR, 'nn_goldens.npz'),
        scaler_in=scaler_in[:, :, 0], scaler_out=scaler_out,
        demux_in=demux_in[:, :, 0], demux_out=demux_out)
    print('wrote', os.path.join(GOLDEN_DIR, 'nn_goldens.npz'))


if __name__ == '__main__':
    main()
