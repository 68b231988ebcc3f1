"""LSTM kernel parity vs TensorFlow goldens.

The goldens in tests/golden/nn_goldens.npz were produced by running the
converted reference weights through tf.keras (tools/make_goldens.py), making
TF the independent oracle for the reference's NN forward passes
(poreplex/signal_loader.py:96-97, poreplex/barcoding.py:106-107).
"""

import numpy as np
import jax.numpy as jnp

from poreplex_tpu.ops import rnn
from poreplex_tpu.models.scaler import ScalerModel
from poreplex_tpu.models.demux import DemuxModel


def load_params(path, names):
    data = np.load(path)
    return {n: {k: jnp.asarray(data[f'{n}/{k}'])
                for k in ('kernel', 'recurrent', 'bias')} for n in names}, data


def test_scaler_forward_matches_tf(nn_goldens, scaler_model_path):
    params, data = load_params(scaler_model_path, ('lstm1', 'lstm2'))
    x = jnp.asarray(nn_goldens['scaler_in'])[..., None]
    h = rnn.lstm(params['lstm1'], x, return_sequences=True)
    h = rnn.lstm(params['lstm2'], h, return_sequences=False)
    pred = rnn.dense({'kernel': jnp.asarray(data['dense/kernel']),
                      'bias': jnp.asarray(data['dense/bias'])}, h)
    np.testing.assert_allclose(np.asarray(pred), nn_goldens['scaler_out'],
                               atol=5e-5)


def test_demux_forward_matches_tf(nn_goldens, demux_model_path):
    model = DemuxModel(demux_model_path)
    probs = np.asarray(model._apply(jnp.asarray(nn_goldens['demux_in'])))
    np.testing.assert_allclose(probs, nn_goldens['demux_out'], atol=5e-5)


def test_scaler_model_transform_and_qc(scaler_model_path):
    model = ScalerModel(scaler_model_path)
    assert model.input_length == 30000
    assert model.input_stride == 15
    assert model.min_length == 9000
    rng = np.random.RandomState(0)
    x = rng.normal(90, 12, (4, model.pooled_length)).astype(np.float32)
    scaling, qc = model.predict(x)
    assert scaling.shape == (4, 2)
    assert qc.shape == (4,)
    # transform must be affine in the raw prediction:
    # scale = scale_std * p + scale_mean (poreplex/signal_loader.py:59-60, 98-99)
    assert np.isfinite(scaling).all()


def test_demux_calibration_lookup(demux_model_path):
    model = DemuxModel(demux_model_path)
    # bisect semantics from poreplex/barcoding.py:72-75
    assert model.lookup_calibrated_phred_score(0.0) == 0
    assert model.lookup_calibrated_phred_score(-1.0) == 0
    assert model.lookup_calibrated_phred_score(1.0) == len(model.calibration_table)
    mid = float(model.calibration_table[10])
    assert model.lookup_calibrated_phred_score(mid) == 11  # bisect_right
    assert model.lookup_calibrated_phred_score(mid - 1e-9) == 10
    # threshold for default quality filter 18
    assert model.score_threshold(18) == model.calibration_table[18]


def test_fused_scaler_stack_matches_layerwise(nn_goldens, scaler_model_path):
    """lstm2_stacked (single fused scan) must equal the two-scan layerwise
    path and therefore the TF golden."""
    params, data = load_params(scaler_model_path, ('lstm1', 'lstm2'))
    x = jnp.asarray(nn_goldens['scaler_in'])[..., None]
    h = rnn.lstm2_stacked(params['lstm1'], params['lstm2'], x)
    pred = rnn.dense({'kernel': jnp.asarray(data['dense/kernel']),
                      'bias': jnp.asarray(data['dense/bias'])}, h)
    np.testing.assert_allclose(np.asarray(pred), nn_goldens['scaler_out'],
                               atol=5e-5)


def test_lstm_masking_independence():
    """Padding frames must influence the padded read only, not neighbors."""
    rng = np.random.RandomState(1)
    params = {
        'kernel': jnp.asarray(rng.normal(0, 0.4, (1, 32)).astype(np.float32)),
        'recurrent': jnp.asarray(rng.normal(0, 0.3, (8, 32)).astype(np.float32)),
        'bias': jnp.asarray(np.zeros(32, np.float32)),
    }
    x1 = rng.normal(0, 1, (2, 16, 1)).astype(np.float32)
    x2 = x1.copy()
    x2[1] = rng.normal(0, 1, (16, 1))
    out1 = np.asarray(rnn.lstm(params, jnp.asarray(x1)))
    out2 = np.asarray(rnn.lstm(params, jnp.asarray(x2)))
    np.testing.assert_array_equal(out1[0], out2[0])


def test_pallas_lstm_kernels_match_xla():
    """The Pallas fused-recurrence kernels (interpret mode on CPU) must be
    bit-identical to the lax.scan formulations at unroll=1."""
    from poreplex_tpu.ops import pallas_rnn
    rng = np.random.RandomState(7)

    def params(i, h):
        return {
            'kernel': jnp.asarray(
                rng.normal(0, 0.3, (i, 4 * h)).astype(np.float32)),
            'recurrent': jnp.asarray(
                rng.normal(0, 0.3, (h, 4 * h)).astype(np.float32)),
            'bias': jnp.asarray(
                rng.normal(0, 0.1, (4 * h,)).astype(np.float32)),
        }

    # the kernels' exp-form tanh differs from expm1-form by ~1ulp; both
    # are ~3 orders tighter than the XLA tanh the goldens tolerate
    B, T = 4, 100
    xs = jnp.asarray(rng.normal(0, 1, (B, T, 1)).astype(np.float32))
    p1, p2 = params(1, 48), params(48, 48)
    a = rnn.lstm2_stacked(p1, p2, xs, unroll=1)
    b = pallas_rnn.lstm2_stacked_pallas(p1, p2, xs, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    pf, pb = params(1, 48), params(1, 48)
    a = rnn.bidirectional_lstm(pf, pb, xs, unroll=1)
    b = pallas_rnn.bidirectional_lstm_pallas(pf, pb, xs, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    p3 = params(96, 64)
    xs2 = jnp.asarray(rng.normal(0, 1, (B, T, 96)).astype(np.float32))
    a = rnn.lstm(p3, xs2, return_sequences=False, unroll=1)
    b = pallas_rnn.lstm_last_pallas(p3, xs2, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
