"""Training pipeline smoke/parity tests (short runs on synthetic data)."""

import numpy as np
import jax.numpy as jnp
import pytest

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
