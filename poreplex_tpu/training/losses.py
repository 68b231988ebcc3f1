"""Training losses/metrics.

Weighted categorical crossentropy/accuracy with a class-confusion cost
matrix, matching the semantics of the reference's custom Keras objects
(poreplex/keras_wrap.py:48-94): each sample is weighted by
cost_mat[true_class, predicted_class]."""

import jax
import jax.numpy as jnp


def sample_weights(y_true_onehot, y_pred_probs, cost_mat):
    """cost_mat[k, l] weight for true class k predicted as l
    (poreplex/keras_wrap.py:63-79)."""
    num_classes = cost_mat.shape[0]
    pred_onehot = jax.nn.one_hot(jnp.argmax(y_pred_probs, axis=-1),
                                 num_classes)
    return jnp.einsum('nk,nl,kl->n', y_true_onehot, pred_onehot, cost_mat)


def weighted_categorical_crossentropy(y_true_onehot, y_pred_probs, cost_mat,
                                      eps=1e-7):
    probs = jnp.clip(y_pred_probs, eps, 1.0 - eps)
    ce = -jnp.sum(y_true_onehot * jnp.log(probs), axis=-1)
    w = sample_weights(y_true_onehot, y_pred_probs, cost_mat)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), eps)


def weighted_categorical_accuracy(y_true_onehot, y_pred_probs, cost_mat):
    correct = (jnp.argmax(y_true_onehot, -1) ==
               jnp.argmax(y_pred_probs, -1)).astype(jnp.float32)
    w = sample_weights(y_true_onehot, y_pred_probs, cost_mat)
    return jnp.sum(correct * w) / jnp.maximum(jnp.sum(w), 1e-7)
