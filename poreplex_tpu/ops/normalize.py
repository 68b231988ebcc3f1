"""Signal conditioning kernels: stride pooling, masked median/MAD
normalization, median filtering.

Device-side equivalents of the reference's per-read numpy/scipy calls:
stride-mean pooling (poreplex/signal_loader.py:244-247), med/MAD barcode
window normalization (poreplex/barcoding.py:77-81) and the poly(A) median
pre-filter (poreplex/polya.py:62-63, scipy.signal.medfilt with zero-padded
edges).
"""

from functools import partial

import jax
import jax.numpy as jnp


def pool_mean(x, stride):
    """Mean-pool the trailing axis by ``stride``, truncating the remainder
    (poreplex/signal_loader.py:244-247)."""
    n = x.shape[-1] - x.shape[-1] % stride
    x = x[..., :n]
    return x.reshape(x.shape[:-1] + (n // stride, stride)).mean(axis=-1)


def masked_median(x, valid, fill=jnp.inf):
    """Median over valid entries per lane, numpy semantics (mean of the two
    middle order statistics for even counts). x/valid: [B, T]."""
    batch, seqlen = x.shape
    n = jnp.sum(valid, axis=1)
    xs = jnp.sort(jnp.where(valid, x, fill), axis=1)
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    vlo = jnp.take_along_axis(xs, lo[:, None], axis=1)[:, 0]
    vhi = jnp.take_along_axis(xs, hi[:, None], axis=1)[:, 0]
    return 0.5 * (vlo + vhi)


def med_mad_normalize(x, valid, mad_scale=1.4826, mad_floor=0.01):
    """(x - med) / max(mad_floor, mad * mad_scale) over valid entries
    (poreplex/barcoding.py:77-81)."""
    med = masked_median(x, valid)
    mad = masked_median(jnp.abs(x - med[:, None]), valid)
    denom = jnp.maximum(mad_floor, mad * mad_scale)
    return (x - med[:, None]) / denom[:, None]


def medfilt(x, valid, kernel_size):
    """Median filter with zero-padded edges, matching
    scipy.signal.medfilt(x[:L], k) on each lane; positions >= L are zeroed.
    x/valid: [B, T]; kernel_size must be odd."""
    assert kernel_size % 2 == 1
    half = kernel_size // 2
    xm = jnp.where(valid, x, 0.0)
    padded = jnp.pad(xm, ((0, 0), (half, half)))
    windows = jnp.stack(
        [padded[:, k:k + x.shape[1]] for k in range(kernel_size)], axis=-1)
    med = jnp.median(windows, axis=-1)
    return jnp.where(valid, med, 0.0)


def scale_signal(x, scale, shift):
    """Apply per-read affine scaling: poly1d([scale, shift])(x)
    (poreplex/signal_loader.py:258-262)."""
    return x * scale[..., None] + shift[..., None]
