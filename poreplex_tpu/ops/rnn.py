"""Batched LSTM kernels for the scaler and demultiplexer networks.

The reference runs these models through Keras/TensorFlow
(poreplex/signal_loader.py:96-97, poreplex/barcoding.py:106-107). Here they
are implemented as JAX scans designed for the TPU MXU:

* the input projection ``x @ W`` for ALL timesteps is hoisted out of the
  recurrence into one large [B*T, I] x [I, 4H] matmul so the systolic array
  sees a single big GEMM instead of T tiny ones;
* the sequential part carries only the [B, H] x [H, 4H] recurrent matmul
  inside ``lax.scan``;
* gate order is Keras-compatible [i, f, c, o] so converted weights are used
  verbatim (tools/import_assets.py).
"""

from functools import partial

import jax
import jax.numpy as jnp

# This environment's default matmul precision demotes f32 GEMMs to bf16
# (one MXU pass). The scaler/demux networks are tiny and parity-sensitive, so
# run their GEMMs at full f32 precision explicitly.
PRECISION = jax.lax.Precision.HIGHEST


def matmul_f32(a, b):
    return jnp.matmul(a, b, precision=PRECISION)


def default_unroll():
    """Scan unroll factor: 8 amortizes the TPU sequential-loop overhead, but
    multiplies XLA:CPU compile time for the 2000-step scaler scan (the
    virtual-device dryrun path), where the loop overhead it hides does not
    exist. Resolved at trace time from the active backend."""
    return 8 if jax.default_backend() == 'tpu' else 1


def accurate_tanh(x):
    """tanh via expm1 — XLA's builtin tanh is a fast approximation with
    ~4e-5 absolute error, which compounds through long recurrences; this
    formulation is accurate to ~1ulp of expm1 and keeps the scaler/demux
    outputs aligned with the TF-computed reference models."""
    x = jnp.clip(x, -20.0, 20.0)
    t = jnp.expm1(2.0 * x)
    return t / (t + 2.0)


def lstm_gates(z, c_prev):
    """Apply Keras-ordered LSTM gate math to pre-activations z=[..., 4H]."""
    h4 = z.shape[-1] // 4
    i = jax.nn.sigmoid(z[..., 0 * h4:1 * h4])
    f = jax.nn.sigmoid(z[..., 1 * h4:2 * h4])
    g = accurate_tanh(z[..., 2 * h4:3 * h4])
    o = jax.nn.sigmoid(z[..., 3 * h4:4 * h4])
    c = f * c_prev + i * g
    h = o * accurate_tanh(c)
    return h, c


def lstm(params, xs, reverse=False, return_sequences=True, unroll=None):
    """Run an LSTM over a batch of sequences.

    params: dict with 'kernel' [I, 4H], 'recurrent' [H, 4H], 'bias' [4H]
    xs: [B, T, I] input batch
    Returns [B, T, H] if return_sequences else [B, H] (last step).
    ``unroll`` amortizes the TPU loop overhead across scan iterations.
    """
    if unroll is None:
        unroll = default_unroll()
    kernel = params['kernel']
    recurrent = params['recurrent']
    bias = params['bias']
    batch, seqlen, _ = xs.shape
    hidden = recurrent.shape[0]

    # One MXU-sized GEMM for the input projection of every timestep.
    zx = matmul_f32(xs.reshape(batch * seqlen, -1), kernel) + bias
    zx = zx.reshape(batch, seqlen, 4 * hidden)
    # scan over time: [T, B, 4H]
    zx = jnp.swapaxes(zx, 0, 1)
    if reverse:
        zx = zx[::-1]

    def step(carry, z_t):
        h_prev, c_prev = carry
        z = z_t + matmul_f32(h_prev, recurrent)
        h, c = lstm_gates(z, c_prev)
        return (h, c), h

    init = (jnp.zeros((batch, hidden), xs.dtype),
            jnp.zeros((batch, hidden), xs.dtype))
    (h_last, _), hs = jax.lax.scan(step, init, zx, unroll=unroll)

    if not return_sequences:
        return h_last
    if reverse:
        hs = hs[::-1]
    return jnp.swapaxes(hs, 0, 1)


def lstm2_stacked(params1, params2, xs, unroll=None):
    """Two stacked LSTM layers fused into ONE scan (layer 2 consumes layer
    1's output at the same timestep), returning layer 2's final hidden
    state. Halves the sequential loop overhead vs two scans and never
    materializes the [B, T, H] intermediate. Numerically identical to
    lstm(p2, lstm(p1, xs), return_sequences=False)."""
    if unroll is None:
        unroll = default_unroll()
    k1, r1, b1 = params1['kernel'], params1['recurrent'], params1['bias']
    k2, r2, b2 = params2['kernel'], params2['recurrent'], params2['bias']
    batch, seqlen, _ = xs.shape
    h1n, h2n = r1.shape[0], r2.shape[0]

    zx = matmul_f32(xs.reshape(batch * seqlen, -1), k1) + b1
    zx = jnp.swapaxes(zx.reshape(batch, seqlen, 4 * h1n), 0, 1)

    def step(carry, z_t):
        h1, c1, h2, c2 = carry
        z1 = z_t + matmul_f32(h1, r1)
        h1, c1 = lstm_gates(z1, c1)
        z2 = matmul_f32(h1, k2) + b2 + matmul_f32(h2, r2)
        h2, c2 = lstm_gates(z2, c2)
        return (h1, c1, h2, c2), None

    init = tuple(jnp.zeros((batch, n), xs.dtype)
                 for n in (h1n, h1n, h2n, h2n))
    (h1, c1, h2, c2), _ = jax.lax.scan(step, init, zx, unroll=unroll)
    return h2


def bidirectional_lstm(fwd_params, bwd_params, xs, unroll=None):
    """Keras Bidirectional(merge_mode='concat') over a batch: concatenates
    forward output with the time-realigned backward output.

    Runs both directions in ONE scan by doubling the batch (the reversed
    sequence rides the same loop), so the sequential cost is one pass."""
    if unroll is None:
        unroll = default_unroll()
    b, seqlen, _ = xs.shape

    zx_f = matmul_f32(xs.reshape(b * seqlen, -1), fwd_params['kernel']) + \
        fwd_params['bias']
    zx_b = matmul_f32(xs[:, ::-1].reshape(b * seqlen, -1),
                      bwd_params['kernel']) + bwd_params['bias']
    h4 = fwd_params['recurrent'].shape[1]
    zx = jnp.concatenate([zx_f.reshape(b, seqlen, h4),
                          zx_b.reshape(b, seqlen, h4)], axis=0)
    zx = jnp.swapaxes(zx, 0, 1)                               # [T, 2B, 4H]

    rec = fwd_params['recurrent']
    rec_b = bwd_params['recurrent']
    hidden = rec.shape[0]

    def step(carry, z_t):
        h_prev, c_prev = carry
        zf = z_t[:b] + matmul_f32(h_prev[:b], rec)
        zb = z_t[b:] + matmul_f32(h_prev[b:], rec_b)
        h, c = lstm_gates(jnp.concatenate([zf, zb], axis=0), c_prev)
        return (h, c), h

    init = (jnp.zeros((2 * b, hidden), xs.dtype),
            jnp.zeros((2 * b, hidden), xs.dtype))
    _, hs = jax.lax.scan(step, init, zx, unroll=unroll)
    hs = jnp.swapaxes(hs, 0, 1)                               # [2B, T, H]
    fwd = hs[:b]
    bwd = hs[b:, ::-1]
    return jnp.concatenate([fwd, bwd], axis=-1)


def dense(params, xs):
    return matmul_f32(xs, params['kernel']) + params['bias']
