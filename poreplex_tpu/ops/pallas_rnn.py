"""Pallas TPU kernels for the LSTM recurrences.

The XLA ``lax.scan`` LSTMs (ops/rnn.py) pay sequential loop overhead per
timestep; at T=2000 (scaler) the while-loop iterations dominate the fused
stage-1 program's device time. These kernels run the whole recurrence
inside one ``pallas_call``: the hidden/cell states live in VMEM scratch,
the recurrent weights stay VMEM-resident across all timesteps, and each
step is two small MXU matmuls plus gate VPU math.

The input projection x @ W_in + b stays OUTSIDE the kernel as one large
XLA GEMM over all timesteps (ops/rnn.py hoists it identically), so the
kernel consumes pre-activations zx [T, B, 4H].

Gate math matches ops/rnn.py: Keras [i, f, c, o] gate order, a ~1e-7
accurate tanh (exp form — Mosaic has no expm1 lowering), and full-f32
matmul precision (jax.lax.Precision.HIGHEST — the MXU 3-pass
decomposition XLA uses). Parity with the XLA scans is pinned by
tests/test_rnn.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rnn import PRECISION


def _accurate_tanh(x):
    """Mosaic-lowerable counterpart of ops.rnn.accurate_tanh (expm1 has no
    Pallas TPU lowering): tanh|x| = (1 - exp(-2|x|)) / (1 + exp(-2|x|)).
    The subtraction cancels against an exactly-representable 1.0, so the
    absolute error stays ~3e-8 — three orders tighter than XLA's builtin
    tanh approximation (~4e-5) that accurate_tanh exists to avoid."""
    ax = jnp.minimum(jnp.abs(x), 20.0)
    t = jnp.exp(-2.0 * ax)
    return jnp.sign(x) * (1.0 - t) / (1.0 + t)

# zx time-block byte budget: keeps the streamed pre-activation block well
# inside VMEM next to the resident weights and state
_BLOCK_BYTES = 4 << 20


def _pick_block_t(seqlen, row_bytes):
    """Largest divisor of seqlen whose zx block fits the VMEM budget."""
    cap = max(1, _BLOCK_BYTES // max(1, row_bytes))
    for d in range(min(cap, seqlen), 0, -1):
        if seqlen % d == 0:
            return d
    return 1


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=PRECISION,
                               preferred_element_type=jnp.float32)


def _gates(z, c_prev, h4):
    i = jax.nn.sigmoid(z[:, 0 * h4:1 * h4])
    f = jax.nn.sigmoid(z[:, 1 * h4:2 * h4])
    g = _accurate_tanh(z[:, 2 * h4:3 * h4])
    o = jax.nn.sigmoid(z[:, 3 * h4:4 * h4])
    c = f * c_prev + i * g
    h = o * _accurate_tanh(c)
    return h, c


def _stacked_kernel(zx_ref, r1_ref, k2_ref, b2_ref, r2_ref, out_ref,
                    h1_ref, c1_ref, h2_ref, c2_ref, *, block_t, h1n, h2n):
    """Grid: (T blocks,) sequential; state [B, H] in VMEM scratch."""
    tb = pl.program_id(0)

    @pl.when(tb == 0)
    def _init():
        h1_ref[:, :] = jnp.zeros_like(h1_ref)
        c1_ref[:, :] = jnp.zeros_like(c1_ref)
        h2_ref[:, :] = jnp.zeros_like(h2_ref)
        c2_ref[:, :] = jnp.zeros_like(c2_ref)

    def step(i, _):
        z1 = zx_ref[i] + _dot(h1_ref[:, :], r1_ref[:, :])
        h1, c1 = _gates(z1, c1_ref[:, :], h1n)
        z2 = _dot(h1, k2_ref[:, :]) + b2_ref[0:1, :] + \
            _dot(h2_ref[:, :], r2_ref[:, :])
        h2, c2 = _gates(z2, c2_ref[:, :], h2n)
        h1_ref[:, :] = h1
        c1_ref[:, :] = c1
        h2_ref[:, :] = h2
        c2_ref[:, :] = c2
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)

    @pl.when(tb == pl.num_programs(0) - 1)
    def _emit():
        out_ref[:, :] = h2_ref[:, :]


def lstm2_stacked_pallas(params1, params2, xs, interpret=False):
    """Fused two-layer stacked LSTM returning layer 2's final hidden
    state — drop-in for ops.rnn.lstm2_stacked on TPU.

    params*: dicts with 'kernel' [I, 4H], 'recurrent' [H, 4H], 'bias' [4H]
    xs: [B, T, I] f32."""
    from .rnn import matmul_f32
    k1, r1, b1 = params1['kernel'], params1['recurrent'], params1['bias']
    k2, r2, b2 = params2['kernel'], params2['recurrent'], params2['bias']
    batch, seqlen, _ = xs.shape
    h1n, h2n = r1.shape[0], r2.shape[0]

    zx = matmul_f32(xs.reshape(batch * seqlen, -1), k1) + b1
    zx = jnp.swapaxes(zx.reshape(batch, seqlen, 4 * h1n), 0, 1)

    block_t = _pick_block_t(seqlen, batch * 4 * h1n * 4)
    nblk = seqlen // block_t

    kernel = functools.partial(_stacked_kernel, block_t=block_t,
                               h1n=h1n, h2n=h2n)
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((block_t, batch, 4 * h1n), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h1n, 4 * h1n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h1n, 4 * h2n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * h2n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h2n, 4 * h2n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, h2n), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, h2n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch, h1n), jnp.float32),
            pltpu.VMEM((batch, h1n), jnp.float32),
            pltpu.VMEM((batch, h2n), jnp.float32),
            pltpu.VMEM((batch, h2n), jnp.float32),
        ],
        interpret=interpret,
    )(zx, r1, k2, b2[None, :], r2)
    return out


def _single_kernel(zx_ref, rec_ref, out_ref, h_ref, c_ref, *, block_t,
                   hidden):
    tb = pl.program_id(0)

    @pl.when(tb == 0)
    def _init():
        h_ref[:, :] = jnp.zeros_like(h_ref)
        c_ref[:, :] = jnp.zeros_like(c_ref)

    def step(i, _):
        z = zx_ref[i, :, :] + _dot(h_ref[:, :], rec_ref[:, :])
        h, c = _gates(z, c_ref[:, :], hidden)
        h_ref[:, :] = h
        c_ref[:, :] = c
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)

    @pl.when(tb == pl.num_programs(0) - 1)
    def _emit():
        out_ref[:, :] = h_ref[:, :]


def lstm_last_pallas(params, xs, interpret=False):
    """Single-layer LSTM returning the final hidden state — drop-in for
    ops.rnn.lstm(..., return_sequences=False) on TPU."""
    from .rnn import matmul_f32
    kernel_w, rec, bias = params['kernel'], params['recurrent'], \
        params['bias']
    batch, seqlen, _ = xs.shape
    hidden = rec.shape[0]

    zx = matmul_f32(xs.reshape(batch * seqlen, -1), kernel_w) + bias
    zx = jnp.swapaxes(zx.reshape(batch, seqlen, 4 * hidden), 0, 1)

    block_t = _pick_block_t(seqlen, batch * 4 * hidden * 4)
    nblk = seqlen // block_t

    kernel = functools.partial(_single_kernel, block_t=block_t,
                               hidden=hidden)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((block_t, batch, 4 * hidden), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 4 * hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, hidden), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(zx, rec)


def _bilstm_kernel(zx_ref, recf_ref, recb_ref, out_ref, h_ref, c_ref, *,
                   block_t, b, hidden):
    """Bidirectional pass with the reversed lane-set riding the same loop
    (rows [0:b] forward, rows [b:2b] backward on pre-reversed inputs);
    emits the full hidden sequence."""
    tb = pl.program_id(0)

    @pl.when(tb == 0)
    def _init():
        h_ref[:, :] = jnp.zeros_like(h_ref)
        c_ref[:, :] = jnp.zeros_like(c_ref)

    def step(i, _):
        zf = zx_ref[i, 0:b, :] + _dot(h_ref[0:b, :], recf_ref[:, :])
        zb = zx_ref[i, b:2 * b, :] + _dot(h_ref[b:2 * b, :], recb_ref[:, :])
        z = jnp.concatenate([zf, zb], axis=0)
        h, c = _gates(z, c_ref[:, :], hidden)
        h_ref[:, :] = h
        c_ref[:, :] = c
        out_ref[i, :, :] = h
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)


def bidirectional_lstm_pallas(fwd_params, bwd_params, xs, interpret=False):
    """Keras Bidirectional(concat) — drop-in for
    ops.rnn.bidirectional_lstm on TPU."""
    from .rnn import matmul_f32
    b, seqlen, _ = xs.shape
    h4 = fwd_params['recurrent'].shape[1]
    hidden = fwd_params['recurrent'].shape[0]

    zx_f = matmul_f32(xs.reshape(b * seqlen, -1), fwd_params['kernel']) + \
        fwd_params['bias']
    zx_b = matmul_f32(xs[:, ::-1].reshape(b * seqlen, -1),
                      bwd_params['kernel']) + bwd_params['bias']
    zx = jnp.concatenate([zx_f.reshape(b, seqlen, h4),
                          zx_b.reshape(b, seqlen, h4)], axis=0)
    zx = jnp.swapaxes(zx, 0, 1)                               # [T, 2B, 4H]

    # both the zx block and the emitted hidden block stream through VMEM
    block_t = _pick_block_t(seqlen, 2 * b * (4 + 1) * hidden * 4)
    nblk = seqlen // block_t

    kernel = functools.partial(_bilstm_kernel, block_t=block_t, b=b,
                               hidden=hidden)
    hs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((block_t, 2 * b, h4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, 2 * b, hidden),
                               lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((seqlen, 2 * b, hidden),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * b, hidden), jnp.float32),
            pltpu.VMEM((2 * b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(zx, fwd_params['recurrent'], bwd_params['recurrent'])
    hs = jnp.swapaxes(hs, 0, 1)                               # [2B, T, H]
    fwd = hs[:b]
    bwd = hs[b:, ::-1]
    return jnp.concatenate([fwd, bwd], axis=-1)
