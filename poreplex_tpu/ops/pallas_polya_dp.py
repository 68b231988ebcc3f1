"""Pallas TPU kernel: the poly(A) best-interval DP as one fused launch.

The XLA formulation (ops/polya_dp.dp_core) is fully parallel but its
associative scans expand to ~330 tiny fusion kernels whose fixed launch
overhead costs ~25 ms per call at [256, 1024] on a TPU v5e. This kernel
runs the equivalent O(K) sequential recurrence — legal because every live
start lane shares ONE spike budget (see ops/polya_dp.py docstring) — with
the whole per-lane state in VMEM registers: one pallas_call, K steps of a
dozen full-width VPU ops each (~0.3 ms).

Per column j, for all batch lanes at once:

* running inclusive/exclusive score prefixes (trunc-toward-zero ints);
* the uniform spike budget S (reset at poly(A) events, death at S > tol);
* the running min of packed (exclusive prefix, start index) over poly(A)
  start lanes since the last death;
* the row-major-first argmax of (inclusive prefix - runmin) with the
  reference's tie-breaking (higher score, then smaller i, then earlier j).

Bit-identical to ops/polya_dp.dp_core (tested in tests/test_polya_dp.py).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MIN = -2 ** 31 + 1
_VOFF = 1 << 20
_PACK_INF = 2 ** 31 - 1
LANES = 128


def _dp_kernel(isp_ref, colm_ref, spl_ref, n_ref, out_ref, st_ref, *,
               spike_tolerance, kmax, block_k):
    """Grid: (B blocks, K blocks); K minor => sequential, state in scratch.
    st_ref i32 [8, B] rows: 0=prefix_incl, 1=S, 2=runmin, 3=best_val,
    4=best_i, 5=best_j."""
    kb = pl.program_id(1)
    B = isp_ref.shape[1]

    @pl.when(kb == 0)
    def _init():
        row = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
        init = jnp.where(row == 2, _PACK_INF,
                         jnp.where(row == 3, INT_MIN,
                                   jnp.where(row == 4, kmax, 0)))
        st_ref[:, :] = init

    n = n_ref[0:1, :]
    base = kb * block_k

    def step(i, _):
        j = base + i
        isp = isp_ref[pl.ds(i, 1), :] > 0
        colm = colm_ref[pl.ds(i, 1), :]
        spl = spl_ref[pl.ds(i, 1), :]

        prefix = st_ref[0:1, :]
        S = st_ref[1:2, :]
        runmin = st_ref[2:3, :]
        best_val = st_ref[3:4, :]
        best_i = st_ref[4:5, :]
        best_j = st_ref[5:6, :]

        prefix_ex = prefix
        prefix = prefix + colm
        S = jnp.where(isp, 0, S + spl)
        died = (~isp) & (S > spike_tolerance)

        cand = jnp.where(isp, (prefix_ex + _VOFF) * kmax + j, _PACK_INF)
        runmin = jnp.minimum(jnp.where(died, _PACK_INF, runmin), cand)

        have = runmin < _PACK_INF
        rv = runmin // kmax - _VOFF
        ri = runmin % kmax
        valid = (j < n) & (isp | (S < spike_tolerance)) & have
        val = jnp.where(valid, prefix - rv, INT_MIN)
        take = (val > best_val) | ((val == best_val) & (ri < best_i))
        best_val = jnp.where(take, val, best_val)
        best_i = jnp.where(take, ri, best_i)
        best_j = jnp.where(take, j, best_j)

        st_ref[0:1, :] = prefix
        st_ref[1:2, :] = S
        st_ref[2:3, :] = runmin
        st_ref[3:4, :] = best_val
        st_ref[4:5, :] = best_i
        st_ref[5:6, :] = best_j
        return 0

    jax.lax.fori_loop(0, block_k, step, 0)

    @pl.when(kb == pl.num_programs(1) - 1)
    def _emit():
        out_ref[0:1, :] = st_ref[3:4, :]
        out_ref[1:2, :] = st_ref[4:5, :]
        out_ref[2:3, :] = st_ref[5:6, :]


@functools.partial(jax.jit, static_argnames=('spike_weight',
                                             'spike_tolerance', 'interpret'))
def dp_pallas(is_polya, length, n_events, spike_weight=1.5,
              spike_tolerance=110, interpret=False):
    """Drop-in for ops.polya_dp.find_best_polya_interval on TPU.
    Returns (start [B] i32, end [B] i32, score [B] i32)."""
    return dp_pallas_core(is_polya, length, n_events, spike_weight,
                          spike_tolerance, interpret)


def dp_pallas_core(is_polya, length, n_events, spike_weight,
                   spike_tolerance, interpret=False):
    batch, kmax = is_polya.shape

    col_match = jnp.trunc(
        jnp.where(is_polya, length, -spike_weight * length)).astype(jnp.int32)
    spike_len = jnp.where(is_polya, 0,
                          jnp.trunc(length).astype(jnp.int32))

    blk = LANES
    nblk_b = pl.cdiv(batch, blk)
    pad_b = nblk_b * blk - batch
    block_k = min(2048, kmax)
    nblk_k = pl.cdiv(kmax, block_k)

    ispT = jnp.swapaxes(is_polya.astype(jnp.int32), 0, 1)     # [K, B]
    colT = jnp.swapaxes(col_match, 0, 1)
    splT = jnp.swapaxes(spike_len, 0, 1)
    nn = n_events.astype(jnp.int32)[None, :]
    if pad_b:
        ispT = jnp.pad(ispT, [(0, 0), (0, pad_b)])
        colT = jnp.pad(colT, [(0, 0), (0, pad_b)])
        splT = jnp.pad(splT, [(0, 0), (0, pad_b)])
        nn = jnp.pad(nn, [(0, 0), (0, pad_b)])

    kernel = functools.partial(_dp_kernel,
                               spike_tolerance=int(spike_tolerance),
                               kmax=int(kmax), block_k=block_k)
    out = pl.pallas_call(
        kernel,
        grid=(nblk_b, nblk_k),
        in_specs=[
            pl.BlockSpec((block_k, blk), lambda b, k: (k, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, blk), lambda b, k: (k, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, blk), lambda b, k: (k, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda b, k: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, blk), lambda b, k: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nblk_b * blk), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, blk), jnp.int32)],
        interpret=interpret,
    )(ispT, colT, splT, nn)

    best_val = out[0, :batch]
    best_i = out[1, :batch]
    best_j = out[2, :batch]
    found = best_val > 0
    return (jnp.where(found, best_i, 0), jnp.where(found, best_j, 0),
            jnp.where(found, best_val, 0))
