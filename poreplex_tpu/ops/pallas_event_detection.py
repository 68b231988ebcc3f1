"""Pallas TPU kernel: the scrappie dual peak-detector state machine.

The XLA formulation (ops/event_detection.detect_peaks) runs the detector as
a ``lax.scan`` with a tiny [B] carry — on TPU that costs a full sequential
HLO iteration per signal frame, which dominates poly(A) batch time at the
131,072-frame window bucket (the long-scan risk VERDICT.md round 1 flagged;
same motivation as ops/pallas_viterbi.py). This kernel runs the whole
state machine inside ``pallas_call``: time is the minor (sequential) grid
axis, detector state [1, B] lives in VMEM scratch across time blocks, and
each frame is a handful of full-width VPU ops.

Semantics exactly mirror ops/event_detection._detector_step, which in turn
replicates the reference C state machine (src/contrib/scrappie/
event_detection.c:124-201, vendored at /root/reference and bit-parity
tested in tests/test_reference_c_parity.py): CASE1/CASE2 peak tracking,
the short detector masking the long one while it rides a peak over
threshold, and emission after window_length/2 frames past the peak.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32_MAX = float(np.finfo(np.float32).max)
LANES = 128
BLOCK_T = 2048


def _detector_step(pv, pp, mt, vd, tval, t, lens, threshold, window_length,
                   peak_height):
    """One frame of one detector over [1, B] lanes; returns the updated
    (pv, pp, vd) state plus the emission and short-dominates signals.
    ``mt`` (masked_to) is read-only here — only cross-detector masking
    writes it. ``vd`` is an i32 0/1 flag (Mosaic cannot round-trip i1
    vectors through VMEM), all other booleans stay select predicates."""
    one = jnp.ones_like(vd)
    zero = jnp.zeros_like(vd)
    skip = (mt >= t) | (t >= lens)

    not_in_peak = pp == -1
    # CASE 1: no maximum recorded yet
    deeper = tval < pv
    qualify = (tval - pv) > peak_height
    pv_case1 = jnp.where(deeper | qualify, tval, pv)
    pp_case1 = jnp.where(~deeper & qualify, t, pp)

    # CASE 2: inside an existing peak
    higher = tval > pv
    pv_case2 = jnp.where(higher, tval, pv)
    pp_case2 = jnp.where(higher, t, pp)
    became_valid = ((pv_case2 - tval) > peak_height) & (pv_case2 > threshold)
    valid2 = jnp.where(became_valid, one, vd)
    fire = (valid2 > 0) & ((t - pp_case2) > (window_length // 2))
    emitted = jnp.where(fire, pp_case2, -1)
    pp_case2 = jnp.where(fire, -1, pp_case2)
    pv_case2 = jnp.where(fire, tval, pv_case2)
    valid2 = jnp.where(fire, zero, valid2)

    new_pp = jnp.where(not_in_peak, pp_case1, pp_case2)
    new_pv = jnp.where(not_in_peak, pv_case1, pv_case2)
    new_vd = jnp.where(not_in_peak, vd, valid2)

    out_pv = jnp.where(skip, pv, new_pv)
    out_pp = jnp.where(skip, pp, new_pp)
    out_vd = jnp.where(skip, vd, new_vd)
    emitted = jnp.where(skip | not_in_peak, -1, emitted)
    dominating = (~skip) & (~not_in_peak) & (new_pv > threshold)
    return out_pv, out_pp, out_vd, emitted, dominating, new_pp


def _peaks_kernel(t1_ref, t2_ref, len_ref, ems_ref, eml_ref,
                  pv_ref, ip_ref, *, threshold1, threshold2,
                  window_length1, window_length2, peak_height, block_t):
    """Grid: (B blocks, T blocks); T minor => sequential, state carried in
    scratch. pv_ref f32 [8, B] rows: 0=short peak_value, 1=long peak_value.
    ip_ref i32 [8, B] rows: 0/1 peak_pos, 2/3 masked_to, 4/5 valid."""
    tb = pl.program_id(1)
    B = t1_ref.shape[1]

    @pl.when(tb == 0)
    def _init():
        pv_ref[:, :] = jnp.full((8, B), F32_MAX, jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
        ip_ref[:, :] = jnp.where(row < 2, -1, 0)  # peak_pos rows start at -1

    lens = len_ref[0:1, :]
    base = tb * block_t

    def step(i, _):
        t = base + i
        t1 = t1_ref[pl.ds(i, 1), :]
        t2 = t2_ref[pl.ds(i, 1), :]

        spv = pv_ref[0:1, :]
        lpv = pv_ref[1:2, :]
        spp = ip_ref[0:1, :]
        lpp = ip_ref[1:2, :]
        smt = ip_ref[2:3, :]
        lmt = ip_ref[3:4, :]
        svd = ip_ref[4:5, :]
        lvd = ip_ref[5:6, :]

        spv, spp, svd, em_s, dominating, dom_pos = _detector_step(
            spv, spp, smt, svd, t1, t, lens, threshold1, window_length1,
            peak_height)
        # short dominates: reset+mask the long detector BEFORE its own step
        # (event_detection.c:169-179)
        lmt = jnp.where(dominating, dom_pos + window_length1, lmt)
        lpp = jnp.where(dominating, -1, lpp)
        lpv = jnp.where(dominating, F32_MAX, lpv)
        lvd = jnp.where(dominating, 0, lvd)
        lpv, lpp, lvd, em_l, _, _ = _detector_step(
            lpv, lpp, lmt, lvd, t2, t, lens, threshold2, window_length2,
            peak_height)

        pv_ref[0:1, :] = spv
        pv_ref[1:2, :] = lpv
        ip_ref[0:1, :] = spp
        ip_ref[1:2, :] = lpp
        ip_ref[3:4, :] = lmt
        ip_ref[4:5, :] = svd
        ip_ref[5:6, :] = lvd
        ems_ref[pl.ds(i, 1), :] = em_s
        eml_ref[pl.ds(i, 1), :] = em_l
        return 0

    jax.lax.fori_loop(0, block_t, step, 0)


@functools.partial(jax.jit, static_argnames=(
    'threshold1', 'threshold2', 'window_length1', 'window_length2',
    'peak_height', 'interpret'))
def detect_peaks(tstat1, tstat2, lengths, threshold1, threshold2,
                 window_length1, window_length2, peak_height,
                 interpret=False):
    """Drop-in replacement for ops.event_detection.detect_peaks on TPU.

    tstat1/tstat2: [B, T] f32; lengths: [B] i32.
    Returns (peaks_short [B, T], peaks_long [B, T]) i32 emission streams
    (-1 for no peak at that frame)."""
    batch, seqlen = tstat1.shape

    blk = LANES     # full lane width: narrow bool vectors break Mosaic
    nblk_b = pl.cdiv(batch, blk)
    pad_b = nblk_b * blk - batch
    block_t = min(BLOCK_T, seqlen)
    nblk_t = pl.cdiv(seqlen, block_t)

    t1 = jnp.swapaxes(tstat1, 0, 1)                                # [T, B]
    t2 = jnp.swapaxes(tstat2, 0, 1)
    lens2 = lengths.astype(jnp.int32)[None, :]
    if pad_b:
        t1 = jnp.pad(t1, [(0, 0), (0, pad_b)])
        t2 = jnp.pad(t2, [(0, 0), (0, pad_b)])
        lens2 = jnp.pad(lens2, [(0, 0), (0, pad_b)])

    kernel = functools.partial(
        _peaks_kernel, threshold1=float(threshold1),
        threshold2=float(threshold2), window_length1=int(window_length1),
        window_length2=int(window_length2), peak_height=float(peak_height),
        block_t=block_t)

    em_s, em_l = pl.pallas_call(
        kernel,
        grid=(nblk_b, nblk_t),
        in_specs=[
            pl.BlockSpec((block_t, blk), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, blk), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_t, blk), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, blk), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblk_t * block_t, nblk_b * blk),
                                 jnp.int32),
            jax.ShapeDtypeStruct((nblk_t * block_t, nblk_b * blk),
                                 jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, blk), jnp.float32),
            pltpu.VMEM((8, blk), jnp.int32),
        ],
        interpret=interpret,
    )(t1, t2, lens2)

    em_s = jnp.swapaxes(em_s, 0, 1)[:batch, :seqlen]
    em_l = jnp.swapaxes(em_l, 0, 1)[:batch, :seqlen]
    return em_s, em_l
