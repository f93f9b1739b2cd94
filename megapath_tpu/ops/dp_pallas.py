"""Pallas TPU kernel for the batched affine-gap DP (the hot loop).

Same contract as megapath_tpu.ops.dp.sw_align, but the whole
read-column scan runs inside one Pallas program per candidate tile:
H/F state lives in VMEM scratch across all R steps (the XLA scan
version re-materializes carries through HBM-visible buffers), the
in-column gap chain is the log-shift prefix max, and the per-step
best-cell reduction stays on-chip. This is the CPU_DP.cpp equivalent
(SURVEY.md §2.1) expressed for the VPU's (8, 128) lanes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from megapath_tpu.ops.dp import DPParams, DPResult

NEG = -(10**6)


def _dp_kernel(
    reads_ref,  # (BT, R) int32
    refs_ref,  # (BT, W) int32
    lens_ref,  # (BT, 1) int32
    wlens_ref,  # (BT, 1) int32
    score_ref,  # (BT, 1) int32 out
    endi_ref,  # (BT, 1) int32 out
    endj_ref,  # (BT, 1) int32 out
    H,  # (BT, W) int32 scratch
    F,  # (BT, W) int32 scratch
    *,
    R: int,
    W: int,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
):
    BT = H.shape[0]
    refs = refs_ref[:, :]
    lens = lens_ref[:, :]  # (BT, 1)
    wlens = wlens_ref[:, :]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (BT, W), dimension=1)
    row_valid = col_ids < wlens  # (BT, W)
    decay = col_ids * gap_extend

    H[:, :] = jnp.zeros((BT, W), jnp.int32)
    F[:, :] = jnp.full((BT, W), NEG, jnp.int32)
    score_ref[:, :] = jnp.zeros((BT, 1), jnp.int32)
    endi_ref[:, :] = jnp.zeros((BT, 1), jnp.int32)
    endj_ref[:, :] = jnp.zeros((BT, 1), jnp.int32)

    n_shift = (W - 1).bit_length()
    # packed-key max: Mosaic has no integer argmax, so fold the column
    # index into the value (first-max-wins tie order = highest reversed
    # index) and recover both from one max reduction
    K = 1 << n_shift

    reads = reads_ref[:, :]  # (BT, R)
    read_col_ids = jax.lax.broadcasted_iota(jnp.int32, (BT, R), dimension=1)

    def step(j, _):
        # Mosaic forbids dynamic lane slices, so the per-step read
        # column comes from a one-hot masked reduction over the slab
        read_c = jnp.max(
            jnp.where(read_col_ids == j, reads, -1), axis=1, keepdims=True
        )  # (BT, 1)
        sub = jnp.where(refs == read_c, match, mismatch)

        h_prev = H[:, :]
        f_prev = F[:, :]
        f_new = jnp.maximum(h_prev + gap_open, f_prev + gap_extend)
        h_shift = jnp.pad(h_prev[:, : W - 1], ((0, 0), (1, 0)))
        m = h_shift + sub
        h_noE = jnp.maximum(jnp.maximum(m, f_new), 0)

        # prefix max of Y = h_noE + go - decay via log-shift doubling
        y = h_noE + gap_open - decay
        for p in range(n_shift):
            d = 1 << p
            y = jnp.maximum(y, jnp.pad(y[:, : W - d], ((0, 0), (d, 0)),
                                       constant_values=NEG))
        y_shift = jnp.pad(y[:, : W - 1], ((0, 0), (1, 0)), constant_values=NEG)
        e = y_shift + decay - gap_extend
        h_new = jnp.maximum(h_noE, e)

        col_ok = (j < lens)  # (BT, 1)
        hv = jnp.where(row_valid & col_ok, h_new, 0)
        key = hv * K + (K - 1 - col_ids)
        kbest = jnp.max(key, axis=1, keepdims=True)  # (BT, 1)
        col_best = kbest // K
        col_arg = (K - 1) - (kbest % K)
        better = col_best > score_ref[:, :]
        score_ref[:, :] = jnp.where(better, col_best, score_ref[:, :])
        endi_ref[:, :] = jnp.where(better, col_arg + 1, endi_ref[:, :])
        endj_ref[:, :] = jnp.where(better, j + 1, endj_ref[:, :])

        H[:, :] = jnp.where(col_ok, h_new, h_prev)
        F[:, :] = jnp.where(col_ok, f_new, f_prev)
        return 0

    jax.lax.fori_loop(0, R, step, 0)


def _dp_full_kernel(
    reads_ref,  # (BT, R) int32
    refs_ref,  # (BT, W) int32
    lens_ref,  # (BT, 1) int32
    wlens_ref,  # (BT, 1) int32
    score_ref,  # (BT, 1) int32 out
    endi_ref,  # (BT, 1) int32 out
    endj_ref,  # (BT, 1) int32 out
    starti_ref,  # (BT, 1) int32 out
    startj_ref,  # (BT, 1) int32 out
    H,  # (BT, W) int32 scratch
    F,  # (BT, W) int32 scratch
    *,
    R: int,
    W: int,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
):
    """Forward DP (score + end cell) then an in-place mirrored backward
    DP (start cell) in ONE kernel: the reads/refs tiles stay in VMEM
    across both passes and no reversed copies are materialized (the
    XLA-level reversal was two per-element gathers over the whole
    candidate batch). The backward pass runs the exact mirror
    recurrence anchored at the forward optimum; ties resolve to the
    same cell as local alignment on the reversed prefixes."""
    BT = H.shape[0]
    refs = refs_ref[:, :]
    lens = lens_ref[:, :]
    wlens = wlens_ref[:, :]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (BT, W), dimension=1)
    decay = col_ids * gap_extend
    n_shift = (W - 1).bit_length()
    K = 1 << n_shift

    reads = reads_ref[:, :]
    read_col_ids = jax.lax.broadcasted_iota(jnp.int32, (BT, R), dimension=1)

    # ---------------- forward pass ----------------
    row_valid = col_ids < wlens
    H[:, :] = jnp.zeros((BT, W), jnp.int32)
    F[:, :] = jnp.full((BT, W), NEG, jnp.int32)
    score_ref[:, :] = jnp.zeros((BT, 1), jnp.int32)
    endi_ref[:, :] = jnp.zeros((BT, 1), jnp.int32)
    endj_ref[:, :] = jnp.zeros((BT, 1), jnp.int32)

    def fwd_step(j, _):
        read_c = jnp.max(
            jnp.where(read_col_ids == j, reads, -1), axis=1, keepdims=True
        )
        sub = jnp.where(refs == read_c, match, mismatch)
        h_prev = H[:, :]
        f_prev = F[:, :]
        f_new = jnp.maximum(h_prev + gap_open, f_prev + gap_extend)
        h_shift = jnp.pad(h_prev[:, : W - 1], ((0, 0), (1, 0)))
        m = h_shift + sub
        h_noE = jnp.maximum(jnp.maximum(m, f_new), 0)
        y = h_noE + gap_open - decay
        for p in range(n_shift):
            d = 1 << p
            y = jnp.maximum(y, jnp.pad(y[:, : W - d], ((0, 0), (d, 0)),
                                       constant_values=NEG))
        y_shift = jnp.pad(y[:, : W - 1], ((0, 0), (1, 0)), constant_values=NEG)
        e = y_shift + decay - gap_extend
        h_new = jnp.maximum(h_noE, e)

        col_ok = j < lens
        hv = jnp.where(row_valid & col_ok, h_new, 0)
        key = hv * K + (K - 1 - col_ids)
        kbest = jnp.max(key, axis=1, keepdims=True)
        col_best = kbest // K
        col_arg = (K - 1) - (kbest % K)
        better = col_best > score_ref[:, :]
        score_ref[:, :] = jnp.where(better, col_best, score_ref[:, :])
        endi_ref[:, :] = jnp.where(better, col_arg + 1, endi_ref[:, :])
        endj_ref[:, :] = jnp.where(better, j + 1, endj_ref[:, :])
        H[:, :] = jnp.where(col_ok, h_new, h_prev)
        F[:, :] = jnp.where(col_ok, f_new, f_prev)
        return 0

    jax.lax.fori_loop(0, R, fwd_step, 0)

    # ---------------- backward pass ----------------
    e_i = endi_ref[:, :]  # (BT, 1) exclusive ref end
    e_j = endj_ref[:, :]
    lane_ok = col_ids < e_i
    H[:, :] = jnp.zeros((BT, W), jnp.int32)
    F[:, :] = jnp.full((BT, W), NEG, jnp.int32)
    bbest = jnp.zeros((BT, 1), jnp.int32)
    starti_ref[:, :] = jnp.zeros((BT, 1), jnp.int32)
    startj_ref[:, :] = jnp.zeros((BT, 1), jnp.int32)

    def bwd_step(t, bb):
        j = R - 1 - t
        read_c = jnp.max(
            jnp.where(read_col_ids == j, reads, -1), axis=1, keepdims=True
        )
        sub = jnp.where(
            lane_ok, jnp.where(refs == read_c, match, mismatch), NEG
        )
        h_prev = H[:, :]
        f_prev = F[:, :]
        f_new = jnp.maximum(h_prev + gap_open, f_prev + gap_extend)
        # diagonal from (i+1, j+1): shift LEFT
        h_shift = jnp.pad(h_prev[:, 1:], ((0, 0), (0, 1)))
        m = h_shift + sub
        h_noE = jnp.maximum(jnp.maximum(m, f_new), 0)
        # E'[i] = max_{i'>i} h_noE[i'] + go + (i'-i-1)*ge  (suffix max)
        y = h_noE + gap_open + decay
        for p in range(n_shift):
            d = 1 << p
            y = jnp.maximum(y, jnp.pad(y[:, d:], ((0, 0), (0, d)),
                                       constant_values=NEG))
        y_shift = jnp.pad(y[:, 1:], ((0, 0), (0, 1)), constant_values=NEG)
        e = y_shift - decay - gap_extend
        h_new = jnp.maximum(h_noE, e)

        col_ok = j < e_j
        hv = jnp.where(lane_ok & col_ok, h_new, 0)
        # ties prefer the HIGHEST lane (i): mirrors first-max over the
        # reversed arrays (smallest reversed index)
        key = hv * K + col_ids
        kbest = jnp.max(key, axis=1, keepdims=True)
        col_best = kbest // K
        col_arg = kbest % K
        better = col_best > bb
        bb = jnp.where(better, col_best, bb)
        starti_ref[:, :] = jnp.where(better, col_arg, starti_ref[:, :])
        startj_ref[:, :] = jnp.where(better, j, startj_ref[:, :])
        H[:, :] = jnp.where(col_ok, h_new, h_prev)
        F[:, :] = jnp.where(col_ok, f_new, f_prev)
        return bb

    jax.lax.fori_loop(0, R, bwd_step, bbest)


def _dp_full_kernel_t(
    reads_ref,  # (R, BT) int32 — TRANSPOSED: candidates on lanes
    refs_ref,  # (W, BT) int32
    lens_ref,  # (1, BT) int32
    wlens_ref,  # (1, BT) int32
    score_ref,  # (1, BT) int32 out
    endi_ref,  # (1, BT) int32 out
    endj_ref,  # (1, BT) int32 out
    starti_ref,  # (1, BT) int32 out
    startj_ref,  # (1, BT) int32 out
    H,  # (W, BT) int32 scratch
    F,  # (W, BT) int32 scratch
    *,
    R: int,
    W: int,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
):
    """Transposed variant of _dp_full_kernel: the candidate axis rides
    the 128-lane dimension (fully dense for any W) and the window axis
    rides sublanes, so (a) the per-step read character is ONE dynamic
    sublane row load instead of a one-hot masked reduction over R
    lanes, and (b) a W=164 window wastes 2% in sublane padding instead
    of 36% in lane padding. Same contract/results as _dp_full_kernel.
    """
    BT = H.shape[1]
    refs = refs_ref[:, :]  # (W, BT)
    lens = lens_ref[:, :]  # (1, BT)
    wlens = wlens_ref[:, :]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (W, BT), dimension=0)
    decay = row_ids * gap_extend
    n_shift = (W - 1).bit_length()
    K = 1 << n_shift

    # ---------------- forward pass ----------------
    row_valid = row_ids < wlens
    H[:, :] = jnp.zeros((W, BT), jnp.int32)
    F[:, :] = jnp.full((W, BT), NEG, jnp.int32)
    score_ref[:, :] = jnp.zeros((1, BT), jnp.int32)
    endi_ref[:, :] = jnp.zeros((1, BT), jnp.int32)
    endj_ref[:, :] = jnp.zeros((1, BT), jnp.int32)

    def fwd_step(j, _):
        read_c = reads_ref[j, :][None, :]  # (1, BT) dynamic sublane row
        sub = jnp.where(refs == read_c, match, mismatch)
        h_prev = H[:, :]
        f_prev = F[:, :]
        f_new = jnp.maximum(h_prev + gap_open, f_prev + gap_extend)
        h_shift = jnp.pad(h_prev[: W - 1, :], ((1, 0), (0, 0)))
        m = h_shift + sub
        h_noE = jnp.maximum(jnp.maximum(m, f_new), 0)
        y = h_noE + gap_open - decay
        for p in range(n_shift):
            d = 1 << p
            y = jnp.maximum(y, jnp.pad(y[: W - d, :], ((d, 0), (0, 0)),
                                       constant_values=NEG))
        y_shift = jnp.pad(y[: W - 1, :], ((1, 0), (0, 0)),
                          constant_values=NEG)
        e = y_shift + decay - gap_extend
        h_new = jnp.maximum(h_noE, e)

        col_ok = j < lens  # (1, BT)
        hv = jnp.where(row_valid & col_ok, h_new, 0)
        key = hv * K + (K - 1 - row_ids)
        kbest = jnp.max(key, axis=0, keepdims=True)  # (1, BT)
        col_best = kbest // K
        col_arg = (K - 1) - (kbest % K)
        better = col_best > score_ref[:, :]
        score_ref[:, :] = jnp.where(better, col_best, score_ref[:, :])
        endi_ref[:, :] = jnp.where(better, col_arg + 1, endi_ref[:, :])
        endj_ref[:, :] = jnp.where(better, j + 1, endj_ref[:, :])
        H[:, :] = jnp.where(col_ok, h_new, h_prev)
        F[:, :] = jnp.where(col_ok, f_new, f_prev)
        return 0

    jax.lax.fori_loop(0, R, fwd_step, 0)

    # ---------------- backward pass ----------------
    e_i = endi_ref[:, :]  # (1, BT)
    e_j = endj_ref[:, :]
    lane_ok = row_ids < e_i
    H[:, :] = jnp.zeros((W, BT), jnp.int32)
    F[:, :] = jnp.full((W, BT), NEG, jnp.int32)
    bbest = jnp.zeros((1, BT), jnp.int32)
    starti_ref[:, :] = jnp.zeros((1, BT), jnp.int32)
    startj_ref[:, :] = jnp.zeros((1, BT), jnp.int32)

    def bwd_step(t, bb):
        j = R - 1 - t
        read_c = reads_ref[j, :][None, :]
        sub = jnp.where(
            lane_ok, jnp.where(refs == read_c, match, mismatch), NEG
        )
        h_prev = H[:, :]
        f_prev = F[:, :]
        f_new = jnp.maximum(h_prev + gap_open, f_prev + gap_extend)
        h_shift = jnp.pad(h_prev[1:, :], ((0, 1), (0, 0)))
        m = h_shift + sub
        h_noE = jnp.maximum(jnp.maximum(m, f_new), 0)
        y = h_noE + gap_open + decay
        for p in range(n_shift):
            d = 1 << p
            y = jnp.maximum(y, jnp.pad(y[d:, :], ((0, d), (0, 0)),
                                       constant_values=NEG))
        y_shift = jnp.pad(y[1:, :], ((0, 1), (0, 0)), constant_values=NEG)
        e = y_shift - decay - gap_extend
        h_new = jnp.maximum(h_noE, e)

        col_ok = j < e_j
        hv = jnp.where(lane_ok & col_ok, h_new, 0)
        key = hv * K + row_ids
        kbest = jnp.max(key, axis=0, keepdims=True)
        col_best = kbest // K
        col_arg = kbest % K
        better = col_best > bb
        bb = jnp.where(better, col_best, bb)
        starti_ref[:, :] = jnp.where(better, col_arg, starti_ref[:, :])
        startj_ref[:, :] = jnp.where(better, j, startj_ref[:, :])
        H[:, :] = jnp.where(col_ok, h_new, h_prev)
        F[:, :] = jnp.where(col_ok, f_new, f_prev)
        return bb

    jax.lax.fori_loop(0, R, bwd_step, bbest)


@functools.partial(
    jax.jit, static_argnames=("params", "block_b", "interpret")
)
def sw_align_full_pallas_t(
    reads: jnp.ndarray,  # uint8/int32 [C, R]
    refs: jnp.ndarray,  # uint8/int32 [C, W]
    read_lens: jnp.ndarray,  # int32 [C]
    ref_lens: jnp.ndarray,  # int32 [C]
    params: DPParams = DPParams(),
    block_b: int = 128,
    interpret: bool = False,
) -> DPFullResult:
    """Transposed-layout forward+backward DP (see _dp_full_kernel_t)."""
    C, R = reads.shape
    W = refs.shape[1]
    assert C % block_b == 0, "pad candidate count to a block multiple"
    grid = (C // block_b,)
    kernel = functools.partial(
        _dp_full_kernel_t,
        R=R,
        W=W,
        match=params.match,
        mismatch=params.mismatch,
        gap_open=params.gap_open,
        gap_extend=params.gap_extend,
    )
    out_shape = [jax.ShapeDtypeStruct((1, C), jnp.int32) for _ in range(5)]
    bs = lambda rows: pl.BlockSpec((rows, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    score, endi, endj, starti, startj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bs(R), bs(W), bs(1), bs(1)],
        out_specs=[bs(1)] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((W, block_b), jnp.int32),
            pltpu.VMEM((W, block_b), jnp.int32),
        ],
        interpret=interpret,
    )(
        reads.astype(jnp.int32).T,
        refs.astype(jnp.int32).T,
        read_lens.astype(jnp.int32).reshape(1, C),
        ref_lens.astype(jnp.int32).reshape(1, C),
    )
    return DPFullResult(
        score=score[0, :],
        end_ref=endi[0, :],
        end_read=endj[0, :],
        start_ref=starti[0, :],
        start_read=startj[0, :],
    )


class DPFullResult(NamedTuple):
    score: jnp.ndarray
    end_ref: jnp.ndarray
    end_read: jnp.ndarray
    start_ref: jnp.ndarray
    start_read: jnp.ndarray


@functools.partial(
    jax.jit, static_argnames=("params", "block_b", "interpret")
)
def sw_align_full_pallas(
    reads: jnp.ndarray,  # uint8/int32 [C, R]
    refs: jnp.ndarray,  # uint8/int32 [C, W]
    read_lens: jnp.ndarray,  # int32 [C]
    ref_lens: jnp.ndarray,  # int32 [C]
    params: DPParams = DPParams(),
    block_b: int = 128,
    interpret: bool = False,
) -> DPFullResult:
    """Forward + backward DP in one kernel: (score, end, start)."""
    C, R = reads.shape
    W = refs.shape[1]
    assert C % block_b == 0, "pad candidate count to a block multiple"
    grid = (C // block_b,)
    kernel = functools.partial(
        _dp_full_kernel,
        R=R,
        W=W,
        match=params.match,
        mismatch=params.mismatch,
        gap_open=params.gap_open,
        gap_extend=params.gap_extend,
    )
    out_shape = [jax.ShapeDtypeStruct((C, 1), jnp.int32) for _ in range(5)]
    bs = lambda cols: pl.BlockSpec((block_b, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    score, endi, endj, starti, startj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bs(R), bs(W), bs(1), bs(1)],
        out_specs=[bs(1)] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_b, W), jnp.int32),
            pltpu.VMEM((block_b, W), jnp.int32),
        ],
        interpret=interpret,
    )(
        reads.astype(jnp.int32),
        refs.astype(jnp.int32),
        read_lens.astype(jnp.int32).reshape(C, 1),
        ref_lens.astype(jnp.int32).reshape(C, 1),
    )
    return DPFullResult(
        score=score[:, 0],
        end_ref=endi[:, 0],
        end_read=endj[:, 0],
        start_ref=starti[:, 0],
        start_read=startj[:, 0],
    )


@functools.partial(
    jax.jit, static_argnames=("params", "block_b", "interpret")
)
def sw_align_pallas(
    reads: jnp.ndarray,  # uint8/int32 [C, R]
    refs: jnp.ndarray,  # uint8/int32 [C, W]
    read_lens: jnp.ndarray,  # int32 [C]
    ref_lens: jnp.ndarray,  # int32 [C]
    params: DPParams = DPParams(),
    block_b: int = 8,
    interpret: bool = False,
) -> DPResult:
    C, R = reads.shape
    W = refs.shape[1]
    assert C % block_b == 0, "pad candidate count to a block multiple"
    grid = (C // block_b,)

    kernel = functools.partial(
        _dp_kernel,
        R=R,
        W=W,
        match=params.match,
        mismatch=params.mismatch,
        gap_open=params.gap_open,
        gap_extend=params.gap_extend,
    )
    out_shape = [
        jax.ShapeDtypeStruct((C, 1), jnp.int32),
        jax.ShapeDtypeStruct((C, 1), jnp.int32),
        jax.ShapeDtypeStruct((C, 1), jnp.int32),
    ]
    bs = lambda cols: pl.BlockSpec((block_b, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    score, endi, endj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bs(R), bs(W), bs(1), bs(1)],
        out_specs=[bs(1), bs(1), bs(1)],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_b, W), jnp.int32),
            pltpu.VMEM((block_b, W), jnp.int32),
        ],
        interpret=interpret,
    )(
        reads.astype(jnp.int32),
        refs.astype(jnp.int32),
        read_lens.astype(jnp.int32).reshape(C, 1),
        ref_lens.astype(jnp.int32).reshape(C, 1),
    )
    return DPResult(
        score=score[:, 0], end_ref=endi[:, 0], end_read=endj[:, 0]
    )
