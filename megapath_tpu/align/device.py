"""Device-resident alignment step (the jittable "forward" of the engine).

One fused XLA program per batch: gather candidate reference windows
from the device-resident shard, run the batched affine-gap DP for both
pair legs, threshold, and reduce per-candidate results to per-read
best scores. This is the hot path the per-chip throughput comes from;
host code only prepares candidate arrays (seeding/pairing).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from megapath_tpu.ops.dp import DPParams, sw_align_auto

OFF_TEXT_CODE = 4


class AlignStepOut(NamedTuple):
    score: jnp.ndarray  # int32 [C] per-candidate DP score
    end_ref: jnp.ndarray  # int32 [C] window-relative alignment end
    end_read: jnp.ndarray  # int32 [C]
    passed: jnp.ndarray  # bool [C] score >= max(ratio*len, lb)


def gather_windows(
    ref_codes: jnp.ndarray, starts: jnp.ndarray, width: int
) -> jnp.ndarray:
    """[C] start positions -> [C, width] windows; off-text cells get
    OFF_TEXT_CODE (forced mismatch)."""
    n = ref_codes.shape[0]
    idx = starts[:, None] + jnp.arange(width, dtype=starts.dtype)[None, :]
    valid = (idx >= 0) & (idx < n)
    win = jnp.take(ref_codes, jnp.clip(idx, 0, n - 1), axis=0)
    return jnp.where(valid, win, OFF_TEXT_CODE).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("width", "params"))
def align_step(
    ref_codes: jnp.ndarray,  # uint8 [N] device-resident shard text
    reads: jnp.ndarray,  # uint8 [C, L] candidate read codes (oriented)
    read_lens: jnp.ndarray,  # int32 [C]
    win_starts: jnp.ndarray,  # int64/int32 [C] window start positions
    width: int,
    params: DPParams = DPParams(),
    cutoff_ratio: float = 0.2,
    cutoff_lb: int = 30,
) -> AlignStepOut:
    """Gather + DP + threshold as one compiled program."""
    wins = gather_windows(ref_codes, win_starts, width)
    wlens = jnp.full(reads.shape[0], width, dtype=jnp.int32)
    res = sw_align_auto(reads, wins, read_lens, wlens, params=params)
    thr = jnp.maximum(
        (cutoff_ratio * read_lens).astype(jnp.int32), jnp.int32(cutoff_lb)
    )
    return AlignStepOut(
        score=res.score,
        end_ref=res.end_ref,
        end_read=res.end_read,
        passed=res.score >= thr,
    )


class FullAlignOut(NamedTuple):
    score: jnp.ndarray  # int32 [C]
    start_ref: jnp.ndarray  # int32 [C] window-relative alignment start
    end_ref: jnp.ndarray  # int32 [C] window-relative end (exclusive)
    end_read: jnp.ndarray  # int32 [C]
    start_read: jnp.ndarray  # int32 [C]


def align_with_starts(
    ref_codes: jnp.ndarray,  # uint8 [N] device-resident shard text
    reads: jnp.ndarray,  # uint8 [C, L]
    read_lens: jnp.ndarray,  # int32 [C]
    win_starts: jnp.ndarray,  # int32 [C]
    width: int,
    params: DPParams = DPParams(),
    win_lens: jnp.ndarray | None = None,  # int32 [C] effective lengths
) -> FullAlignOut:
    """Window gather + forward DP + reverse DP, one compiled program.

    ``win_lens`` bounds each row's usable window (soap4 clips the DNA
    window length per candidate, e.g. to leftHit + insert_high for the
    right pair leg, DV-DPfunctions.cpp:2954-2959); cells past it are
    excluded from the DP. Defaults to the full ``width``.
    """
    if win_lens is None:
        win_lens = jnp.full(reads.shape[0], width, dtype=jnp.int32)
    return _align_with_starts(
        ref_codes, reads, read_lens, win_starts,
        jnp.asarray(win_lens, jnp.int32), width, params
    )


@functools.partial(jax.jit, static_argnames=("width", "params"))
def _align_with_starts(
    ref_codes: jnp.ndarray,
    reads: jnp.ndarray,
    read_lens: jnp.ndarray,
    win_starts: jnp.ndarray,
    win_lens: jnp.ndarray,
    width: int,
    params: DPParams = DPParams(),
) -> FullAlignOut:
    """The reverse pass aligns the reversed read/window prefixes ending
    at the forward optimum, whose end cell is the alignment start — no
    backtrack table needed, and nothing round-trips to the host."""
    from megapath_tpu.ops.dp import _on_tpu

    C, L = reads.shape
    wins = gather_windows(ref_codes, win_starts, width)
    wlens = win_lens

    if _on_tpu() and C % 128 == 0:
        # transposed layout: candidates ride the 128-lane axis (dense
        # for any window width) and the per-step read char is one
        # dynamic sublane load — measured faster than the row-major
        # kernel whose W=164 window pads to 256 lanes
        from megapath_tpu.ops.dp_pallas import sw_align_full_pallas_t

        full = sw_align_full_pallas_t(
            reads, wins, read_lens, wlens, params=params, block_b=128
        )
        return FullAlignOut(
            score=full.score,
            start_ref=full.start_ref,
            end_ref=full.end_ref,
            end_read=full.end_read,
            start_read=full.start_read,
        )

    fwd = sw_align_auto(reads, wins, read_lens, wlens, params=params)
    # reversed prefixes: read[:end_read][::-1], window[:end_ref][::-1]
    jj = jnp.arange(L, dtype=jnp.int32)[None, :]
    rsrc = fwd.end_read[:, None] - 1 - jj
    rev_reads = jnp.where(
        rsrc >= 0,
        jnp.take_along_axis(reads, jnp.clip(rsrc, 0, L - 1), axis=1),
        0,
    ).astype(jnp.uint8)
    ii = jnp.arange(width, dtype=jnp.int32)[None, :]
    wsrc = fwd.end_ref[:, None] - 1 - ii
    rev_wins = jnp.where(
        wsrc >= 0,
        jnp.take_along_axis(wins, jnp.clip(wsrc, 0, width - 1), axis=1),
        OFF_TEXT_CODE,
    ).astype(jnp.uint8)
    rev = sw_align_auto(rev_reads, rev_wins, fwd.end_read, fwd.end_ref, params=params)
    return FullAlignOut(
        score=fwd.score,
        start_ref=fwd.end_ref - rev.end_ref,
        end_ref=fwd.end_ref,
        end_read=fwd.end_read,
        start_read=fwd.end_read - rev.end_read,
    )


@functools.partial(jax.jit, static_argnames=("width", "params"))
def deep_dp_fused(
    ref_codes: jnp.ndarray,
    left_reads: jnp.ndarray,  # [C, L] forward codes of the left leg
    left_lens: jnp.ndarray,
    left_starts: jnp.ndarray,  # int32 window starts (pos - margin)
    left_win_lens: jnp.ndarray,
    right_reads: jnp.ndarray,  # [C, L] revcomp codes of the right leg
    right_lens: jnp.ndarray,
    right_starts: jnp.ndarray,
    right_full_wl: jnp.ndarray,  # readLen + 2*margin before clipping
    width: int,
    insert_high: int,
    params: DPParams = DPParams(),
) -> Tuple[FullAlignOut, FullAlignOut]:
    """Both deep-DP legs in ONE device program.

    The reference aligns the right end per left-passing candidate with
    the window clipped to leftHit + insert_high
    (DV-DPfunctions.cpp:2933-2959). Doing the clip ON DEVICE (the left
    hit position feeds the right win_lens without a host round trip)
    removes the mid-stage sync; the right leg is computed for every
    candidate and the left-leg threshold gates the OUTPUT on the host,
    so the kept hits are identical to the reference's sequential
    two-phase flow.
    """
    left = _align_with_starts(
        ref_codes, left_reads, left_lens, left_starts,
        left_win_lens, width, params,
    )
    hit_left = left_starts + left.start_ref
    bound = hit_left + jnp.int32(insert_high) - right_starts
    wl_r = jnp.clip(jnp.minimum(right_full_wl, bound), 0, width)
    right = _align_with_starts(
        ref_codes, right_reads, right_lens, right_starts,
        wl_r.astype(jnp.int32), width, params,
    )
    return left, right


def _take_oriented(
    reads_all: jnp.ndarray,  # uint8 [Nr, L] forward codes
    lens_all: jnp.ndarray,  # int32 [Nr]
    idx: jnp.ndarray,  # int32 [C]
    flip: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather read rows (revcomp'd when ``flip``) on device — the
    candidate fan-out stays in HBM instead of being gathered on the
    host and re-uploaded (~4 MB h2d per deep-DP batch)."""
    rows = jnp.take(reads_all, idx, axis=0).astype(jnp.int32)
    lens = jnp.take(lens_all, idx).astype(jnp.int32)
    if not flip:
        return rows.astype(jnp.uint8), lens
    L = reads_all.shape[1]
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    src = lens[:, None] - 1 - j
    rc = jnp.where(
        src >= 0,
        3 - jnp.take_along_axis(rows, jnp.clip(src, 0, L - 1), axis=1),
        0,
    )
    return rc.astype(jnp.uint8), lens


@functools.partial(jax.jit, static_argnames=("width", "params"))
def deep_dp_fused_idx(
    ref_codes: jnp.ndarray,
    reads_all: jnp.ndarray,  # uint8 [Nr, L] all reads, forward codes
    lens_all: jnp.ndarray,  # int32 [Nr]
    left_idx: jnp.ndarray,  # int32 [C] rows of the left (+) legs
    left_starts: jnp.ndarray,
    left_win_lens: jnp.ndarray,
    right_idx: jnp.ndarray,  # int32 [C] rows of the right (-) legs
    right_starts: jnp.ndarray,
    right_full_wl: jnp.ndarray,
    width: int,
    insert_high: int,
    params: DPParams = DPParams(),
) -> Tuple[FullAlignOut, FullAlignOut]:
    """deep_dp_fused with the candidate read gather + right-leg
    revcomp done ON DEVICE from the batch's resident read matrix (the
    same upload the seeding walk used): the host sends only the int32
    candidate index arrays."""
    left_reads, left_lens = _take_oriented(
        reads_all, lens_all, left_idx, flip=False
    )
    right_reads, right_lens = _take_oriented(
        reads_all, lens_all, right_idx, flip=True
    )
    left = _align_with_starts(
        ref_codes, left_reads, left_lens, left_starts,
        left_win_lens, width, params,
    )
    hit_left = left_starts + left.start_ref
    bound = hit_left + jnp.int32(insert_high) - right_starts
    wl_r = jnp.clip(jnp.minimum(right_full_wl, bound), 0, width)
    right = _align_with_starts(
        ref_codes, right_reads, right_lens, right_starts,
        wl_r.astype(jnp.int32), width, params,
    )
    return left, right


@functools.partial(jax.jit, static_argnames=("width", "params"))
def pair_align_step(
    ref_codes: jnp.ndarray,
    left_reads: jnp.ndarray,  # [C, L] forward codes of the + leg
    left_lens: jnp.ndarray,
    left_starts: jnp.ndarray,
    right_reads: jnp.ndarray,  # [C, L] revcomp codes of the - leg
    right_lens: jnp.ndarray,
    right_starts: jnp.ndarray,
    width: int,
    params: DPParams = DPParams(),
    cutoff_ratio: float = 0.2,
    cutoff_lb: int = 30,
):
    """Both pair legs in one batch; returns per-leg results + pair keep
    mask (both ends over threshold, DV-DPfunctions.cpp:3439-3440)."""
    reads = jnp.concatenate([left_reads, right_reads])
    lens = jnp.concatenate([left_lens, right_lens])
    starts = jnp.concatenate([left_starts, right_starts])
    out = align_step(
        ref_codes, reads, lens, starts, width, params, cutoff_ratio, cutoff_lb
    )
    C = left_reads.shape[0]
    keep = out.passed[:C] & out.passed[C:]
    return out, keep
