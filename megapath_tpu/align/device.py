"""Device-resident alignment step (the jittable "forward" of the engine).

One fused XLA program per batch: gather candidate reference windows
from the device-resident shard, run the batched affine-gap DP for both
pair legs, threshold, and reduce per-candidate results to per-read
best scores. This is the hot path the per-chip throughput comes from;
host code only prepares candidate arrays (seeding/pairing).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from megapath_tpu.ops.dp import DPParams, sw_align

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
    res = sw_align(reads, wins, read_lens, wlens, params=params)
    thr = jnp.maximum(
        (cutoff_ratio * read_lens).astype(jnp.int32), jnp.int32(cutoff_lb)
    )
    return AlignStepOut(
        score=res.score,
        end_ref=res.end_ref,
        end_read=res.end_read,
        passed=res.score >= thr,
    )


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
