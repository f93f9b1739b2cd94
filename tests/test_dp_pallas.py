"""Pallas DP kernel vs the XLA reference implementation.

Runs in interpret mode on the CPU test mesh; the compiled path is
exercised on real TPU by bench/production runs.
"""

import numpy as np
import pytest

from megapath_tpu.ops.dp import sw_align
from megapath_tpu.ops.dp_pallas import sw_align_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    B, R, W = 16, 64, 128
    reads = np.zeros((B, R), dtype=np.uint8)
    refs = np.zeros((B, W), dtype=np.uint8)
    rl = np.zeros(B, np.int32)
    wl = np.zeros(B, np.int32)
    for b in range(B):
        w = int(rng.integers(60, W + 1))
        ref = rng.integers(0, 4, w).astype(np.uint8)
        r = int(rng.integers(30, min(R, w) + 1))
        p = int(rng.integers(0, w - r + 1))
        read = ref[p : p + r].copy()
        for _ in range(int(rng.integers(0, 4))):
            q = int(rng.integers(0, r))
            read[q] = (read[q] + 1 + rng.integers(0, 3)) % 4
        reads[b, :r] = read
        refs[b, :w] = ref
        rl[b], wl[b] = r, w

    want = sw_align(reads, refs, rl, wl)
    got = sw_align_pallas(reads, refs, rl, wl, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.score), np.asarray(want.score))
    m = np.asarray(want.score) > 0
    np.testing.assert_array_equal(
        np.asarray(got.end_ref)[m], np.asarray(want.end_ref)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(got.end_read)[m], np.asarray(want.end_read)[m]
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_full_kernel_matches_reversed_prefix_path(seed):
    """Fwd+bwd fused kernel == two-pass reversed-prefix formulation,
    including start-cell tie-breaks."""
    import jax.numpy as jnp

    from megapath_tpu.ops.dp_pallas import sw_align_full_pallas

    rng = np.random.default_rng(seed)
    B, R, W = 16, 48, 128
    reads = np.zeros((B, R), dtype=np.uint8)
    refs = np.zeros((B, W), dtype=np.uint8)
    rl = np.zeros(B, np.int32)
    wl = np.full(B, W, np.int32)
    for b in range(B):
        ref = rng.integers(0, 4, W).astype(np.uint8)
        r = int(rng.integers(24, R + 1))
        p = int(rng.integers(0, W - r))
        read = ref[p : p + r].copy()
        for _ in range(int(rng.integers(0, 5))):
            q = int(rng.integers(0, r))
            read[q] = (read[q] + 1 + rng.integers(0, 3)) % 4
        reads[b, :r] = read
        refs[b] = ref
        rl[b] = r

    full = sw_align_full_pallas(reads, refs, rl, wl, block_b=8, interpret=True)

    # reference: fwd sw_align + local DP on reversed prefixes
    fwd = sw_align(reads, refs, rl, wl)
    jj = np.arange(R)[None, :]
    rsrc = np.asarray(fwd.end_read)[:, None] - 1 - jj
    rev_reads = np.where(
        rsrc >= 0, np.take_along_axis(reads, np.clip(rsrc, 0, R - 1), 1), 0
    ).astype(np.uint8)
    ii = np.arange(W)[None, :]
    wsrc = np.asarray(fwd.end_ref)[:, None] - 1 - ii
    rev_refs = np.where(
        wsrc >= 0, np.take_along_axis(refs, np.clip(wsrc, 0, W - 1), 1), 4
    ).astype(np.uint8)
    rev = sw_align(
        rev_reads, rev_refs,
        np.asarray(fwd.end_read, np.int32), np.asarray(fwd.end_ref, np.int32),
    )
    np.testing.assert_array_equal(np.asarray(full.score), np.asarray(fwd.score))
    m = np.asarray(fwd.score) > 0
    np.testing.assert_array_equal(
        np.asarray(full.end_ref)[m], np.asarray(fwd.end_ref)[m]
    )
    want_start_ref = np.asarray(fwd.end_ref) - np.asarray(rev.end_ref)
    want_start_read = np.asarray(fwd.end_read) - np.asarray(rev.end_read)
    np.testing.assert_array_equal(
        np.asarray(full.start_ref)[m], want_start_ref[m]
    )
    np.testing.assert_array_equal(
        np.asarray(full.start_read)[m], want_start_read[m]
    )


@pytest.mark.parametrize("seed", [0, 5])
def test_transposed_full_kernel_matches(seed):
    """Transposed layout (candidates on lanes) == original fused
    kernel == XLA reference, including start cells and tie-breaks."""
    from megapath_tpu.ops.dp_pallas import (
        sw_align_full_pallas,
        sw_align_full_pallas_t,
    )

    rng = np.random.default_rng(seed)
    B, R, W = 16, 48, 164
    reads = np.zeros((B, R), dtype=np.uint8)
    refs = np.zeros((B, W), dtype=np.uint8)
    rl = np.zeros(B, np.int32)
    wl = np.zeros(B, np.int32)
    for b in range(B):
        w = int(rng.integers(100, W + 1))
        ref = rng.integers(0, 4, w).astype(np.uint8)
        r = int(rng.integers(30, min(R, w) + 1))
        p = int(rng.integers(0, w - r + 1))
        read = ref[p : p + r].copy()
        for _ in range(int(rng.integers(0, 5))):
            q = int(rng.integers(0, r))
            read[q] = (read[q] + 1 + rng.integers(0, 3)) % 4
        reads[b, :r] = read
        refs[b, :w] = ref
        rl[b], wl[b] = r, w

    want = sw_align_full_pallas(
        reads, refs, rl, wl, block_b=16, interpret=True
    )
    got = sw_align_full_pallas_t(
        reads, refs, rl, wl, block_b=16, interpret=True
    )
    for f in ("score", "end_ref", "end_read", "start_ref", "start_read"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(want, f)), f
        )
