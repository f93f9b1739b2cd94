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
