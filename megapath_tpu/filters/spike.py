"""SPIKE coverage-anomaly filter.

Replaces the reference's bedtools bamtobed/genomecov + genomeCovFilter
+ bedtools annotate chain (runMegaPath.sh:211-221,
/root/reference/cc/genomeCovFilter.cpp): per reference sequence,
compute the depth profile from alignment intervals, flag regions whose
depth exceeds mean + k*stdev (streaming length-weighted moments in the
reference's exact update order), and drop reads whose alignment
overlaps flagged regions by >= overlap_frac of their span.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np


@dataclass
class CoverageRuns:
    """bedtools genomecov -bga equivalent: per-seq depth runs."""

    seq: np.ndarray  # int32 [R]
    start: np.ndarray  # int64 [R]
    stop: np.ndarray  # int64 [R]
    depth: np.ndarray  # int64 [R]


def genome_coverage(
    seq_lens: Sequence[int],
    seq: np.ndarray,
    start: np.ndarray,
    stop: np.ndarray,
) -> CoverageRuns:
    """Depth runs (including zero-depth) from alignment intervals."""
    out_seq: List[np.ndarray] = []
    out_start: List[np.ndarray] = []
    out_stop: List[np.ndarray] = []
    out_depth: List[np.ndarray] = []
    seq = np.asarray(seq)
    for s, slen in enumerate(seq_lens):
        m = seq == s
        diff = np.zeros(slen + 1, dtype=np.int64)
        if m.any():
            st = np.clip(start[m], 0, slen)
            en = np.clip(stop[m], 0, slen)
            np.add.at(diff, st, 1)
            np.add.at(diff, en, -1)
        depth = np.cumsum(diff[:-1])
        # run-length encode
        if slen == 0:
            continue
        change = np.flatnonzero(np.r_[True, depth[1:] != depth[:-1]])
        starts = change
        stops = np.r_[change[1:], slen]
        out_seq.append(np.full(len(starts), s, dtype=np.int32))
        out_start.append(starts.astype(np.int64))
        out_stop.append(stops.astype(np.int64))
        out_depth.append(depth[starts])
    if not out_seq:
        z = np.zeros(0, dtype=np.int64)
        return CoverageRuns(z.astype(np.int32), z, z.copy(), z.copy())
    return CoverageRuns(
        np.concatenate(out_seq),
        np.concatenate(out_start),
        np.concatenate(out_stop),
        np.concatenate(out_depth),
    )


def spike_regions(
    runs: CoverageRuns, n_seqs: int, max_depth_stdev: int = 60
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Regions with depth > mean + k*stdev per sequence.

    Byte-faithful to genomeCovFilter.cpp:61-93: the mean/variance use
    the streaming length-weighted update (population variance), and the
    comparison is strict (depth > threshold).
    """
    mean = np.zeros(n_seqs)
    diff_power = np.zeros(n_seqs)
    count = np.zeros(n_seqs)
    for i in range(len(runs.seq)):
        s = runs.seq[i]
        ln = runs.stop[i] - runs.start[i]
        d = float(runs.depth[i])
        avg_diff = d - mean[s]
        new_mean = mean[s] + avg_diff * ln / (count[s] + ln)
        diff_power[s] += avg_diff**2 * ln * count[s] / (count[s] + ln)
        count[s] += ln
        mean[s] = new_mean
    variance = np.divide(diff_power, count, out=np.zeros_like(diff_power), where=count > 0)
    max_depth = mean + max_depth_stdev * np.sqrt(variance)

    flag = runs.depth > max_depth[runs.seq]
    return runs.seq[flag], runs.start[flag], runs.stop[flag]


def overlap_fraction(
    a_seq: np.ndarray,
    a_start: np.ndarray,
    a_stop: np.ndarray,
    r_seq: np.ndarray,
    r_start: np.ndarray,
    r_stop: np.ndarray,
) -> np.ndarray:
    """Fraction of each alignment interval covered by flagged regions
    (bedtools annotate equivalent)."""
    frac = np.zeros(len(a_seq))
    by_seq: Dict[int, List[int]] = {}
    for j in range(len(r_seq)):
        by_seq.setdefault(int(r_seq[j]), []).append(j)
    for s, idxs in by_seq.items():
        rs = r_start[idxs]
        re = r_stop[idxs]
        order = np.argsort(rs)
        rs, re = rs[order], re[order]
        am = np.flatnonzero(a_seq == s)
        for i in am:
            lo = np.searchsorted(re, a_start[i], "right")
            hi = np.searchsorted(rs, a_stop[i], "left")
            if hi <= lo:
                continue
            ov = np.minimum(re[lo:hi], a_stop[i]) - np.maximum(rs[lo:hi], a_start[i])
            span = a_stop[i] - a_start[i]
            if span > 0:
                frac[i] = ov[ov > 0].sum() / span
    return frac


def spike_read_filter(
    seq_lens: Sequence[int],
    aln_read: np.ndarray,  # read ids (any int key) per alignment
    aln_seq: np.ndarray,
    aln_start: np.ndarray,
    aln_stop: np.ndarray,
    max_depth_stdev: int = 60,
    overlap: float = 0.5,
) -> np.ndarray:
    """Read ids whose alignments overlap spike regions >= overlap.

    Mirrors runMegaPath.sh:215-221 (bamtobed -> genomecov -> filter ->
    annotate | awk $frac >= 0.5 -> read list).
    """
    runs = genome_coverage(seq_lens, aln_seq, aln_start, aln_stop)
    s_seq, s_start, s_stop = spike_regions(runs, len(seq_lens), max_depth_stdev)
    if len(s_seq) == 0:
        return np.zeros(0, dtype=aln_read.dtype)
    frac = overlap_fraction(aln_seq, aln_start, aln_stop, s_seq, s_start, s_stop)
    return np.unique(aln_read[frac >= overlap])
