"""Digital normalization to a target depth (bbnorm equivalent).

Replaces jgi/KmerNormalize.java (runMegaPath.sh:279 ``bbnorm
target=70`` before assembly): a count-min sketch estimates each read's
k-mer depth; reads whose estimated depth exceeds the target are
discarded probabilistically so surviving coverage approaches the
target. Used only on the optional assembly path (-A).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator, List, Sequence, Tuple

import numpy as np

from megapath_tpu.index.pack import encode_seq


@dataclass
class CountMinSketch:
    width: int = 1 << 22
    depth: int = 3
    seed: int = 7

    def __post_init__(self):
        self.table = np.zeros((self.depth, self.width), dtype=np.uint16)
        rng = np.random.default_rng(self.seed)
        self._salts = rng.integers(1, 2**61 - 1, self.depth, dtype=np.uint64)

    def _rows(self, kmers: np.ndarray) -> np.ndarray:
        h = kmers[None, :] * self._salts[:, None]
        h ^= h >> np.uint64(29)
        h *= np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(32)
        return (h % np.uint64(self.width)).astype(np.int64)

    def add(self, kmers: np.ndarray) -> None:
        rows = self._rows(kmers)
        for d in range(self.depth):
            np.add.at(self.table[d], rows[d], 1)

    def estimate(self, kmers: np.ndarray) -> np.ndarray:
        rows = self._rows(kmers)
        est = self.table[0][rows[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.table[d][rows[d]])
        return est


def _read_kmers(seq: str, k: int) -> np.ndarray:
    codes = encode_seq(seq)
    n = len(codes)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    out = np.empty(n - k + 1, dtype=np.uint64)
    val = np.uint64(0)
    mask = np.uint64((1 << (2 * k)) - 1)
    for i in range(n):
        val = ((val << np.uint64(2)) | np.uint64(codes[i])) & mask
        if i >= k - 1:
            out[i - k + 1] = val
    return out


def normalize_pairs(
    seqs1: Sequence[str],
    seqs2: Sequence[str],
    target: int = 70,
    k: int = 31,
    seed: int = 7,
) -> np.ndarray:
    """Keep mask over pairs, normalizing k-mer depth to ``target``.

    Single-pass like bbnorm's one-table mode: estimate a pair's median
    k-mer depth from the sketch so far; keep with probability
    target/depth (deterministic hash-based so runs reproduce), then add
    its k-mers.
    """
    cms = CountMinSketch(seed=seed)
    rng = np.random.default_rng(seed)
    keep = np.zeros(len(seqs1), dtype=bool)
    for i, (a, b) in enumerate(zip(seqs1, seqs2)):
        km = np.concatenate([_read_kmers(a, k), _read_kmers(b, k)])
        if len(km) == 0:
            keep[i] = True
            continue
        depth = float(np.median(cms.estimate(km)))
        if depth <= target or rng.random() < target / depth:
            keep[i] = True
            cms.add(km)
    return keep
