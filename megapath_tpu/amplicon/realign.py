"""Window realignment: reads vs candidate haplotypes via batched SSW.

Equivalent of the reference's realigner.cpp + ssw.c flow
(/root/reference/scripts/realignment/): per variant window, build
candidate haplotypes (de Bruijn consensus), score every read against
every haplotype with affine-gap local alignment, assign reads to their
best haplotype, and project read positions back to reference
coordinates through the haplotype<->reference alignment. The striped
SSE2 SW kernel becomes one batched device DP call over the
(reads x haplotypes) cross product.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from megapath_tpu.amplicon.debruijn import candidate_haplotypes
from megapath_tpu.index.pack import encode_seq
from megapath_tpu.ops.dp import DPParams, sw_align, sw_traceback

# ssw defaults used by the reference realigner (realign_illumina_reads
# passes match=4, mismatch=6, gapO=8, gapE=2 scaled; we keep the
# classic SSW defaults here and expose params)
SSW_PARAMS = DPParams(match=4, mismatch=-6, gap_open=-8, gap_extend=-2)


@dataclass
class WindowRealignment:
    haplotypes: List[str]
    best_hap: np.ndarray  # int32 [n_reads] index into haplotypes
    scores: np.ndarray  # int32 [n_reads, n_haps]
    read_pos: np.ndarray  # int32 [n_reads] window-relative new start (-1 unaligned)
    cigars: List[str]


def _pad_batch(seqs: Sequence[str], L: int) -> Tuple[np.ndarray, np.ndarray]:
    out = np.zeros((len(seqs), L), dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        c = encode_seq(s[:L])
        out[i, : len(c)] = c
        lens[i] = len(c)
    return out, lens


def realign_window(
    ref_window: str,
    reads: Sequence[str],
    k: int = 21,
    min_edge_weight: int = 2,
    params: DPParams = SSW_PARAMS,
    compute_cigars: bool = True,
) -> WindowRealignment:
    """Realign reads in one window against dBG candidate haplotypes."""
    haps = candidate_haplotypes(ref_window, reads, k=k, min_edge_weight=min_edge_weight)
    n_r, n_h = len(reads), len(haps)
    if n_r == 0:
        return WindowRealignment(haps, np.zeros(0, np.int32), np.zeros((0, n_h), np.int32), np.zeros(0, np.int32), [])

    Lr = max(len(r) for r in reads)
    Lh = max(len(h) for h in haps)
    reads_arr, read_lens = _pad_batch(reads, Lr)
    haps_arr, hap_lens = _pad_batch(haps, Lh)

    # cross product batch: read i vs hap j at row i*n_h + j
    R = np.repeat(reads_arr, n_h, axis=0)
    RL = np.repeat(read_lens, n_h)
    H = np.tile(haps_arr, (n_r, 1))
    HL = np.tile(hap_lens, n_r)
    res = sw_align(R, H, RL, HL, params=params)
    scores = np.asarray(res.score).reshape(n_r, n_h)
    ends_ref = np.asarray(res.end_ref).reshape(n_r, n_h)
    ends_read = np.asarray(res.end_read).reshape(n_r, n_h)

    best = scores.argmax(axis=1).astype(np.int32)

    # align each chosen haplotype to the reference window once, to map
    # haplotype coordinates back to window coordinates
    hap_to_ref: List[Optional[Tuple[int, int, str]]] = []
    ref_codes = encode_seq(ref_window)
    for h in haps:
        hc = encode_seq(h)
        hres = sw_align(
            hc[None, :], ref_codes[None, :],
            np.array([len(hc)], np.int32), np.array([len(ref_codes)], np.int32),
            params=params,
        )
        he = int(np.asarray(hres.end_ref)[0])
        hj = int(np.asarray(hres.end_read)[0])
        si, sj, cig, _ = sw_traceback(hc[:hj], ref_codes[:he], he, hj, params)
        hap_to_ref.append((si - sj, he, cig))  # approx: ref offset of hap start

    read_pos = np.full(n_r, -1, np.int32)
    cigars: List[str] = []
    for i in range(n_r):
        j = int(best[i])
        if scores[i, j] <= 0:
            cigars.append("*")
            continue
        er, ej = int(ends_ref[i, j]), int(ends_read[i, j])
        if compute_cigars:
            hc = encode_seq(haps[j])
            rc = encode_seq(reads[i])
            si, sj, cig, _ = sw_traceback(rc[:ej], hc[:er], er, ej, params)
            cigars.append(cig)
            hap_start = si
        else:
            cigars.append("*")
            hap_start = er - ej
        ref_off = hap_to_ref[j][0]
        read_pos[i] = ref_off + hap_start
    return WindowRealignment(haps, best, scores, read_pos, cigars)
