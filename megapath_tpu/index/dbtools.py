"""Offline reference-DB construction utilities.

Compact equivalents of the reference's cc/ DB tools
(/root/reference/cc/: maskLowerWithN, mask_with_N, filterExistingSeq,
ribosomeDedup, prepareKrakenFasta, splitFasta via index.shard).
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Set, Tuple

from megapath_tpu.io.fastq import FastqRecord, read_fastx


def mask_lowercase_with_n(rec: FastqRecord) -> FastqRecord:
    """Soft-masked (lowercase) bases -> N (maskLowerWithN)."""
    seq = "".join("N" if c.islower() else c for c in rec.seq)
    return FastqRecord(rec.name, seq, rec.qual, rec.comment)


def mask_intervals_with_n(
    rec: FastqRecord, intervals: Sequence[Tuple[int, int]]
) -> FastqRecord:
    """Mask [start, end) intervals to N (mask_with_N over a bed)."""
    s = list(rec.seq)
    for a, b in intervals:
        for i in range(max(0, a), min(len(s), b)):
            s[i] = "N"
    return FastqRecord(rec.name, "".join(s), rec.qual, rec.comment)


def filter_existing(
    records: Iterable[FastqRecord], existing_names: Set[str]
) -> Iterator[FastqRecord]:
    """Drop sequences whose accession is already present
    (filterExistingSeq)."""
    for rec in records:
        if rec.name.split(".")[0] not in existing_names:
            yield rec


def dedup_sequences(records: Iterable[FastqRecord]) -> Iterator[FastqRecord]:
    """Exact-sequence dedup, keeping the first occurrence
    (ribosomeDedup)."""
    seen: Set[bytes] = set()
    for rec in records:
        h = hashlib.sha1(rec.seq.encode()).digest()
        if h not in seen:
            seen.add(h)
            yield rec


def prepare_kraken_fasta(
    records: Iterable[FastqRecord], acc2tid: Dict[str, int]
) -> Iterator[FastqRecord]:
    """Prefix headers with kraken:taxid|NNN| (prepareKrakenFasta)."""
    for rec in records:
        tid = acc2tid.get(rec.name.split(".")[0])
        name = f"kraken:taxid|{tid}|{rec.name}" if tid else rec.name
        yield FastqRecord(name, rec.seq, rec.qual, rec.comment)
