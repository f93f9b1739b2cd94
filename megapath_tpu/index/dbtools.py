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


def split_ref_to_reads(
    records: Iterable[FastqRecord], read_len: int, overlap: int
) -> Iterator[FastqRecord]:
    """Chop reference sequences into overlapping pseudo-reads
    (/root/reference/cc/split_ref_to_reads.cpp): windows step by
    ``overlap`` with a final window flushed to the sequence end; names
    get a ``_<offset>`` suffix."""
    for rec in records:
        n = len(rec.seq)
        i = 0
        while True:
            if i + read_len > n:
                i = max(0, n - read_len)
            yield FastqRecord(
                f"{rec.name}_{i}", rec.seq[i : i + read_len], "", ""
            )
            if i + read_len >= n:
                break
            i += overlap


def revcomp_fastx(records: Iterable[FastqRecord]) -> Iterator[FastqRecord]:
    """Reverse-complement records (cc/revCompFastx.cpp); quality
    strings reverse alongside."""
    comp = str.maketrans("ACGTacgtNn", "TGCAtgcaNn")
    for rec in records:
        yield FastqRecord(
            rec.name,
            rec.seq.translate(comp)[::-1],
            rec.qual[::-1] if rec.qual else "",
            rec.comment,
        )


def smart_pairing(
    records: Iterable[FastqRecord],
) -> Tuple[Iterator, list]:
    """Group a name-sorted stream into interleaved pairs + singles
    (cc/smart_pairing.cpp): consecutive same-name records pair up (/1
    /2 suffixes stripped), everything else is single-end. Returns
    (pairs list interleaved, singles list)."""
    from megapath_tpu.io.fastq import trim_readno

    pairs: list = []
    singles: list = []
    last: Optional[FastqRecord] = None
    for rec in records:
        rec.name = trim_readno(rec.name)
        if last is not None:
            if last.name == rec.name:
                pairs.extend((last, rec))
                last = None
            else:
                singles.append(last)
                last = rec
        else:
            last = rec
    if last is not None:
        singles.append(last)
    return pairs, singles
