#!/usr/bin/env python
"""Generate the AC-DIAMOND blastx parity fixture.

Builds a synthetic protein DB + DNA contigs (exact / mutated / reverse
-strand / junk), runs the VENDORED reference binary
(/root/reference/ac-diamond-0.1-beta-linux64/ac-diamond, the one
runMegaPath.sh:312-316 calls) and pins its m8 output as the golden.

NOTE: the binary crashes with heap corruption when given -t <tmpdir>
on this machine; invoked without -t it runs correctly (sanity: every
planted contig hits its source protein, junk contigs hit nothing).

Usage: python tests/fixtures/make_protein_fixtures.py
"""

from __future__ import annotations

import os
import subprocess
import sys
from itertools import product

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "protein")
ACD = "/root/reference/ac-diamond-0.1-beta-linux64/ac-diamond"

AA = "ARNDCQEGHILKMFPSTWYV"
TABLE = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
BASES = "TCAG"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(2025)

    prots = []
    for i in range(12):
        L = int(rng.integers(180, 350))
        prots.append("".join(AA[j] for j in rng.integers(0, 20, L)))
    with open(os.path.join(OUT, "prot.fa"), "w") as f:
        for i, p in enumerate(prots):
            f.write(f">prot{i}\n{p}\n")

    codons = {}
    for n, (a, b, c) in enumerate(product(BASES, repeat=3)):
        codons.setdefault(TABLE[n], []).append(a + b + c)

    def rev_translate(pep):
        return "".join(
            codons[a][int(rng.integers(0, len(codons[a])))] for a in pep
        )

    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    contigs = []
    for i in range(12):
        src = int(rng.integers(0, len(prots)))
        p = prots[src]
        s = int(rng.integers(0, len(p) - 80))
        dna = rev_translate(p[s : s + 80])
        if i % 3 == 1:  # a few point mutations
            dna = list(dna)
            for _ in range(6):
                q = int(rng.integers(0, len(dna)))
                dna[q] = "ACGT"[int(rng.integers(0, 4))]
            dna = "".join(dna)
        if i % 4 == 3:  # reverse strand
            dna = "".join(comp[c] for c in reversed(dna))
        contigs.append((f"contig{i:02d}_src{src}", dna))
    for i in range(4):
        contigs.append((
            f"contig{12+i:02d}_junk",
            "".join("ACGT"[j] for j in rng.integers(0, 4, 240)),
        ))
    with open(os.path.join(OUT, "contigs.fa"), "w") as f:
        for n_, d in contigs:
            f.write(f">{n_}\n{d}\n")

    subprocess.run(
        [ACD, "makedb", "--in", "prot.fa", "-d", "nr", "-p", "2"],
        cwd=OUT, check=True, capture_output=True,
    )
    subprocess.run(
        [ACD, "blastx", "-p", "1", "-q", "contigs.fa", "-d", "nr",
         "-a", "acd_out"],
        cwd=OUT, check=True, capture_output=True,
    )
    subprocess.run(
        [ACD, "view", "-a", "acd_out.daa", "-o", "acd.m8"],
        cwd=OUT, check=True, capture_output=True,
    )
    for junkf in ("nr.dmnd", "nr.fsize", "nr.ssize", "acd_out.daa"):
        p = os.path.join(OUT, junkf)
        if os.path.exists(p):
            os.remove(p)
    lines = open(os.path.join(OUT, "acd.m8")).read().splitlines()
    print(f"wrote {OUT}/acd.m8 with {len(lines)} hits")
    for ln in lines:
        print(" ", ln)


if __name__ == "__main__":
    main()
