#!/usr/bin/env python
"""Generate golden test fixtures by running the *reference* MegaPath tools.

Run manually on a machine where the reference cc tools are built (e.g.
/tmp/refbuild/cc). The generated goldens are committed; tests never invoke
the reference. Usage:

    python tests/fixtures/make_fixtures.py --cc-bin /tmp/refbuild/cc
"""

from __future__ import annotations

import argparse
import os
import random
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


# ---------------------------------------------------------------------------
# Mini taxonomy:   1 (root)
#                  ├─ 2 Bacteria (superkingdom)
#                  │   └─ 1224 Proteobacteria (phylum)
#                  │       └─ 543 Enterobacteriaceae (family)
#                  │           └─ 561 Escherichia (genus)
#                  │               └─ 562 Escherichia coli (species)
#                  │                   └─ 83333 E. coli K-12 (strain)
#                  │           └─ 590 Salmonella (genus)
#                  │               └─ 28901 Salmonella enterica (species)
#                  └─ 10239 Viruses (superkingdom)
#                      └─ 11118 Coronaviridae (family)
#                          └─ 694002 Betacoronavirus (genus)
#                              └─ 694009 SARSr-CoV (species)
#                              └─ 11137 HCoV-229E (species)  [genus 693996]
#                  └─ 2759 Eukaryota (superkingdom)
#                      └─ 9606 Homo sapiens (species, genus 9605)
# ---------------------------------------------------------------------------
NODES = [
    (1, 1, "no rank"),
    (2, 131567, "superkingdom"),
    (131567, 1, "no rank"),
    (1224, 2, "phylum"),
    (1236, 1224, "class"),
    (91347, 1236, "order"),
    (543, 91347, "family"),
    (561, 543, "genus"),
    (562, 561, "species"),
    (83333, 562, "strain"),
    (590, 543, "genus"),
    (28901, 590, "species"),
    (59201, 28901, "subspecies"),
    (10239, 1, "superkingdom"),
    (11118, 10239, "family"),
    (694002, 11118, "genus"),
    (694009, 694002, "species"),
    (693996, 11118, "genus"),
    (11137, 693996, "species"),
    (2759, 131567, "superkingdom"),
    (9604, 2759, "family"),
    (9605, 9604, "genus"),
    (9606, 9605, "species"),
]

NAMES = {
    1: "root",
    2: "Bacteria",
    131567: "cellular organisms",
    1224: "Proteobacteria",
    1236: "Gammaproteobacteria",
    91347: "Enterobacterales",
    543: "Enterobacteriaceae",
    561: "Escherichia",
    562: "Escherichia coli",
    83333: "Escherichia coli K-12",
    590: "Salmonella",
    28901: "Salmonella enterica",
    59201: "Salmonella enterica subsp. enterica",
    10239: "Viruses",
    11118: "Coronaviridae",
    694002: "Betacoronavirus",
    694009: "Severe acute respiratory syndrome-related coronavirus",
    693996: "Alphacoronavirus",
    11137: "Human coronavirus 229E",
    2759: "Eukaryota",
    9604: "Hominidae",
    9605: "Homo",
    9606: "Homo sapiens",
}

ACC2TID = {
    "NC_000913": 83333,   # E. coli K-12 -> pops to species 562
    "NC_003197": 59201,   # S. enterica subsp -> pops to 28901
    "NC_045512": 694009,  # SARS-CoV-2-ish
    "NC_002645": 11137,   # HCoV-229E
    "NC_000001": 9606,    # human chr1
    "AE005174": 562,      # E. coli O157 (already species)
}


def write_taxdump(outdir: str) -> None:
    with open(os.path.join(outdir, "nodes.dmp"), "w") as f:
        for tid, parent, rank in NODES:
            f.write(f"{tid}\t|\t{parent}\t|\t{rank}\t|\t\n")
    with open(os.path.join(outdir, "names.dmp"), "w") as f:
        for tid, name in NAMES.items():
            f.write(f"{tid}\t|\t{name}\t|\t\t|\tscientific name\t|\n")
            f.write(f"{tid}\t|\tsynonym {tid}\t|\t\t|\tsynonym\t|\n")
    with open(os.path.join(outdir, "acc2tid.map"), "w") as f:
        f.write("accession\taccession.version\ttaxid\tgi\n")
        for acc, tid in ACC2TID.items():
            f.write(f"{acc}\t{acc}.1\t{tid}\t0\n")


def write_cfq(outdir: str) -> str:
    """Interleaved cfq with SCORE comments over the mini accession set."""
    rng = random.Random(42)
    path = os.path.join(outdir, "mini.cfq")
    reads = []
    # (name, comment) pairs; both mates share name, different hits
    cases = [
        ("read_ecoli_1", "SCORE:180;180,NC_000913.1;171,AE005174.1;", "SCORE:180;180,NC_000913.1;"),
        ("read_salm_1", "SCORE:150;150,NC_003197.1;", "SCORE:150;143,NC_003197.1;150,NC_000913.1;"),
        ("read_cov_1", "SCORE:95;95,NC_045512.1;", "SCORE:95;95,NC_045512.1;91,NC_002645.1;"),
        ("read_multi_1", "SCORE:120;120,NC_000913.1,AE005174.1;114,NC_003197.1;", "SCORE:120;120,NC_000913.1;"),
        ("read_low_1", "SCORE:25;25,NC_002645.1;", "SCORE:25;25,NC_002645.1;"),
        ("read_unmap_1", "SCORE:0;", "SCORE:0;"),
        ("read_ignore_1", "IGNORE", "IGNORE"),
        ("read_human_1", "SCORE:160;160,NC_000001.1;", "SCORE:160;152,NC_000001.1;"),
    ]
    with open(path, "w") as f:
        for name, c1, c2 in cases:
            for comment in (c1, c2):
                seq = "".join(rng.choice("ACGT") for _ in range(50))
                qual = "".join(chr(33 + rng.randrange(40)) for _ in range(50))
                f.write(f"@{name}\t{comment}\n{seq}\n+\n{qual}\n")
        # an unpaired singleton
        seq = "".join(rng.choice("ACGT") for _ in range(50))
        qual = "I" * 50
        f.write(f"@read_single_1\tSCORE:70;70,NC_003197.1;66,AE005174.1;\n{seq}\n+\n{qual}\n")
    return path


def run(cmd, stdin_path=None, stdout_path=None, **kw):
    fin = open(stdin_path, "rb") if stdin_path else subprocess.DEVNULL
    out = open(stdout_path, "wb") if stdout_path else None
    try:
        subprocess.run(cmd, stdin=fin, stdout=out, check=True, **kw)
    finally:
        if out:
            out.close()
        if fin is not subprocess.DEVNULL:
            fin.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cc-bin", default="/tmp/refbuild/cc")
    args = ap.parse_args()
    cc = args.cc_bin

    outdir = HERE
    write_taxdump(outdir)
    cfq = write_cfq(outdir)

    nodes = os.path.join(outdir, "nodes.dmp")
    names = os.path.join(outdir, "names.dmp")
    acc2tid = os.path.join(outdir, "acc2tid.map")

    lsam = os.path.join(outdir, "golden.lsam")
    run([os.path.join(cc, "fastq2lsam"), "1"], stdin_path=cfq, stdout_path=lsam)

    lsam_id = os.path.join(outdir, "golden.lsam.id")
    run(
        [os.path.join(cc, "taxLookupAcc"), acc2tid, nodes, names, lsam],
        stdout_path=lsam_id,
        stderr=subprocess.DEVNULL,
    )

    report = os.path.join(outdir, "golden.report")
    run(
        [os.path.join(cc, "genKrakenReport"), nodes, names, lsam_id, "40"],
        stdout_path=report,
    )

    ra = os.path.join(outdir, "golden.ra.lsam.id")
    run(
        [os.path.join(cc, "reassign"), "-t", "40", lsam_id],
        stdout_path=ra,
        stderr=subprocess.DEVNULL,
    )

    ra_report = os.path.join(outdir, "golden.ra.report")
    run(
        [os.path.join(cc, "genKrakenReport"), nodes, names, ra, "40"],
        stdout_path=ra_report,
    )

    print("fixtures written to", outdir)


if __name__ == "__main__":
    main()
