"""Minimal VCF 4.2 output for the amplicon pipeline.

The reference's amplicon driver ends in a realigned VCF
(/root/reference/runMegaPath-Amplicon.sh:240-264,
scripts/realignment/extract_vcf_position.py); here the pipeline's
confirmed variants serialize directly.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, TextIO, Tuple


def write_vcf(
    variants: Iterable,  # pipeline.amplicon.Variant ducks: seq/pos/ref/alt/depth/alt_count
    out: TextIO,
    contigs: Optional[Sequence[Tuple[str, int]]] = None,
    sample: str = "SAMPLE",
    source: str = "megapath-tpu-amplicon",
) -> None:
    out.write("##fileformat=VCFv4.2\n")
    out.write(f"##source={source}\n")
    if contigs:
        for name, length in contigs:
            out.write(f"##contig=<ID={name},length={length}>\n")
    out.write('##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">\n')
    out.write(
        '##INFO=<ID=AC,Number=1,Type=Integer,Description="Alt read count">\n'
    )
    out.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n')
    out.write('##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Allele depths">\n')
    out.write(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + sample + "\n"
    )
    for v in variants:
        frac = v.alt_count / v.depth if v.depth else 0.0
        gt = "1/1" if frac > 0.8 else "0/1"
        ref_depth = max(v.depth - v.alt_count, 0)
        out.write(
            f"{v.seq.split()[0]}\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t"
            f"{min(99, int(frac * 100))}\tPASS\t"
            f"DP={v.depth};AC={v.alt_count}\tGT:AD\t{gt}:{ref_depth},{v.alt_count}\n"
        )
