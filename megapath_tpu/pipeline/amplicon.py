"""MegaPath-Amplicon pipeline (runMegaPath-Amplicon.sh equivalent).

The reference drives bwa-mem/GATK/pypy-realignment subprocesses
(/root/reference/runMegaPath-Amplicon.sh, scripts/amplicon/*): QC ->
human + decoy filters (AS/len ratio) -> taxon filter (top-AS hits must
include the target) -> alignment filter (AS>=150 & MAPQ>=10) ->
variant calling -> DeepVariant-style local realignment. Here every
alignment stage runs on the same batched engine, the realignment is
the batched dBG/SSW realigner (megapath_tpu.amplicon), and variant
candidates come from an in-process pileup over the final alignments
(the GATK HaplotypeCaller subprocess is replaced by pileup + local
reassembly, the same evidence model the realigner refines).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from megapath_tpu.align import AlignEngine, AlignParams, best_per_seq
from megapath_tpu.amplicon.realign import realign_window
from megapath_tpu.filters.bbduk import KmerRef, bbduk_pair
from megapath_tpu.index.fm import FMIndex
from megapath_tpu.index.pack import COMPLEMENT, PackedReference, decode_seq, pack_reads
from megapath_tpu.io.fastq import FastqRecord
from megapath_tpu.ops.dp import DPParams


@dataclass
class AmpliconConfig:
    min_len: int = 50
    as_over_len_ratio: float = 1.0  # decoy-stage filter (filter_bam.py)
    final_as: int = 150  # final alignment filter
    final_mapq: int = 10
    min_allele_frac: float = 0.2
    min_depth: int = 4
    realign_window_pad: int = 60
    max_read_len: int = 512


@dataclass
class Variant:
    seq: str
    pos: int  # 0-based
    ref: str
    alt: str
    depth: int
    alt_count: int


@dataclass
class AmpliconResult:
    n_input: int
    n_after_qc: int
    n_after_decoy: int
    n_after_taxon: int
    n_final: int
    variants: List[Variant]


class AmpliconPipeline:
    def __init__(
        self,
        target: Tuple[PackedReference, FMIndex],  # e.g. the TB reference
        target_seq_ids: Optional[Set[int]] = None,
        decoys: Sequence[Tuple[PackedReference, FMIndex]] = (),  # human, oral
        taxon_db: Optional[Tuple[PackedReference, FMIndex]] = None,  # refseq
        adapters: Optional[KmerRef] = None,
        config: Optional[AmpliconConfig] = None,
    ):
        self.cfg = config or AmpliconConfig()
        self.target_ref, self.target_fm = target
        self.target_engine = AlignEngine(self.target_ref, self.target_fm, AlignParams())
        self.target_seq_ids = target_seq_ids
        self.decoy_engines = [AlignEngine(r, f, AlignParams()) for r, f in decoys]
        self.taxon_engine = (
            AlignEngine(taxon_db[0], taxon_db[1], AlignParams())
            if taxon_db is not None
            else None
        )
        self.adapters = adapters

    # ------------------------------------------------------------------
    def run_records(
        self, recs1: List[FastqRecord], recs2: List[FastqRecord]
    ) -> AmpliconResult:
        cfg = self.cfg
        n_input = len(recs1)

        bb = bbduk_pair(recs1, recs2, self.adapters, min_len=cfg.min_len,
                        entropy_cutoff=0, max_len=cfg.max_read_len)
        recs1, recs2 = bb.kept1, bb.kept2
        n_qc = len(recs1)

        reads1, lens1 = pack_reads([r.seq for r in recs1], cfg.max_read_len)
        reads2, lens2 = pack_reads([r.seq for r in recs2], cfg.max_read_len)

        # decoy filters: drop pairs matching human/oral refs with
        # AS/len >= ratio (AS_over_len_ratio_filter, runMegaPath-
        # Amplicon.sh:61-81)
        keep = np.ones(n_qc, dtype=bool)
        for eng in self.decoy_engines:
            if not keep.any():
                break
            hits = eng.align_pairs(reads1, lens1, reads2, lens2)
            t = best_per_seq(hits, n_qc, megapath_mode=1)
            for i in range(n_qc):
                b1 = max(t[0][i].values(), default=0)
                b2 = max(t[1][i].values(), default=0)
                # per-end raw AS ~ score/2 for paired sums; use raw max
                r1l, r2l = max(int(lens1[i]), 1), max(int(lens2[i]), 1)
                if (b1 / (r1l + r2l) >= self.cfg.as_over_len_ratio) or (
                    b2 / (r1l + r2l) >= self.cfg.as_over_len_ratio
                ):
                    keep[i] = False
        idx = np.flatnonzero(keep)
        recs1 = [recs1[i] for i in idx]
        recs2 = [recs2[i] for i in idx]
        reads1, lens1 = reads1[idx], lens1[idx]
        reads2, lens2 = reads2[idx], lens2[idx]
        n_decoy = len(recs1)

        # taxon filter: keep reads whose top-scoring hits include the
        # target seq ids (get_highestAS_read_match_target.py)
        if self.taxon_engine is not None and self.target_seq_ids and n_decoy:
            hits = self.taxon_engine.align_pairs(reads1, lens1, reads2, lens2)
            t = best_per_seq(hits, n_decoy, megapath_mode=1)
            keep = np.zeros(n_decoy, dtype=bool)
            for i in range(n_decoy):
                for e in range(2):
                    d = t[e][i]
                    if not d:
                        continue
                    best = max(d.values())
                    tops = {s for s, sc in d.items() if sc == best}
                    if tops & self.target_seq_ids:
                        keep[i] = True
            idx = np.flatnonzero(keep)
            recs1 = [recs1[i] for i in idx]
            recs2 = [recs2[i] for i in idx]
            reads1, lens1 = reads1[idx], lens1[idx]
            reads2, lens2 = reads2[idx], lens2[idx]
        n_taxon = len(recs1)

        # final alignment vs the target; AS>=150 & MAPQ>=10 equivalent:
        # require a passing paired alignment with raw AS >= final_as
        final_hits = (
            self.target_engine.align_pairs(reads1, lens1, reads2, lens2)
            if n_taxon
            else None
        )
        variants: List[Variant] = []
        n_final = 0
        if final_hits is not None and len(final_hits.read):
            ok = final_hits.raw_score >= self.cfg.final_as
            n_final = len(np.unique(final_hits.read[ok]))
            variants = self._call_and_realign(
                final_hits, ok, recs1, recs2, reads1, lens1, reads2, lens2
            )
        return AmpliconResult(
            n_input=n_input,
            n_after_qc=n_qc,
            n_after_decoy=n_decoy,
            n_after_taxon=n_taxon,
            n_final=n_final,
            variants=variants,
        )

    # ------------------------------------------------------------------
    def assembly_filter(
        self,
        recs1: List[FastqRecord],
        recs2: List[FastqRecord],
        reads1: np.ndarray,
        lens1: np.ndarray,
        reads2: np.ndarray,
        lens2: np.ndarray,
        regions: Sequence[Tuple[int, int]],
        mean_mapq_thres: int = 10,
        k: int = 31,
    ) -> np.ndarray:
        """Per-amplicon-region assembly filter -> keep mask per pair.

        Mirrors the reference's assembly-filter stage
        (runMegaPath-Amplicon.sh:104-138 + scripts/amplicon/
        filter_contigs.py): reads mapping to each region assemble into
        contigs; a region's reads survive when they align to a
        credible contig (contig maps back to the region AND its reads
        average MAPQ >= thres) or fail to align to any contig; when no
        contig maps to the region at all, the whole region's reads are
        retained. MEGAHIT/bwa/minimap2/samtools subprocesses become
        the built-in unitig assembler + this engine.
        """
        from megapath_tpu.index.fm import build_fm_index
        from megapath_tpu.index.pack import pack_fasta
        from megapath_tpu.io.sam import bwa_single_mapq
        from megapath_tpu.pipeline.assembly import assemble_unitigs

        n = len(recs1)
        keep = np.zeros(n, dtype=bool)
        hits = self.target_engine.align_pairs(reads1, lens1, reads2, lens2)
        for rstart, rend in regions:
            rows = (hits.start < rend) & (hits.stop > rstart)
            rids = np.unique(hits.read[rows])
            if len(rids) == 0:
                continue
            seqs = [recs1[i].seq for i in rids] + [recs2[i].seq for i in rids]
            contigs = assemble_unitigs(seqs, k=k, min_count=2, min_len=100)
            # contigs that map back inside the region (seed check on
            # the target index; contigs assemble from real reads, so
            # exact seeds locate them)
            region_contigs: List[str] = []
            for cseq in contigs:
                probe = cseq[: self.cfg.max_read_len]
                codes, lens_ = pack_reads([probe], self.cfg.max_read_len)
                sp = self.target_engine.seed_positions(codes, lens_)
                if len(sp.pos) and (
                    (sp.pos >= rstart - 200) & (sp.pos < rend + 200)
                ).any():
                    region_contigs.append(cseq)
            if not region_contigs:
                keep[rids] = True  # no credible assembly: retain region
                continue
            # reads -> contigs: mean MAPQ per contig
            cref = pack_fasta(
                [FastqRecord(f"ctg{i}", s, "", "") for i, s in enumerate(region_contigs)]
            )
            cfm = build_fm_index(cref.codes, sa_interval=8, lut_k=8)
            ceng = AlignEngine(cref, cfm, AlignParams())
            chits = ceng.align_pairs(
                reads1[rids], lens1[rids], reads2[rids], lens2[rids]
            )
            # per-(read,end) BWA-like MAPQ over the contig hit set
            # (filter_contigs.py gates on bwa-mem MAPQ >= 10)
            read_mapq: dict = {}
            for rr in np.unique(chits.read):
                for ee in (0, 1):
                    m_ = (chits.read == rr) & (chits.end == ee)
                    if not m_.any():
                        continue
                    raws = chits.raw_score[m_]
                    best = raws.max()
                    x0 = int((raws == best).sum())
                    rest = raws[raws < best]
                    x1 = int((rest == rest.max()).sum()) if len(rest) else 0
                    read_mapq[(int(rr), ee)] = bwa_single_mapq(x0, x1)
            passed: set = set()
            for ci in range(len(region_contigs)):
                m = chits.seq == ci
                if not m.any():
                    continue
                mapqs = [
                    read_mapq[(int(r_), int(e_))]
                    for r_, e_ in zip(chits.read[m], chits.end[m])
                ]
                if np.mean(mapqs) >= mean_mapq_thres:
                    passed.add(ci)
            # retain reads aligned to passed contigs or unaligned to any
            aligned_reads = set(int(r) for r in np.unique(chits.read))
            for local_idx, rid in enumerate(rids):
                m = chits.read == local_idx
                if local_idx not in aligned_reads:
                    keep[rid] = True
                elif any(int(c) in passed for c in chits.seq[m]):
                    keep[rid] = True
        return keep

    # ------------------------------------------------------------------
    def run_files(self, r1_path, r2_path, out_prefix: str) -> AmpliconResult:
        """File driver: FASTQ pair in, ``<prefix>.vcf`` + stats out,
        with a ``.done`` resume marker like the reference driver's
        stage gates (runMegaPath-Amplicon.sh:85,203,241)."""
        import os
        import sys

        from megapath_tpu.io.fastq import read_fastx, trim_readno
        from megapath_tpu.io.vcf import write_vcf

        done = out_prefix + ".done"
        if os.path.exists(done):
            print(f"Skipping: {done} exists", file=sys.stderr)
            return AmpliconResult(0, 0, 0, 0, 0, [])
        recs1 = list(read_fastx(r1_path))
        recs2 = list(read_fastx(r2_path))
        for r in recs1 + recs2:
            r.name = trim_readno(r.name)
        result = self.run_records(recs1, recs2)
        contigs = [
            (name.split()[0], int(ln))
            for name, ln in zip(
                self.target_ref.names, np.diff(self.target_ref.offsets)
            )
        ]
        with open(out_prefix + ".vcf", "w") as f:
            write_vcf(result.variants, f, contigs=contigs)
        with open(done, "w") as f:
            f.write("ok\n")
        return result

    # ------------------------------------------------------------------
    def _call_and_realign(
        self, hits, ok, recs1, recs2, reads1, lens1, reads2, lens2
    ) -> List[Variant]:
        """Pileup SNP candidates + dBG/SSW realignment confirmation."""
        cfg = self.cfg
        ref = self.target_ref
        n = ref.total_len
        depth = np.zeros(n, dtype=np.int32)
        alt_counts: Dict[int, Dict[int, int]] = defaultdict(lambda: defaultdict(int))

        rows = np.flatnonzero(ok)
        for i in rows:
            r = int(hits.read[i])
            e = int(hits.end[i])
            strand = int(hits.strand[i])
            reads = reads1 if e == 0 else reads2
            lens = lens1 if e == 0 else lens2
            rl = int(lens[r])
            codes = reads[r, :rl]
            if strand:
                codes = COMPLEMENT[codes[::-1]]
            g0 = int(hits.start[i])
            g1 = int(hits.stop[i])
            span = min(g1 - g0, rl)
            depth[g0 : g0 + span] += 1
            seg = ref.codes[g0 : g0 + span]
            mism = np.flatnonzero(seg != codes[:span])
            for m in mism:
                alt_counts[g0 + int(m)][int(codes[m])] += 1

        out: List[Variant] = []
        for pos, alts in sorted(alt_counts.items()):
            d = int(depth[pos])
            if d < cfg.min_depth:
                continue
            alt, cnt = max(alts.items(), key=lambda kv: kv[1])
            if cnt < cfg.min_allele_frac * d:
                continue
            # realignment confirmation around the site
            pad = cfg.realign_window_pad
            w0 = max(0, pos - pad)
            w1 = min(n, pos + pad)
            window = decode_seq(ref.codes[w0:w1])
            support = self._window_reads(hits, ok, w0, w1, reads1, lens1, reads2, lens2)
            if support:
                ra = realign_window(window, support, k=21)
                # variant confirmed if any non-ref haplotype won reads
                ref_idx = ra.haplotypes.index(window) if window in ra.haplotypes else 0
                if (ra.best_hap == ref_idx).all():
                    # all reads fit the reference haplotype: drop
                    continue
            seq_idx, local = ref.local_pos(np.array([pos]))
            out.append(
                Variant(
                    seq=ref.names[int(seq_idx[0])],
                    pos=int(local[0]),
                    ref="ACGT"[int(ref.codes[pos])],
                    alt="ACGT"[alt],
                    depth=d,
                    alt_count=int(cnt),
                )
            )
        return out

    def _window_reads(
        self, hits, ok, w0, w1, reads1, lens1, reads2, lens2
    ) -> List[str]:
        rows = np.flatnonzero(ok & (hits.start < w1) & (hits.stop > w0))
        out = []
        for i in rows[:64]:
            r = int(hits.read[i])
            e = int(hits.end[i])
            strand = int(hits.strand[i])
            reads = reads1 if e == 0 else reads2
            lens = lens1 if e == 0 else lens2
            rl = int(lens[r])
            codes = reads[r, :rl]
            if strand:
                codes = COMPLEMENT[codes[::-1]]
            out.append(decode_seq(codes))
        return out
