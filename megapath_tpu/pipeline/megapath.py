"""End-to-end MegaPath pipeline driver (runMegaPath.sh equivalent).

One process, arrays end-to-end: preprocess (bbduk) -> human filter ->
NT alignment across shards (concurrent, hit lists merged in arrays
instead of the reference's cfq-comment chaining) -> SPIKE coverage
filter -> taxid lookup -> reassignment -> Kraken-style reports.

Stage semantics follow /root/reference/runMegaPath.sh:105-265; the
inter-stage LSAM text round-trips are internalized, with writers
available for drop-in compatibility at every boundary.
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from megapath_tpu.align import AlignEngine, AlignParams, best_per_seq
from megapath_tpu.align.engine import BatchHits
from megapath_tpu.align.params import MmpParams
from megapath_tpu.classify.reassign import Reassigner
from megapath_tpu.filters.bbduk import KmerRef, bbduk_pair
from megapath_tpu.filters.spike import spike_read_filter
from megapath_tpu.index.fm import FMIndex
from megapath_tpu.index.pack import PackedReference, pack_reads
from megapath_tpu.io.fastq import FastqRecord, read_fastx, trim_readno
from megapath_tpu.io.lsam import LsamRecord, _fmt_score
from megapath_tpu.taxonomy.report import KrakenReport
from megapath_tpu.taxonomy.taxdb import TaxDB, get_correct_acc, remove_version

HG_PARAMS = AlignParams(mmp=MmpParams(seed_min_length=22, reseed_len=23))
NT_PARAMS = AlignParams()


@dataclass
class PipelineConfig:
    read_len: int = 150
    min_len: int = 50
    entropy: float = 0.75
    nt_cutoff: int = 40
    spike_stdev: int = 60
    spike_overlap: float = 0.5
    top_percentage: float = 0.95
    skip_preprocess: bool = False
    skip_human: bool = False
    device_seeding: bool = False
    max_read_len: int = 512

    @property
    def hg_cutoff(self) -> int:
        return self.read_len * 3 // 5  # runMegaPath.sh:78


@dataclass
class PipelineResult:
    report: str
    ra_report: str
    lsam_id: List[LsamRecord]
    ra_lsam_id: List[LsamRecord]
    n_input_pairs: int = 0
    n_after_preprocess: int = 0
    n_after_human: int = 0
    spike_removed: int = 0


class MegaPathPipeline:
    def __init__(
        self,
        nt_shards: Sequence[Tuple[PackedReference, FMIndex]],
        taxdb: TaxDB,
        hg_shard: Optional[Tuple[PackedReference, FMIndex]] = None,
        adapters: Optional[KmerRef] = None,
        config: Optional[PipelineConfig] = None,
    ):
        self.cfg = config or PipelineConfig()
        self.taxdb = taxdb
        self.adapters = adapters
        self.nt_engines = [
            AlignEngine(ref, fm, NT_PARAMS.with_(top_percentage=self.cfg.top_percentage),
                        device_seeding=self.cfg.device_seeding)
            for ref, fm in nt_shards
        ]
        self.hg_engine = (
            AlignEngine(hg_shard[0], hg_shard[1], HG_PARAMS,
                        device_seeding=self.cfg.device_seeding)
            if hg_shard is not None
            else None
        )
        # per-shard seq -> species taxid (and superkingdom), vectorized
        # lookup tables for the array merge path (-1 = unknown acc)
        self._species_of: List[np.ndarray] = []
        self._sk_of: List[np.ndarray] = []
        for ref, _ in nt_shards:
            sp = np.full(len(ref.names), -1, dtype=np.int64)
            sk = np.zeros(len(ref.names), dtype=np.int64)
            for j, name in enumerate(ref.names):
                acc = remove_version(get_correct_acc(name))
                tid = taxdb.acc2tid.get(acc)
                if tid is not None:
                    sp[j] = taxdb.pop_to_species(tid)
                    sk[j] = taxdb.superkingdom_of(tid)
            self._species_of.append(sp)
            self._sk_of.append(sk)

    # ------------------------------------------------------------------
    def run_files(self, r1_path, r2_path, out_prefix: str) -> PipelineResult:
        """File driver with stage-level resume markers: a
        ``<prefix>.done`` skips completed work on rerun, like the
        reference's .done gates (runMegaPath.sh:109-110)."""
        from megapath_tpu.utils.timing import StageTimer

        done = out_prefix + ".done"
        if os.path.exists(done):
            import sys

            print(f"Skipping: {done} exists", file=sys.stderr)
            return PipelineResult("", "", [], [])

        timer = StageTimer()
        with timer.stage("read-input"):
            recs1 = list(read_fastx(r1_path))
            recs2 = list(read_fastx(r2_path))
            for r in recs1 + recs2:
                r.name = trim_readno(r.name)
        with timer.stage("pipeline"):
            result = self.run_records(recs1, recs2)
        with timer.stage("write-output"):
            with open(out_prefix + ".nt.report", "w") as f:
                f.write(result.report)
            with open(out_prefix + ".nt.ra.report", "w") as f:
                f.write(result.ra_report)
            with open(out_prefix + ".nt.lsam.id", "w") as f:
                for rec in result.lsam_id:
                    f.write(rec.to_line() + "\n")
        with open(done, "w") as f:
            f.write("ok\n")
        return result

    # ------------------------------------------------------------------
    def run_records(
        self, recs1: List[FastqRecord], recs2: List[FastqRecord]
    ) -> PipelineResult:
        cfg = self.cfg
        n_input = len(recs1)

        # -- 0. preprocess (bbduk passes, runMegaPath.sh:119) ----------
        if not cfg.skip_preprocess:
            bb = bbduk_pair(
                recs1,
                recs2,
                self.adapters,
                min_len=cfg.min_len,
                trimq=10,
                entropy_cutoff=cfg.entropy,
                max_len=cfg.max_read_len,
            )
            recs1, recs2 = bb.kept1, bb.kept2
        n_pre = len(recs1)

        # -- pack ------------------------------------------------------
        reads1, lens1 = pack_reads([r.seq for r in recs1], cfg.max_read_len)
        reads2, lens2 = pack_reads([r.seq for r in recs2], cfg.max_read_len)

        # -- 1. human filter (runMegaPath.sh:128-153) ------------------
        if self.hg_engine is not None and not cfg.skip_human and n_pre:
            hits = self.hg_engine.align_pairs(reads1, lens1, reads2, lens2)
            table = best_per_seq(hits, n_pre, megapath_mode=1)
            cut = cfg.hg_cutoff
            best1 = np.array([max(table[0][i].values(), default=0) for i in range(n_pre)])
            best2 = np.array([max(table[1][i].values(), default=0) for i in range(n_pre)])
            # extractFromLSAM.pl:69 keeps the pair when EITHER end is
            # below the cutoff
            keep = (best1 < cut) | (best2 < cut)
            kidx = np.flatnonzero(keep)
            recs1 = [recs1[i] for i in kidx]
            recs2 = [recs2[i] for i in kidx]
            reads1, lens1 = reads1[kidx], lens1[kidx]
            reads2, lens2 = reads2[kidx], lens2[kidx]
        n_hg = len(recs1)

        # -- 2. NT alignment over all shards (concurrent merge) --------
        per_shard_hits: List[BatchHits] = []
        for engine in self.nt_engines:
            per_shard_hits.append(
                engine.align_pairs(reads1, lens1, reads2, lens2)
                if n_hg
                else BatchHits.empty()
            )

        # -- SPIKE filter (runMegaPath.sh:211-221) ---------------------
        spike_removed = self._spike_banned(per_shard_hits, n_hg)
        n_spiked = len(spike_removed)

        # -- array hit merge + taxid lookup (taxLookupAcc) -------------
        # Everything downstream (reassign counting, LCA, reports) runs
        # on flat arrays; LsamRecord objects materialize only for the
        # returned LSAM views. Rows are sorted by (read, end, species);
        # a "line" is one read end, gid = read*2 + end.
        n = n_hg
        read, end, sp, sk, score, best = self._merge_arrays(
            per_shard_hits, n
        )
        keep_read = np.ones(n, dtype=bool)
        if spike_removed:
            keep_read[list(spike_removed)] = False
        rows_keep = keep_read[read] if len(read) else np.zeros(0, bool)
        read, end, sp, sk, score = (
            read[rows_keep], end[rows_keep], sp[rows_keep],
            sk[rows_keep], score[rows_keep],
        )
        gid = (read.astype(np.int64) * 2 + end).astype(np.int64)
        line_scores = best.T.reshape(-1)  # [2n]: index r*2+e

        # -- 3. reassignment + reports (runMegaPath.sh:235-265) --------
        ra = Reassigner(t=float(cfg.nt_cutoff))
        ra.count_grouped(sp, gid, line_scores)
        ra.resolve()
        drop = ra.explained_rows(sp, gid, 2 * n)

        line_mask = np.repeat(keep_read, 2)
        report = self._report_arrays(sp, gid, line_scores, line_mask, n)
        ra_report = self._report_arrays(
            sp[~drop], gid[~drop], line_scores, line_mask, n
        )

        lsam_id = self._build_lsam_records(
            recs1, recs2, keep_read, best, read, end, sp, sk, score
        )
        ra_lsam = self._build_lsam_records(
            recs1, recs2, keep_read, best,
            read[~drop], end[~drop], sp[~drop], sk[~drop], score[~drop],
            reassigned=True,
            sk_full=(read, end, sk),
        )
        return PipelineResult(
            report=report,
            ra_report=ra_report,
            lsam_id=lsam_id,
            ra_lsam_id=ra_lsam,
            n_input_pairs=n_input,
            n_after_preprocess=n_pre,
            n_after_human=n_hg,
            spike_removed=n_spiked,
        )

    def _spike_banned(
        self, per_shard_hits: List[BatchHits], n_reads: int
    ) -> set:
        banned: set = set()
        for engine, hits in zip(self.nt_engines, per_shard_hits):
            if not len(hits):
                continue
            seq_lens = np.diff(engine.ref.offsets)
            off = engine.ref.offsets[hits.seq]
            bad = spike_read_filter(
                seq_lens.tolist(),
                hits.read,
                hits.seq,
                hits.start - off,
                hits.stop - off,
                max_depth_stdev=self.cfg.spike_stdev,
                overlap=self.cfg.spike_overlap,
            )
            banned.update(int(b) for b in bad)
        return banned

    def _merge_arrays(
        self, per_shard_hits: List[BatchHits], n: int
    ) -> Tuple[np.ndarray, ...]:
        """Array merge across shards -> species hits per read end.

        Equivalent of the cfq-comment chain + taxLookupAcc: per
        (end, read) keep max score per species, apply the
        top-percentage retention against the per-end best. Returns
        (read, end, sp, sk, score) rows sorted by (read, end, sp) plus
        the [2, n] per-end best-score table.
        """
        from megapath_tpu.align.output import best_per_seq_arrays

        top = self.cfg.top_percentage

        reads_l, ends_l, sp_l, sk_l, sc_l = [], [], [], [], []
        for si, hits in enumerate(per_shard_hits):
            r, e, q, s = best_per_seq_arrays(hits, megapath_mode=1)
            reads_l.append(r)
            ends_l.append(e)
            sp_l.append(self._species_of[si][q])
            sk_l.append(self._sk_of[si][q])
            sc_l.append(s)
        if reads_l:
            read = np.concatenate(reads_l)
            end = np.concatenate(ends_l)
            sp = np.concatenate(sp_l)
            sk = np.concatenate(sk_l)
            score = np.concatenate(sc_l).astype(np.int64)
        else:
            read = np.zeros(0, np.int32)
            end = np.zeros(0, np.int8)
            sp = sk = np.zeros(0, np.int64)
            score = np.zeros(0, np.int64)

        # per (end, read) best over ALL hits, unknown accessions
        # included: taxLookupAcc passes the LSAM score column through
        # even when no hit maps to a species (taxLookupAcc.cpp:62-92),
        # and the -top retention compares against this best
        best = np.zeros((2, n), dtype=np.int64)
        if len(read):
            np.maximum.at(
                best, (end.astype(np.int64), read.astype(np.int64)), score
            )

        known = sp >= 0
        read, end, sp, sk, score = (
            read[known], end[known], sp[known], sk[known], score[known]
        )
        if len(read):
            # best per (end, read, species)
            order = np.lexsort((-score, sp, read, end))
            read, end, sp, sk, score = (
                read[order], end[order], sp[order], sk[order], score[order]
            )
            first = np.r_[
                True,
                (read[1:] != read[:-1]) | (end[1:] != end[:-1]) | (sp[1:] != sp[:-1]),
            ]
            read, end, sp, sk, score = (
                read[first], end[first], sp[first], sk[first], score[first]
            )
            # -top retention against the all-hits best computed above
            keep = score >= best[end.astype(np.int64), read.astype(np.int64)] * top
            read, end, sp, sk, score = (
                read[keep], end[keep], sp[keep], sk[keep], score[keep]
            )
            # canonical (read, end, species) row order
            order = np.lexsort((sp, end, read))
            read, end, sp, sk, score = (
                read[order], end[order], sp[order], sk[order], score[order]
            )
        return read, end, sp, sk, score, best

    def _report_arrays(
        self,
        sp: np.ndarray,
        gid: np.ndarray,
        line_scores: np.ndarray,
        line_mask: np.ndarray,
        n: int,
    ) -> str:
        """Kraken report from hit rows: per-line LCA (vectorized group
        fold), lines below the cutoff or without hits unclassified
        (genKrakenReport.cpp:148-156)."""
        lca_full = np.zeros(2 * n, dtype=np.int64)
        has = np.zeros(2 * n, dtype=bool)
        if len(sp):
            pres = np.unique(gid)
            lca_full[pres] = self.taxdb.lca_grouped(sp, gid)
            has[pres] = True
        scores_eff = np.where(has, line_scores, -1)[line_mask]
        rpt = KrakenReport(self.taxdb)
        rpt.add_lsam_batch(
            scores_eff, lca_full[line_mask], self.cfg.nt_cutoff
        )
        return rpt.format()

    def _build_lsam_records(
        self, recs1, recs2, keep_read, best,
        read, end, sp, sk, score,
        reassigned: bool = False,
        sk_full=None,
    ) -> List[LsamRecord]:
        """Materialize LSAM.id records from merged rows (sorted by
        (read, end, sp)). ``reassigned`` masks seq/qual to '*' like the
        reassign tool; ``sk_full`` supplies the pre-reassign rows whose
        superkingdom set labels the opts column (the reference keeps
        the original annotation columns through reassign)."""
        db = self.taxdb
        groups: Dict[Tuple[int, int], slice] = {}
        if len(read):
            bounds = np.flatnonzero(
                np.r_[True, (read[1:] != read[:-1]) | (end[1:] != end[:-1])]
            )
            for gi, b in enumerate(bounds):
                e_ = bounds[gi + 1] if gi + 1 < len(bounds) else len(read)
                groups[(int(read[b]), int(end[b]))] = slice(b, e_)
        sk_groups: Dict[Tuple[int, int], List[str]] = {}
        if sk_full is not None:
            fr, fe, fsk = sk_full
            if len(fr):
                bounds = np.flatnonzero(
                    np.r_[True, (fr[1:] != fr[:-1]) | (fe[1:] != fe[:-1])]
                )
                for gi, b in enumerate(bounds):
                    e_ = bounds[gi + 1] if gi + 1 < len(bounds) else len(fr)
                    sks = sorted(set(int(x) for x in fsk[b:e_]) - {0})
                    sk_groups[(int(fr[b]), int(fe[b]))] = [
                        db.name_of(t) for t in sks
                    ]

        out: List[LsamRecord] = []
        for i in range(len(recs1)):
            if not keep_read[i]:
                continue
            for e_, recs in ((0, recs1), (1, recs2)):
                rec = recs[i]
                g = groups.get((i, e_))
                if sk_full is not None:
                    opts = sk_groups.get((i, e_), [])
                elif g is not None:
                    sks = sorted(set(int(x) for x in sk[g]) - {0})
                    opts = [db.name_of(t) for t in sks]
                else:
                    opts = []
                seq = "*" if reassigned else rec.seq
                qual = "*" if reassigned else rec.qual
                hits = (
                    [(float(s_), str(int(t))) for s_, t in zip(score[g], sp[g])]
                    if g is not None
                    else []
                )
                out.append(
                    LsamRecord(
                        name=rec.name,
                        flag=0x40 if e_ == 0 else 0x80,
                        score=int(best[e_, i]),
                        seq=seq,
                        qual=qual,
                        hits=hits,
                        opts=opts,
                    )
                )
        return out
