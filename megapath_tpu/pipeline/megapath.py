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

        # -- array hit merge + taxid lookup (taxLookupAcc) -------------
        lsam_id = self._merge_to_lsam_id(
            recs1, recs2, per_shard_hits, spike_removed, n_hg
        )
        n_spiked = len(spike_removed)

        # -- 3. reassignment + reports (runMegaPath.sh:235-265) --------
        ra = Reassigner(t=float(cfg.nt_cutoff))
        for rec in lsam_id:
            ra.count_line(rec.to_line())
        ra.resolve()
        ra_lsam = [
            LsamRecord(
                name=r.name,
                flag=r.flag,
                score=r.score,
                seq="*",
                qual="*",
                hits=[(float(int(s)), t) for s, t in r.hits if not self._explained(ra, r.hits, t)],
                opts=r.opts,
            )
            for r in lsam_id
        ]

        report = self._report(lsam_id)
        ra_report = self._report(ra_lsam)
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

    # ------------------------------------------------------------------
    @staticmethod
    def _explained(ra: Reassigner, hits, target) -> bool:
        tid = int(float(target))
        return any(
            (int(float(other)), tid) in ra.explains for _, other in hits
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

    def _merge_to_lsam_id(
        self,
        recs1: List[FastqRecord],
        recs2: List[FastqRecord],
        per_shard_hits: List[BatchHits],
        spike_banned: set,
        n: int,
    ) -> List[LsamRecord]:
        """Array merge across shards -> species hits per read end.

        Equivalent of the cfq-comment chain + taxLookupAcc: per
        (end, read) keep max score per species, apply the
        top-percentage retention against the per-end best.
        """
        from megapath_tpu.align.output import best_per_seq_arrays

        top = self.cfg.top_percentage
        db = self.taxdb

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
        if len(read) == 0:
            groups: Dict[Tuple[int, int], slice] = {}
            return self._build_lsam_records(
                recs1, recs2, spike_banned, n, best, groups,
                read, end, sp, sk, score,
            )
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

        # group rows per (read, end) for record building
        order = np.lexsort((sp, end, read))
        read, end, sp, sk, score = (
            read[order], end[order], sp[order], sk[order], score[order]
        )
        bounds = np.flatnonzero(
            np.r_[True, (read[1:] != read[:-1]) | (end[1:] != end[:-1])]
        )
        groups: Dict[Tuple[int, int], slice] = {}
        for gi, b in enumerate(bounds):
            e_ = bounds[gi + 1] if gi + 1 < len(bounds) else len(read)
            groups[(int(read[b]), int(end[b]))] = slice(b, e_)
        return self._build_lsam_records(
            recs1, recs2, spike_banned, n, best, groups,
            read, end, sp, sk, score,
        )

    def _build_lsam_records(
        self, recs1, recs2, spike_banned, n, best, groups,
        read, end, sp, sk, score,
    ) -> List[LsamRecord]:
        db = self.taxdb
        out: List[LsamRecord] = []
        for i in range(n):
            if i in spike_banned:
                continue
            for e_, recs in ((0, recs1), (1, recs2)):
                rec = recs[i]
                g = groups.get((i, e_))
                if g is None:
                    out.append(
                        LsamRecord(rec.name, 0x40 if e_ == 0 else 0x80,
                                   int(best[e_, i]), rec.seq, rec.qual, [], [])
                    )
                    continue
                sks = sorted(set(int(x) for x in sk[g]) - {0})
                out.append(
                    LsamRecord(
                        name=rec.name,
                        flag=0x40 if e_ == 0 else 0x80,
                        score=int(best[e_, i]),
                        seq=rec.seq,
                        qual=rec.qual,
                        hits=[(float(s_), str(int(t))) for s_, t in zip(score[g], sp[g])],
                        opts=[db.name_of(t) for t in sks],
                    )
                )
        return out

    def _report(self, lsam_id: List[LsamRecord]) -> str:
        rpt = KrakenReport(self.taxdb)
        for rec in lsam_id:
            tids = (
                [int(float(t)) for _, t in rec.hits]
                if rec.score >= self.cfg.nt_cutoff
                else []
            )
            rpt.add_read(tids)
        return rpt.format()
