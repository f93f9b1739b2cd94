"""Accuracy evaluation vs simulated truth (calcAccuracy.pl equivalent).

The reference scores sensitivity/FDR of classification output against a
simulated read set whose read names encode the source genome
(/root/reference/calcAccuracy.pl, cc/masonAccuracy.cpp). Reads are
truth-labeled by a name->taxid function; a read is a true positive when
its reported hit set contains the truth taxid (or an ancestor within
``rank_slack`` of it).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Iterable, List, Optional, Set

from megapath_tpu.io.lsam import LsamRecord
from megapath_tpu.taxonomy.taxdb import TaxDB


@dataclass
class AccuracyStats:
    tp: int = 0
    fp: int = 0
    fn: int = 0
    unclassified: int = 0

    @property
    def sensitivity(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else 0.0

    @property
    def fdr(self) -> float:
        d = self.tp + self.fp
        return self.fp / d if d else 0.0


def evaluate(
    records: Iterable[LsamRecord],
    truth_of: Callable[[str], Optional[int]],
    db: TaxDB,
    score_threshold: int = 40,
    match_at_species: bool = True,
) -> AccuracyStats:
    st = AccuracyStats()
    for rec in records:
        truth = truth_of(rec.name)
        if truth is None:
            continue
        truth_sp = db.pop_to_species(truth) if match_at_species else truth
        hits = (
            {int(float(t)) for _, t in rec.hits}
            if rec.score >= score_threshold
            else set()
        )
        if not hits:
            st.unclassified += 1
            st.fn += 1
            continue
        hit_sp = {db.pop_to_species(t) if match_at_species else t for t in hits}
        if truth_sp in hit_sp:
            st.tp += 1
            if len(hit_sp) > 1:
                st.fp += len(hit_sp) - 1
        else:
            st.fn += 1
            st.fp += len(hit_sp)
    return st
