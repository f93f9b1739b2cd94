"""The FULL alignment engine as one SPMD program over a (data x shard) mesh.

Unlike ``parallel.spmd`` (a reduced engine: one SA position per seed,
best pair per orientation, no single-end stage), this module runs the
complete ``align.engine`` semantics inside ``shard_map`` with static
caps, so its per-shard hit tables are row-for-row equal to
``AlignEngine.align_pairs`` on the same inputs — the property the
cascade byte-parity tests assert. Stages, each matching its host/
reference counterpart:

  1. device MMP seeding            (seeding_jax / DV-DPfunctions.cpp:2404-2615)
  2. multi SA-locate per seed      (decode_seeds / :2475-2487, up to
                                    sa_size_threshold+1 rows per interval)
  3. fuzz clustering + unique/coverage filter
                                   (decode_seeds / :2488-2552)
  4. divide-gap compress + insert-window join, both orientations
                                   (pairing.pair_candidates / :1968-2119)
  5. fused deep-DP, conditional right leg, normalizeScore
                                   (engine._deep_dp / :2790-3540,
                                    BGS-IO.cpp:1949-1964)
  6. single-end DP (200 cap) + mate rescue + unpaired output
                                   (engine._single_and_rescue /
                                    DV-DPForSingleReads.cpp, DV-SemiDP.cpp)

Per-shard FM indexes are the TRUE per-shard builds (not padded-text
rebuilds): array leaves are padded to a common allocation and the text
length / primary ride as traced scalars, so every rank query sees
exactly the host shard's tables — the precondition for byte parity.

Static caps (positions/candidates/SE rows) keep shapes compile-time
fixed; each block reports an overflow flag so a too-small cap is a loud
error, never silent truncation.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from megapath_tpu.align.params import AlignParams
from megapath_tpu.align.seeding_jax import (
    DeviceFM,
    device_locate,
    device_mmp_seed,
    device_mmp_seed_staged,
)
from megapath_tpu.index.fm import FMIndex
from megapath_tpu.ops.dp import DPParams, sw_align_auto

_seed_fn = device_mmp_seed.__wrapped__
_seed_staged_fn = device_mmp_seed_staged.__wrapped__
_locate_fn = device_locate.__wrapped__

OFF_TEXT_CODE = 4
# NOTE: jax_enable_x64 is off in this deployment — every device value
# here must fit int32. Composite sort keys are therefore expressed as
# jnp.lexsort over int32 columns, and the host's packed-key
# searchsorted joins become segmented binary searches (_seg_search).
I32_HUGE = np.int32(2**31 - 1)


def _seg_search(arr, lo, hi, target, strict):
    """Per-row binary search: first index j in [lo, hi) with
    arr[j] > target (strict) / arr[j] >= target (not strict); hi if
    none. ``arr`` must be ascending within each [lo, hi) window."""
    n = arr.shape[0]
    steps = int(np.ceil(np.log2(max(n, 2)))) + 1

    def body(_, c):
        lo_, hi_ = c
        mid = (lo_ + hi_) // 2
        v = arr[jnp.clip(mid, 0, n - 1)]
        go_right = (v <= target) if strict else (v < target)
        alive = lo_ < hi_
        return (
            jnp.where(alive & go_right, mid + 1, lo_),
            jnp.where(alive & ~go_right, mid, hi_),
        )

    lo_f, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo_f


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class StackedFMPad(NamedTuple):
    """True per-shard FM tables, leaf-padded to a common allocation.

    Unlike ``spmd.StackedFM`` (which requires equal text lengths via
    padded-text rebuilds), these are the SAME indexes the host cascade
    uses; per-shard scalars (n, primary, n_marked) are traced."""

    bwt_words: jnp.ndarray  # [S, nw_max] uint32
    fused_rows: jnp.ndarray  # [S, R_max, C] uint32
    counts: jnp.ndarray  # [S, 5] int32
    mark_rows: jnp.ndarray  # [S, nm_max, 2] uint32 word+rank
    sa_sampled: jnp.ndarray  # [S, ns_max] int32
    primary: jnp.ndarray  # [S] int32
    n: jnp.ndarray  # [S] int32 true text length


class FMMetaPad(NamedTuple):
    lut_k: int
    sa_interval: int
    blk: int = 64  # fused-row occ block granularity (DeviceFM.blk)


def stack_fms_exact(fms: Sequence[FMIndex]) -> Tuple[StackedFMPad, FMMetaPad]:
    """Stack per-shard FM indexes with array-leaf padding (rows beyond
    each shard's true tables are never addressed: every query index is
    bounded by the traced per-shard n)."""
    metas = {(fm.lut_k, fm.sa_interval) for fm in fms}
    if len(metas) != 1:
        raise ValueError("shard FM build parameters differ")
    dfms = [DeviceFM.from_host(fm) for fm in fms]
    if len({d.blk for d in dfms}) != 1:
        raise ValueError("shard FM fused-row layouts differ")
    meta = FMMetaPad(
        lut_k=dfms[0].lut_k, sa_interval=dfms[0].sa_interval,
        blk=dfms[0].blk,
    )

    def pad_stack(arrs, dtype):
        arrs = [np.asarray(a) for a in arrs]
        shape = tuple(
            max(a.shape[d] for a in arrs) for d in range(arrs[0].ndim)
        )
        out = np.zeros((len(arrs),) + shape, dtype=dtype)
        for i, a in enumerate(arrs):
            out[(i,) + tuple(slice(0, s) for s in a.shape)] = a
        return jnp.asarray(out)

    stacked = StackedFMPad(
        bwt_words=pad_stack([d.bwt_words for d in dfms], np.uint32),
        fused_rows=pad_stack([d.fused_rows for d in dfms], np.uint32),
        counts=pad_stack([d.counts for d in dfms], np.int32),
        mark_rows=pad_stack([d.mark_rows for d in dfms], np.uint32),
        sa_sampled=pad_stack([d.sa_sampled for d in dfms], np.int32),
        primary=jnp.asarray([d.primary for d in dfms], jnp.int32),
        n=jnp.asarray([d.n for d in dfms], jnp.int32),
    )
    return stacked, meta


class SpmdCaps(NamedTuple):
    """Static shape caps, as multiples of the local pair count Bl
    (fractional factors allowed; rows round up to a 1024 grain so the
    Pallas DP's 128-row blocking always divides)."""

    pos_factor: float = 16  # decoded SA positions per block
    cand_factor: float = 8  # paired candidates per orientation
    se_factor: float = 4  # single-end DP rows
    hit_factor: float = 6  # compacted output hit rows
    dp_factor: float = 4  # compacted deep-DP candidate rows (both orients)
    rescue_factor: float = 2  # compacted mate-rescue rows (passing anchors)


# measured occupancy on the 512 Mbp bench workload (tools/spmd_probe):
# real positions ~6/pair, deep-DP candidates ~2.5/pair, SE rows and
# passing rescue anchors near zero on matching-heavy batches — the
# default caps pay for padding (rescue alone: 2*Bl rows x 896-wide
# windows = +1.9 s/pass at Bl=20480). The pipeline backend tries this
# LEAN preset first and falls back to the robust defaults on overflow.
LEAN_CAPS = SpmdCaps(
    pos_factor=8, cand_factor=4, se_factor=0.5, hit_factor=4,
    # stage-4 probe token on the bench workload: 18329 real candidates
    # for Bl=20480 (~0.9/pair); 1.25*Bl keeps a 1.4x margin
    dp_factor=1.25, rescue_factor=0.25,
)


def _capn(factor: float, Bl: int) -> int:
    """factor * Bl rounded UP to the 1024 grain (>= 1024)."""
    return max(1024, ((int(factor * Bl) + 1023) // 1024) * 1024)


class SpmdHits(NamedTuple):
    """Per-(data, shard) block hit table; fields [D, S, H] after the
    shard_map, matching align.engine.BatchHits columns + valid.

    H is the COMPACTED cap (caps.hit_factor * Bl): valid rows are
    packed to the front in their original assembly order inside the
    program, so the per-chip output payload is proportional to real
    hits (~2-4 rows/pair on matching shards), not to the ~40*Bl
    internal candidate rows — the grouped-payload bound SCALING.md's
    ICI math assumes. Row content is untouched (no -top prefilter), so
    the host tail (SPIKE coverage, merge, retention) sees exactly the
    rows the host engine produces."""

    valid: jnp.ndarray
    read: jnp.ndarray  # local pair index within the data block
    end: jnp.ndarray
    seq: jnp.ndarray
    score: jnp.ndarray
    raw_score: jnp.ndarray
    start: jnp.ndarray  # shard-text coords (== host global coords)
    stop: jnp.ndarray
    strand: jnp.ndarray
    paired: jnp.ndarray
    overflow: jnp.ndarray  # [D, S] cap overflow indicator (0 = ok)


def _chain_anchors(first, nxt, seg_end, valid):
    """Anchor-chain transitive closure (the pointer-jumping loop the
    host decode/pairing uses): from each segment's first row, repeatedly
    jump to the first row past the gap window. Returns the anchor mask."""
    Pn = first.shape[0]

    def cond(c):
        return jnp.any(c[1])

    def body(c):
        anchor, frontier = c
        t = jnp.where(frontier & valid, nxt, Pn)
        t = jnp.where(t < seg_end, t, Pn)
        nf = jnp.zeros(Pn + 1, bool).at[t].set(True)[:Pn]
        nf = nf & ~anchor & valid
        return anchor | nf, nf

    anchor, _ = jax.lax.while_loop(cond, body, (first & valid, first & valid))
    return anchor


def build_spmd_full_engine(
    mesh: Mesh,
    meta: FMMetaPad,
    read_len: int,
    params: AlignParams = AlignParams(),
    caps: SpmdCaps = SpmdCaps(),
    max_seqs: int = 64,
    stage_stop: int = 0,
    staged_walk: bool = True,
    plan_fast: bool = False,
):
    """Compile the full engine step over the mesh.

    Global inputs (S = mesh['shard'], B = global pairs, D = data rows):
      sfm leaves      [S, ...]   P('shard', ...)
      ref_codes       [S, N]     P('shard', None) (leaf-padded texts)
      seq_offsets     [S, M+1]   P('shard', None), HUGE past true M+1
      reads1/reads2   [B, L]     P('data', None)
      lens1/lens2     [B]        P('data')
    Returns SpmdHits with [D, S, H] fields (+ [D, S] overflow).

    ``stage_stop`` (probe-only, tools/spmd_probe.py): truncate the
    program after stage k (1=walk, 2=locate, 3=cluster, 4=pair,
    5=deep-DP, 6=SE, 7=rescue) and return a stub whose ``overflow``
    carries a live checksum (so XLA cannot DCE the probed stages);
    0 = the real full program.
    """
    L = read_len
    if len(params.seeding_rounds) != 1:
        raise NotImplementedError("spmd_full supports single-round seeding")
    mmp = params.mmp
    max_seeds = int(min(16, max(4, L // 16 + 2)))
    dp = DPParams(params.match, params.mismatch, params.gap_open,
                  params.gap_extend)
    Wwin = _round_up(L + 2 * 30 + 2, 64)
    Wse = _round_up(L + 62, 64)
    Wrescue = _round_up(int(params.insert_high) + L + 62, 128)
    thr_of = lambda lens: jnp.maximum(
        (params.cutoff_ratio * lens).astype(jnp.int32),
        jnp.int32(params.cutoff_lower_bound),
    )

    from megapath_tpu.align.device import gather_windows_packed

    def local_step(fm_leaves, primary, true_n, ref_local, seq_off,
                   reads1, reads2, lens1, lens2):
        dfm = DeviceFM(
            n=true_n[0],
            primary=primary[0],
            bwt_words=fm_leaves[0][0],
            fused_rows=fm_leaves[1][0],
            counts=fm_leaves[2][0],
            lut_k=meta.lut_k,
            mark_rows=fm_leaves[3][0],
            sa_sampled=fm_leaves[4][0],
            sa_interval=meta.sa_interval,
            blk=meta.blk,
        )
        ref = ref_local[0]
        offs = seq_off[0].astype(jnp.int32)  # [M+1+pad], I32_HUGE past true
        Bl = reads1.shape[0]
        n2 = 2 * Bl
        lens1i = lens1.astype(jnp.int32)
        lens2i = lens2.astype(jnp.int32)

        P_cap = _capn(caps.pos_factor, Bl)
        C_cap = _capn(caps.cand_factor, Bl)
        SE_cap = _capn(caps.se_factor, Bl)
        overflow = jnp.int32(0)

        def stub(tok):
            """stage_stop probe return: zeros + live checksum."""
            Hc = _capn(caps.hit_factor, Bl)
            z = jnp.zeros(Hc, jnp.int32)[None, None, :]
            return (
                (jnp.zeros(Hc, bool)[None, None, :],)
                + (z,) * 8
                + (jnp.zeros(Hc, bool)[None, None, :],)
                + (tok.astype(jnp.int32)[None, None],)
            )

        # ---- 1. seeding over [r1; r2; rc r1; rc r2] ------------------
        allr = jnp.concatenate([reads1, reads2], axis=0)
        all_lens = jnp.concatenate([lens1i, lens2i])
        from megapath_tpu.align.seeding_jax import build_walkers

        walkers, wlens = build_walkers(allr, all_lens)  # [4Bl, L]
        if staged_walk:
            # the host engine's ROBUST on-device straggler compaction
            # (production-safe caps: active fractions hold for junk-
            # heavy batches too) — the unstaged full-width walk was
            # the largest single cost of the one-program path. A
            # staged-cap overflow marks the block (loud; the pipeline
            # backend retries the batch through an unstaged build).
            from megapath_tpu.align.engine import AlignEngine

            plan = AlignEngine._seed_seg_plan(
                4 * Bl, L, fast=plan_fast, two_phase=(meta.blk < 128)
            )
            chg = 3 * L + 64
            seeds, w_oflow = _seed_staged_fn(
                dfm, walkers, wlens, mmp, max_seeds,
                max_steps=(2 * chg + 128 if meta.blk < 128 else chg),
                seg_plan=plan, two_phase=(meta.blk < 128),
                charge_limit=chg,
            )
            overflow = jnp.maximum(overflow, w_oflow.astype(jnp.int32))
        else:
            chg = 3 * L + 64
            seeds, _ = _seed_fn(
                dfm, walkers, wlens, mmp, max_seeds=max_seeds,
                max_steps=(2 * chg + 128 if meta.blk < 128 else chg),
                two_phase=(meta.blk < 128), charge_limit=chg,
            )
        if stage_stop == 1:
            return stub(
                seeds.n_seeds.astype(jnp.int32).sum() + seeds.sa_lo.sum()
            )

        # ---- 2. multi SA-locate (up to sa_size_threshold+1 per seed) -
        slots = jnp.arange(max_seeds, dtype=jnp.int32)[None, :]
        sv = slots < seeds.n_seeds[:, None].astype(jnp.int32)
        cnt2 = jnp.where(sv, seeds.sa_count.astype(jnp.int32), 0)
        cnt = cnt2.reshape(-1)  # [4Bl*max_seeds]
        cum = jnp.cumsum(cnt)
        total = cum[-1]
        overflow = jnp.maximum(overflow, (total > P_cap).astype(jnp.int32))
        j = jnp.arange(P_cap, dtype=jnp.int32)
        sidx = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
        sidx = jnp.clip(sidx, 0, cnt.shape[0] - 1)
        pvalid = j < total
        within = j - (cum[sidx] - cnt[sidx])
        rows = jnp.where(
            pvalid, seeds.sa_lo.reshape(-1)[sidx] + within, 0
        )
        pos = _locate_fn(dfm, rows.astype(jnp.int32), meta.sa_interval)
        if stage_stop == 2:
            return stub(pos.sum())
        walker = sidx // max_seeds
        s_off = seeds.offset.reshape(-1)[sidx].astype(jnp.int32)
        s_len = seeds.length.reshape(-1)[sidx].astype(jnp.int32)
        s_cnt = cnt[sidx]
        start = pos - s_off
        rlen = wlens[walker]
        unique = (s_len >= mmp.good_seed_len) | (s_len >= rlen // 2)
        mult = jnp.where(unique, 1, s_cnt)

        # ---- 3. fuzz clustering + unique/coverage filter -------------
        # sort by (valid desc, walker, start); pads land at the end
        order = jnp.lexsort((start, walker, ~pvalid))
        walker_s = jnp.where(pvalid[order], walker[order], jnp.int32(1 << 24))
        start_s = start[order]
        off_s = s_off[order]
        len_s = s_len[order]
        mult_s = mult[order]
        valid_s = pvalid[order]

        first = jnp.concatenate(
            [jnp.ones(1, bool), walker_s[1:] != walker_s[:-1]]
        )
        seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1
        iota = jnp.arange(P_cap, dtype=jnp.int32)
        seg_end = jax.ops.segment_max(
            iota + 1, seg_id, num_segments=P_cap
        )[seg_id]
        # nxt[i] = first j in the walker segment with start > start+fuzz
        nxt = _seg_search(
            start_s, iota, seg_end, start_s + mmp.indel_fuzz, strict=True
        )
        anchor = _chain_anchors(first, nxt, seg_end, valid_s)
        anchor = anchor | ~valid_s  # pad rows: own (invalid) clusters
        cid = jnp.cumsum(anchor.astype(jnp.int32)) - 1

        # merged coverage per cluster (union of [off, off+len) intervals,
        # members iterated in (cluster, off) order — decode_seeds).
        # Segmented running max via associative_scan on (flag, value).
        o2 = jnp.lexsort((off_s, cid))
        cid2 = cid[o2]
        s2 = off_s[o2]
        e2 = jnp.where(valid_s[o2], (off_s + len_s)[o2], off_s[o2])
        first2 = jnp.concatenate(
            [jnp.ones(1, bool), cid2[1:] != cid2[:-1]]
        )

        def seg_op(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))

        _, run_max = jax.lax.associative_scan(seg_op, (first2, e2))
        prev = jnp.where(
            first2, 0, jnp.concatenate([e2[:1], run_max[:-1]])
        )
        add = jnp.maximum(0, e2 - jnp.maximum(s2, prev))
        cov = jax.ops.segment_sum(add, cid2, num_segments=P_cap)
        uniq_flag = (
            (mult_s <= mmp.uniq_threshold) & (len_s >= mmp.seed_min_length)
            & valid_s
        )
        has_unique = jax.ops.segment_max(
            uniq_flag.astype(jnp.int32), cid, num_segments=P_cap
        ) > 0
        cl_valid = jax.ops.segment_max(
            valid_s.astype(jnp.int32), cid, num_segments=P_cap
        ) > 0
        cl_walker = jax.ops.segment_min(
            jnp.where(valid_s, walker_s, jnp.int32(1 << 24)),
            cid, num_segments=P_cap,
        )
        cl_pos = jax.ops.segment_min(
            jnp.where(valid_s, start_s, jnp.int32(1 << 30)),
            cid, num_segments=P_cap,
        )
        re = jnp.where(cl_valid, cl_walker % n2, 0)
        best_cov = jax.ops.segment_max(
            jnp.where(cl_valid, cov, 0), re, num_segments=n2
        )
        cl_keep = cl_valid & (
            has_unique | (cov >= mmp.good_seed_len)
        ) & (
            cov.astype(jnp.float32)
            >= mmp.short_seed_ratio * best_cov[re].astype(jnp.float32)
        )
        cl_strand = jnp.where(cl_valid, (cl_walker >= n2), False)
        cl_pair = jnp.where(re < Bl, re, re - Bl)
        cl_end = (re >= Bl).astype(jnp.int32)
        if stage_stop == 3:
            return stub(
                cl_keep.astype(jnp.int32).sum()
                + jnp.where(cl_keep, cl_pos, 0).sum()
            )

        # ---- 4. divide-gap compress + insert-window join -------------
        iota_p = jnp.arange(P_cap, dtype=jnp.int32)

        def orient(flip):
            # left leg: + strand of end ``flip``; right: - strand of the
            # other end (pair_candidates)
            lmask = cl_keep & ~cl_strand & (cl_end == flip)
            rmask = cl_keep & cl_strand & (cl_end == 1 - flip)
            lorder = jnp.lexsort((cl_pos, cl_pair, ~lmask))
            lpair = cl_pair[lorder]
            lpos = cl_pos[lorder]
            lvalid = lmask[lorder]
            lfirst = jnp.concatenate(
                [jnp.ones(1, bool),
                 (lpair[1:] != lpair[:-1]) | (lvalid[1:] != lvalid[:-1])]
            )
            lseg_id = jnp.cumsum(lfirst.astype(jnp.int32)) - 1
            lseg_end = jax.ops.segment_max(
                iota_p + 1, lseg_id, num_segments=P_cap
            )[lseg_id]
            nxtl = _seg_search(
                lpos, iota_p, lseg_end, lpos + params.divide_gap,
                strict=True,
            )
            lkeep = _chain_anchors(lfirst, nxtl, lseg_end, lvalid)

            rorder = jnp.lexsort((cl_pos, cl_pair, ~rmask))
            rpos_s = cl_pos[rorder]
            rpair_s = jnp.where(rmask[rorder], cl_pair[rorder], 0)
            ridx = jnp.where(rmask[rorder], iota_p, P_cap)
            rlo_p = jax.ops.segment_min(ridx, rpair_s, num_segments=Bl)
            rhi_p = jax.ops.segment_max(
                jnp.where(rmask[rorder], iota_p + 1, 0), rpair_s,
                num_segments=Bl,
            )
            rlo = rlo_p[jnp.clip(lpair, 0, Bl - 1)]
            rhi = jnp.maximum(rhi_p[jnp.clip(lpair, 0, Bl - 1)], rlo)

            # window bounds use the RIGHT read's length
            rl = (lens2i if flip == 0 else lens1i)[lpair]
            margin = jnp.where(rl > 100, 30, 25)
            len_lo = jnp.maximum(0, params.insert_low - rl - margin)
            len_hi = params.insert_high - rl + margin
            s_ = _seg_search(rpos_s, rlo, rhi, lpos + len_lo, strict=False)
            e_ = _seg_search(rpos_s, rlo, rhi, lpos + len_hi, strict=True)
            cnts = jnp.where(lkeep & lvalid, e_ - s_, 0).astype(jnp.int32)
            ccum = jnp.cumsum(cnts)
            ctotal = ccum[-1]
            ov = (ctotal > C_cap).astype(jnp.int32)
            jj = jnp.arange(C_cap, dtype=jnp.int32)
            li = jnp.searchsorted(ccum, jj, side="right").astype(jnp.int32)
            li = jnp.clip(li, 0, P_cap - 1)
            cvalid = jj < ctotal
            wi = jj - (ccum[li] - cnts[li])
            ri = jnp.clip(s_[li].astype(jnp.int32) + wi, 0, P_cap - 1)
            return (
                cvalid,
                jnp.where(cvalid, lpair[li], 0).astype(jnp.int32),
                jnp.where(cvalid, lpos[li], 0).astype(jnp.int32),
                jnp.where(cvalid, rpos_s[ri], 0).astype(jnp.int32),
                ov,
            )

        v0, p0, lp0, rp0, ov0 = orient(0)
        v1, p1, lp1, rp1, ov1 = orient(1)
        overflow = jnp.maximum(overflow, jnp.maximum(ov0, ov1))
        C2f = 2 * C_cap
        cvalid_f = jnp.concatenate([v0, v1])
        cpair_f = jnp.concatenate([p0, p1])
        clpos_f = jnp.concatenate([lp0, lp1])
        crpos_f = jnp.concatenate([rp0, rp1])
        cflip_f = jnp.concatenate(
            [jnp.zeros(C_cap, jnp.int32), jnp.ones(C_cap, jnp.int32)]
        )
        # compact real candidates before the DP legs: the join caps
        # size the candidate BUFFERS (cand_factor*Bl per orientation),
        # but only ~2-3 candidates/pair are real — running both DP
        # legs over the padded rows made the one-program path ~10x the
        # host engine's wall clock at production Bl. One stable
        # argsort packs the real rows into a dp_factor*Bl window
        # (loud overflow otherwise); everything downstream runs in the
        # compacted space, so results are row-identical.
        C2 = _capn(caps.dp_factor, Bl)
        n_cand = cvalid_f.sum()
        overflow = jnp.maximum(
            overflow, (n_cand > C2).astype(jnp.int32)
        )
        iota_c = jnp.arange(C2f, dtype=jnp.int32)
        cord = jnp.argsort(
            jnp.where(cvalid_f, iota_c, C2f + iota_c)
        )[:C2]
        cvalid = cvalid_f[cord] & (jnp.arange(C2) < n_cand)
        cpair = jnp.where(cvalid, cpair_f[cord], 0)
        clpos = jnp.where(cvalid, clpos_f[cord], 0)
        crpos = jnp.where(cvalid, crpos_f[cord], 0)
        cflip = jnp.where(cvalid, cflip_f[cord], 0)
        if stage_stop == 4:
            # token = the REAL candidate count (cap-occupancy probe)
            return stub(cvalid.astype(jnp.int32).sum())

        # ---- 5. fused deep-DP (engine._deep_dp) ----------------------
        left_idx = jnp.where(cflip == 1, cpair + Bl, cpair)
        right_idx = jnp.where(cflip == 1, cpair, cpair + Bl)
        lL = all_lens[left_idx]
        lR = all_lens[right_idx]
        margin_l = jnp.where(lL > 100, 30, 25)
        margin_r = jnp.where(lR > 100, 30, 25)
        starts_l = clpos - margin_l
        starts_r = crpos - margin_r

        def win(starts, width):
            # packed-word gather (align.device.gather_windows_packed):
            # width/16+1 uint32 rows per window instead of width byte
            # gathers — the gather unit charges per ROW, so the
            # element-wise form dominated the DP stages' probe deltas
            return gather_windows_packed(ref, dfm.n, starts, width)

        def full_dp(reads_, lens_, starts_, wl_, width):
            """Window gather + fwd DP + reverse start-finding DP
            (align.device._align_with_starts, XLA path)."""
            wins = win(starts_, width)
            wl_ = jnp.clip(wl_, 0, width).astype(jnp.int32)
            fwd = sw_align_auto(reads_, wins, lens_, wl_, params=dp)
            jj2 = jnp.arange(L, dtype=jnp.int32)[None, :]
            rsrc = fwd.end_read[:, None] - 1 - jj2
            rev_reads = jnp.where(
                rsrc >= 0,
                jnp.take_along_axis(
                    reads_.astype(jnp.int32), jnp.clip(rsrc, 0, L - 1), axis=1
                ),
                0,
            ).astype(jnp.uint8)
            ii = jnp.arange(width, dtype=jnp.int32)[None, :]
            wsrc = fwd.end_ref[:, None] - 1 - ii
            rev_wins = jnp.where(
                wsrc >= 0,
                jnp.take_along_axis(
                    wins.astype(jnp.int32), jnp.clip(wsrc, 0, width - 1), axis=1
                ),
                OFF_TEXT_CODE,
            ).astype(jnp.uint8)
            rev = sw_align_auto(
                rev_reads, rev_wins, fwd.end_read, fwd.end_ref, params=dp
            )
            return (fwd.score, fwd.end_ref - rev.end_ref, fwd.end_ref)

        s1v, st_l, e_l = full_dp(
            walkers[left_idx], lL, starts_l, lL + 2 * margin_l, Wwin
        )
        hit_left = starts_l + st_l
        bound = hit_left + jnp.int32(params.insert_high) - starts_r
        wl_r = jnp.minimum(lR + 2 * margin_r, bound)
        s2v, st_r, e_r = full_dp(
            walkers[2 * Bl + right_idx], lR, starts_r, wl_r, Wwin
        )
        ok_l = cvalid & (s1v >= thr_of(lL))
        ok_r = ok_l & (s2v >= thr_of(lR))
        kept = ok_r
        aligned = jax.ops.segment_max(
            kept.astype(jnp.int32), cpair, num_segments=Bl
        ) > 0

        def seq_of(p32):
            return (
                jnp.searchsorted(offs, p32.astype(jnp.int32), side="right")
                - 1
            ).astype(jnp.int32)

        def leg_rows(score_leg, gs, ge, end_arr, strand_val):
            seq_s = seq_of(gs)
            seq_e = seq_of(jnp.maximum(ge - 1, gs))
            okb = (seq_s == seq_e) & (gs >= 0)
            return seq_s, okb

        g_sl = starts_l + st_l
        g_el = starts_l + e_l
        g_sr = starts_r + st_r
        g_er = starts_r + e_r
        seq_l, okb_l = leg_rows(s1v, g_sl, g_el, None, 0)
        seq_r, okb_r = leg_rows(s2v, g_sr, g_er, None, 1)
        same = kept & okb_l & okb_r & (seq_l == seq_r)
        summed = s1v + s2v
        norm_l = jnp.where(same, summed, s1v)
        norm_r = jnp.where(same, summed, s2v)
        dl_valid = kept & okb_l
        dr_valid = kept & okb_r
        end_l = jnp.where(cflip == 1, 1, 0).astype(jnp.int8)
        end_r = jnp.where(cflip == 1, 0, 1).astype(jnp.int8)
        if stage_stop == 5:
            return stub(s1v.sum() + s2v.sum() + kept.astype(jnp.int32).sum())

        # ---- 6. single-end DP + mate rescue --------------------------
        todo = ~aligned  # [Bl]
        semask = cl_keep & todo[cl_pair]
        # host order: lexsort((pos, strand, end, pair)); rank < 200 per
        # (pair, end) group (DV-DPForSingleReads.cpp:200)
        seorder = jnp.lexsort(
            (cl_pos, cl_strand.astype(jnp.int32), cl_end, cl_pair, ~semask)
        )
        se_pair = cl_pair[seorder]
        se_end = cl_end[seorder]
        se_strand = cl_strand[seorder].astype(jnp.int32)
        se_pos = cl_pos[seorder]
        se_ok = semask[seorder]
        gkey = se_pair * 2 + se_end
        gfirst = jnp.concatenate(
            [jnp.ones(1, bool),
             (gkey[1:] != gkey[:-1]) | (se_ok[1:] != se_ok[:-1])]
        )
        gix = jnp.cumsum(gfirst.astype(jnp.int32)) - 1
        first_of = jax.ops.segment_min(
            iota_p, gix, num_segments=P_cap
        )
        rank = iota_p - first_of[gix]
        se_ok = se_ok & (rank < params.max_se_candidates)
        n_se = se_ok.sum()
        overflow = jnp.maximum(
            overflow, (n_se > SE_cap).astype(jnp.int32)
        )
        pick = jnp.argsort(
            jnp.where(se_ok, jnp.arange(P_cap), 1 << 30)
        )[:SE_cap]
        a_valid = se_ok[pick]
        a_pair = jnp.where(a_valid, se_pair[pick], 0)
        a_end = jnp.where(a_valid, se_end[pick], 0)
        a_strand = jnp.where(a_valid, se_strand[pick], 0)
        a_pos = jnp.where(a_valid, se_pos[pick], 0)

        a_re = a_pair + a_end * Bl
        a_rl = all_lens[a_re]
        a_margin = jnp.where(a_rl > 100, 30, 25)
        a_reads = walkers[a_re + a_strand * n2]
        a_ws = a_pos - a_margin
        sa, st_a, e_a = full_dp(
            a_reads, a_rl, a_ws, jnp.full(SE_cap, Wse, jnp.int32), Wse
        )
        a_passed = a_valid & (sa >= thr_of(a_rl))
        a_gs = a_ws + st_a
        a_ge = a_ws + e_a
        a_seq = seq_of(a_gs)
        a_okb = (a_seq == seq_of(jnp.maximum(a_ge - 1, a_gs))) & (a_gs >= 0)
        anchor_ok = a_passed & a_okb
        if stage_stop == 6:
            return stub(sa.sum() + anchor_ok.astype(jnp.int32).sum())

        # mate rescue (engine._mate_rescue): one insert-window DP per
        # PASSING anchor. The rescue window is insert_high wide (~6x a
        # read window), so running it over every SE slot dominated the
        # program — compact the passing anchors into a rescue_factor*Bl
        # window first (stable order; loud overflow), DP there, and map
        # the pair-sum back to the anchors by rank (a gather — TPU
        # scatters serialize).
        R_cap = _capn(caps.rescue_factor, Bl)
        n_resc = anchor_ok.sum()
        overflow = jnp.maximum(
            overflow, (n_resc > R_cap).astype(jnp.int32)
        )
        iota_se = jnp.arange(SE_cap, dtype=jnp.int32)
        rord = jnp.argsort(
            jnp.where(anchor_ok, iota_se, SE_cap + iota_se)
        )[:R_cap]
        r_ok = anchor_ok[rord] & (jnp.arange(R_cap) < n_resc)
        rs_pair = jnp.where(r_ok, a_pair[rord], 0)
        rs_end = jnp.where(r_ok, a_end[rord], 0)
        rs_strand = jnp.where(r_ok, a_strand[rord], 0)
        rs_gs = jnp.where(r_ok, a_gs[rord], 0)
        rs_ge = jnp.where(r_ok, a_ge[rord], 0)
        rs_seq = jnp.where(r_ok, a_seq[rord], 0)
        rs_sa = jnp.where(r_ok, sa[rord], 0)

        m_idx = rs_pair + (1 - rs_end) * Bl
        ml = all_lens[m_idx]
        m_margin = jnp.where(ml > 100, 30, 25)
        m_ws = jnp.where(
            rs_strand == 0,
            rs_gs - m_margin,
            rs_ge - jnp.int32(params.insert_high) - m_margin,
        )
        m_strand = 1 - rs_strand
        m_reads = walkers[m_idx + m_strand * n2]
        sm, st_m, e_m = full_dp(
            m_reads, ml, m_ws, jnp.full(R_cap, Wrescue, jnp.int32), Wrescue
        )
        m_passed = r_ok & (sm >= thr_of(ml))
        m_gs = m_ws + st_m
        m_ge = m_ws + e_m
        m_seq = seq_of(m_gs)
        m_okb = (m_seq == seq_of(jnp.maximum(m_ge - 1, m_gs))) & (m_gs >= 0)
        m_valid = m_passed & m_okb
        m_same = m_valid & (rs_seq == m_seq)
        m_summed = jnp.where(m_same, sm + rs_sa, sm)
        if stage_stop == 7:
            return stub(sm.sum() + m_valid.astype(jnp.int32).sum())

        # anchor norm score: rescued anchors carry the summed pair
        # score (normalizeScore) — fetch the rescue-space verdict by
        # each anchor's rank among passing anchors
        rank = jnp.cumsum(anchor_ok.astype(jnp.int32)) - 1
        rank_c = jnp.clip(rank, 0, R_cap - 1)
        in_resc = anchor_ok & (rank < R_cap)
        a_m_same = in_resc & m_same[rank_c]
        a_norm = jnp.where(a_m_same, sa + sm[rank_c], sa)
        a_paired = a_m_same

        # ---- assemble hit rows --------------------------------------
        def cat(*parts):
            return jnp.concatenate([p.astype(jnp.int32) for p in parts])

        valid = jnp.concatenate([dl_valid, dr_valid, anchor_ok, m_valid])
        readc = cat(cpair, cpair, a_pair, rs_pair)
        endc = cat(end_l, end_r, a_end, 1 - rs_end)
        seqc = cat(seq_l, seq_r, a_seq, m_seq)
        scorec = cat(norm_l, norm_r, a_norm, m_summed)
        rawc = cat(s1v, s2v, sa, sm)
        startc = cat(g_sl, g_sr, a_gs, m_gs)
        stopc = cat(g_el, g_er, a_ge, m_ge)
        strandc = cat(
            jnp.zeros(C2, jnp.int32), jnp.ones(C2, jnp.int32),
            a_strand, m_strand,
        )
        pairedc = jnp.concatenate([same, same, a_paired, m_same])

        # ---- compact: pack valid rows to the front (stable) ----------
        # The assembled table is ~40*Bl rows, overwhelmingly invalid;
        # shipping it whole made the cross-shard payload proportional
        # to the caps instead of the hits. One stable argsort packs the
        # valid rows (original order preserved) into a hit_factor*Bl
        # window — identical row content, ~7x smaller pull.
        Ht = valid.shape[0]
        # the lean DP/SE/rescue caps can shrink the assembled table
        # below the nominal hit cap — compacting past Ht is a no-op
        H_cap = min(_capn(caps.hit_factor, Bl), Ht)
        n_hits = valid.sum()
        overflow = jnp.maximum(
            overflow, (n_hits > H_cap).astype(jnp.int32)
        )
        iota_h = jnp.arange(Ht, dtype=jnp.int32)
        ordr = jnp.argsort(jnp.where(valid, iota_h, Ht + iota_h))[:H_cap]
        valid = valid[ordr] & (jnp.arange(H_cap) < n_hits)

        def out3(a):
            return a[ordr][None, None, :]

        return (
            valid[None, None, :], out3(readc), out3(endc), out3(seqc),
            out3(scorec), out3(rawc), out3(startc), out3(stopc),
            out3(strandc), out3(pairedc),
            overflow[None, None],
        )

    shmapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            (P("shard"),) * 5,
            P("shard"), P("shard"), P("shard"), P("shard"),
            P("data"), P("data"), P("data"), P("data"),
        ),
        out_specs=(
            (P("data", "shard", None),) * 10 + (P("data", "shard"),)
        ),
        check_vma=False,
    )

    def step(sfm: StackedFMPad, ref_codes, seq_offsets,
             reads1, reads2, lens1, lens2):
        leaves = (sfm.bwt_words, sfm.fused_rows,
                  sfm.counts, sfm.mark_rows,
                  sfm.sa_sampled)
        out = shmapped(
            leaves, sfm.primary, sfm.n, ref_codes, seq_offsets,
            reads1, reads2, lens1, lens2,
        )
        return SpmdHits(*out)

    return jax.jit(step)


def place_spmd_full_inputs(mesh: Mesh, sfm: StackedFMPad, ref_codes,
                           seq_offsets):
    """device_put the shard-resident step inputs ONCE with their
    canonical shardings, so per-batch step calls ship only the reads
    (the pipeline backend calls this at init; re-uploading the shard
    tables every batch would drown the step in h2d)."""
    sh2 = NamedSharding(mesh, P("shard", None))
    sh1 = NamedSharding(mesh, P("shard"))
    sh3 = NamedSharding(mesh, P("shard", None, None))
    placed = StackedFMPad(
        bwt_words=jax.device_put(sfm.bwt_words, sh2),
        fused_rows=jax.device_put(sfm.fused_rows, sh3),
        counts=jax.device_put(sfm.counts, sh2),
        mark_rows=jax.device_put(
            sfm.mark_rows, NamedSharding(mesh, P("shard", None, None))
        ),
        sa_sampled=jax.device_put(sfm.sa_sampled, sh2),
        primary=jax.device_put(sfm.primary, sh1),
        n=jax.device_put(sfm.n, sh1),
    )
    return (
        placed,
        jax.device_put(jnp.asarray(pack_ref_rows(ref_codes)), sh2),
        jax.device_put(jnp.asarray(seq_offsets), sh2),
    )


def pack_ref_rows(ref_codes) -> np.ndarray:
    """[S, N] byte codes -> [S, ceil(N/16)] packed uint32 words — the
    step program's shard-text input format (the DP stages' window
    gathers fetch word rows; the resident table is also 4x smaller)."""
    from megapath_tpu.align.device import pack_ref_words

    rc = np.asarray(ref_codes)
    return np.stack([pack_ref_words(r) for r in rc])


def pad_ref_codes(refs: Sequence[np.ndarray]) -> np.ndarray:
    """Leaf-pad shard texts to a common allocation ([S, n_max]); rows
    past each shard's true n are never gathered (window gather masks
    against the traced n)."""
    n = max(len(r) for r in refs)
    out = np.zeros((len(refs), n), np.uint8)
    for i, r in enumerate(refs):
        out[i, : len(r)] = np.asarray(r, np.uint8)
    return out


def pad_seq_offsets(offsets: Sequence[np.ndarray]) -> np.ndarray:
    """[S, M_max+1] sequence-boundary tables, INT32_MAX past each
    shard's true table so searchsorted never selects a pad row."""
    m = max(len(o) for o in offsets)
    out = np.full((len(offsets), m), I32_HUGE, np.int32)
    for i, o in enumerate(offsets):
        out[i, : len(o)] = np.asarray(o, np.int32)
    return out


def spmd_hits_to_batch(
    out: SpmdHits, n_pairs_per_row: int
) -> List["object"]:
    """[D, S, H] device output -> one host BatchHits per SHARD with
    global read indices (read + d * Bl), ready for the existing
    pipeline tail (_spike_banned/_merge_arrays/_tail).

    Vectorized: one boolean mask over the [D, H] block per shard —
    row-major (d-major) flattening preserves the per-data-row order
    the host path's concat produced."""
    from megapath_tpu.align.engine import BatchHits

    o = {f: np.asarray(getattr(out, f)) for f in out._fields}
    if int(o["overflow"].max()) != 0:
        raise RuntimeError(
            "spmd_full cap overflow — raise SpmdCaps factors"
        )
    D, S, H = o["valid"].shape
    read_g = o["read"] + (
        np.arange(D, dtype=np.int64) * n_pairs_per_row
    )[:, None, None]
    hits: List[BatchHits] = []
    for s in range(S):
        m = o["valid"][:, s, :].astype(bool)  # [D, H]
        hits.append(BatchHits(
            read=read_g[:, s, :][m].astype(np.int32),
            end=o["end"][:, s, :][m].astype(np.int8),
            seq=o["seq"][:, s, :][m].astype(np.int32),
            score=o["score"][:, s, :][m].astype(np.int32),
            raw_score=o["raw_score"][:, s, :][m].astype(np.int32),
            start=o["start"][:, s, :][m].astype(np.int64),
            stop=o["stop"][:, s, :][m].astype(np.int64),
            strand=o["strand"][:, s, :][m].astype(np.int8),
            paired=o["paired"][:, s, :][m].astype(bool),
        ))
    return hits


def spmd_payload_stats(
    out: SpmdHits, n_pairs_per_row: int, n_real_pairs: int | None = None
) -> dict:
    """Measured cross-shard merge payload of one step's output: the
    bytes/pair/shard that actually leave the device (VERDICT r3 #8 —
    measure, don't assume, the SCALING.md grouped-payload figure).

    Counts the compacted pull as shipped: H_cap rows x 10 int32
    fields for the static allocation, valid rows for the useful
    payload. ``n_real_pairs`` excludes block padding from the
    denominator (pad rows emit nothing, so counting them understates
    the per-pair payload)."""
    o_valid = np.asarray(out.valid)
    D, S, H = o_valid.shape
    n_rows = int(o_valid.sum())
    n_pairs = n_real_pairs if n_real_pairs else D * n_pairs_per_row
    bytes_per_row = 10 * 4  # 10 int32 fields incl. valid
    return {
        "pairs": n_pairs,
        "shards": S,
        "hit_rows": n_rows,
        "rows_per_pair_per_shard": round(n_rows / max(n_pairs * S, 1), 3),
        "useful_bytes_per_pair_per_shard": round(
            n_rows * bytes_per_row / max(n_pairs * S, 1), 1
        ),
        "alloc_bytes_per_pair_per_shard": round(
            D * S * H * bytes_per_row / max(n_pairs * S, 1), 1
        ),
    }
