#!/usr/bin/env python
"""Production-scale parity audit vs the reference soap4 — read-end AND
report level.

Compares our engine against the reference binary ON the 512 Mbp bench
shard (the regime the reference actually runs):

1. read-end parity: per-read-end (best score, hit set) from our engine
   vs the reference cfq — the round-4 audit, now a committed tool.
2. REPORT-level parity (VERDICT r4 item 3): both cfq streams run
   through the REFERENCE tail binaries (fastq2lsam | taxLookupAcc |
   reassign | genKrakenReport, /root/reference/cc) with a synthetic
   8-species taxonomy; the product metric is whether the Kraken report
   lines differ at all (genKrakenReport.cpp:41-155 is the product).

Heavy steps are cached under bench_cache/audit_<hash>/:
  * reference toolchain build (/tmp/refbuild, verify SKILL.md recipe)
  * 512 Mbp FASTA + 2bwt-builder index (~400 s one-time)
  * the reference soap4 cfq (~6 s once built)
Our engine runs fresh each invocation (it is the variable under test).

Env dials (swept by the kill-curve experiments):
  AUDIT_KILL_RATIO / AUDIT_KILL_BASE / AUDIT_JUNK_KILL — MmpParams
  overrides for our engine; unset = AlignParams() defaults.
  AUDIT_SKIP_REPORT=1 — read-end parity only.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
CACHE = os.path.join(HERE, "bench_cache")
REFBUILD = "/tmp/refbuild"

SOAP4_FLAGS = ["-L", "121", "-u", "750", "-F", "-top", "95", "-nc"]


def log(msg: str) -> None:
    print(f"[audit] {msg}", file=sys.stderr, flush=True)


def sh(cmd, **kw):
    log("$ " + " ".join(map(str, cmd)))
    subprocess.run([str(c) for c in cmd], check=True, **kw)


def ensure_refbuild() -> None:
    """Build the reference toolchain per .claude/skills/verify/SKILL.md
    (mmp_worker missing-return + Socket.c pointer-compare patches)."""
    soap4 = os.path.join(REFBUILD, "soap4", "soap4")
    builder = os.path.join(REFBUILD, "soap4", "2bwt-lib", "2bwt-builder")
    cc_ok = os.path.join(REFBUILD, "cc", "genKrakenReport")
    if all(os.path.exists(p) for p in (soap4, builder, cc_ok)):
        return
    log("building reference toolchain into /tmp/refbuild (~2 min)")
    os.makedirs(REFBUILD, exist_ok=True)
    if not os.path.exists(cc_ok):
        shutil.copytree(
            "/root/reference/cc", os.path.join(REFBUILD, "cc"),
            dirs_exist_ok=True,
        )
        sh(["make", "-j4"], cwd=os.path.join(REFBUILD, "cc"))
    sdir = os.path.join(REFBUILD, "soap4")
    if not os.path.exists(soap4) or not os.path.exists(builder):
        shutil.copytree("/root/reference/soap4", sdir, dirs_exist_ok=True)
        mk = os.path.join(sdir, "Makefile")
        txt = open(mk).read().replace(
            "CXXFLAGS = -w", "CXXFLAGS = -w -fpermissive", 1
        )
        open(mk, "w").write(txt)
        # mmp_worker falls off a void* fn: modern g++ deletes its loop
        # bound (UB). Patch the FUNCTION-level brace (column 0).
        dv = os.path.join(sdir, "DV-DPfunctions.cpp")
        lines = open(dv).read().split("\n")
        i = next(j for j, l in enumerate(lines) if "void* mmp_worker" in l)
        while lines[i] != "}":
            i += 1
        lines[i] = "  return NULL;\n}"
        open(dv, "w").write("\n".join(lines))
        sock = os.path.join(sdir, "2bwt-lib", "Socket.c")
        txt = open(sock).read().replace("socketPath == '\\0'", "socketPath == NULL")
        open(sock, "w").write(txt)
        sh(["make", "-j4"], cwd=sdir)
        sh(["make", "2BWT-Builder"], cwd=os.path.join(sdir, "2bwt-lib"))


def audit_dir() -> str:
    # keyed by the DATA parameters only (not index-layout knobs like
    # sa_interval/lut_k): the reference index + cfq in this cache are
    # functions of the text and reads alone, and the 2bwt build costs
    # ~400 s — layout sweeps must not invalidate it
    import hashlib

    from tools import build_bench_shard as B

    key = json.dumps(
        [B.BIG_SEQS, B.BIG_SEQ_LEN, B.BIG_PAIRS, B.READ_LEN, B.INSERT,
         B.SEED]
    )
    h = hashlib.sha256(key.encode()).hexdigest()[:10]
    d = os.path.join(CACHE, f"audit_data_{h}")
    os.makedirs(d, exist_ok=True)
    return d


def materialize(ref, reads1, reads2):
    """FASTA + FASTQ + taxonomy files for the reference run (cached)."""
    d = audit_dir()
    fa = os.path.join(d, "big.fa")
    fq1 = os.path.join(d, "r1.fq")
    fq2 = os.path.join(d, "r2.fq")
    decode = np.frombuffer(b"ACGT", dtype=np.uint8)
    if not os.path.exists(fa):
        log("writing 512 Mbp FASTA")
        with open(fa, "wb") as f:
            for i, name in enumerate(ref.names):
                a, b = int(ref.offsets[i]), int(ref.offsets[i + 1])
                f.write(f">{name}\n".encode())
                f.write(decode[ref.codes[a:b]].tobytes())
                f.write(b"\n")
    if not os.path.exists(fq2):
        log("writing FASTQ pairs")
        qual = b"I" * reads1.shape[1]
        for path, arr in ((fq1, reads1), (fq2, reads2)):
            with open(path, "wb") as f:
                for i in range(len(arr)):
                    f.write(b"@rd%06d\n" % i)
                    f.write(decode[arr[i]].tobytes())
                    f.write(b"\n+\n")
                    f.write(qual)
                    f.write(b"\n")
    # synthetic taxonomy: each shard sequence its own species under one
    # superkingdom (IDs mirror bench.py's _bench_taxdb shape)
    nodes = os.path.join(d, "nodes.dmp")
    if not os.path.exists(nodes):
        with open(nodes, "w") as f:
            f.write("1\t|\t1\t|\tno rank\t|\t\n")
            f.write("2\t|\t1\t|\tsuperkingdom\t|\t\n")
            for i in range(len(ref.names)):
                f.write(f"{10+i}\t|\t2\t|\tspecies\t|\t\n")
        with open(os.path.join(d, "names.dmp"), "w") as f:
            f.write("1\t|\troot\t|\t\t|\tscientific name\t|\n")
            f.write("2\t|\tBacteria\t|\t\t|\tscientific name\t|\n")
            for i in range(len(ref.names)):
                f.write(
                    f"{10+i}\t|\tSpecies {i}\t|\t\t|\tscientific name\t|\n"
                )
        with open(os.path.join(d, "acc2tid.map"), "w") as f:
            f.write("accession\taccession.version\ttaxid\tgi\n")
            for i, name in enumerate(ref.names):
                f.write(f"{name}\t{name}.1\t{10+i}\t0\n")
    return d, fa, fq1, fq2


def build_ref_index(fa: str) -> str:
    """2bwt-builder over the shard FASTA (cached, ~400 s)."""
    if not os.path.exists(fa + ".index.pac"):
        log("building reference 2bwt index (~400 s one-time)")
        t = time.time()
        sh([os.path.join(REFBUILD, "soap4", "2bwt-lib", "2bwt-builder"), fa])
        log(f"2bwt-builder: {time.time()-t:.0f} s")
    return fa + ".index"


def run_reference(idx: str, fq1: str, fq2: str, out_cfq: str) -> None:
    if os.path.exists(out_cfq) and os.path.getsize(out_cfq) > 0:
        return
    ini = "/root/reference/soap4/soap4-nt2.ini"
    t = time.time()
    with open(out_cfq + ".tmp", "wb") as f:
        sh(
            [os.path.join(REFBUILD, "soap4", "soap4"), "pair", idx, fq1,
             fq2, "-C", ini, *SOAP4_FLAGS, "-T", "2"],
            stdout=f,
        )
    os.rename(out_cfq + ".tmp", out_cfq)
    log(f"reference soap4: {time.time()-t:.1f} s")


def parse_cfq(path: str):
    """{(read_idx, end): (best, {seq: score})} from a cfq stream."""
    from megapath_tpu.io.fastq import read_fastx, trim_readno

    seen = {}
    out = {}
    for rec in read_fastx(path):
        name = trim_readno(rec.name)
        end = seen.get(name, 0)
        seen[name] = end + 1
        c = rec.comment
        assert c.startswith("SCORE:"), c
        segs = c[6:].split(";")
        best = int(segs[0])
        hits = {}
        for seg in segs[1:]:
            if seg:
                sc, nm = seg.split(",", 1)
                hits[nm] = max(hits.get(nm, 0), int(sc))
        out[(int(name[2:]), end)] = (best, hits)
    return out


def run_ours(ref, fm, reads1, lens1, reads2, lens2, out_cfq: str):
    """Our engine on the same shard/reads -> cfq file; returns the
    (best, hits) table directly as well."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(CACHE, "jaxcache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from dataclasses import replace

    from megapath_tpu.align import AlignEngine, AlignParams, best_per_seq
    from megapath_tpu.align.output import format_comment

    params = AlignParams()
    mmp = params.mmp
    kw = {}
    if os.environ.get("AUDIT_KILL_RATIO"):
        kw["kill_ratio"] = float(os.environ["AUDIT_KILL_RATIO"])
    if os.environ.get("AUDIT_KILL_BASE"):
        kw["kill_base"] = int(os.environ["AUDIT_KILL_BASE"])
    if os.environ.get("AUDIT_JUNK_KILL"):
        kw["junk_kill_steps"] = int(os.environ["AUDIT_JUNK_KILL"])
    if kw:
        mmp = replace(mmp, **kw)
        params = params.with_(mmp=mmp)
    log(f"our engine: mmp dial {mmp}")
    engine = AlignEngine(ref, fm, params, device_seeding=True)
    # two warmup passes: pass 1 compiles the robust-plan programs and
    # promotes the fast plan + exact-rescue subprograms, pass 2
    # compiles those; the timed pass is steady state
    for _ in range(2):
        t = time.time()
        hits = engine.align_pairs(reads1, lens1, reads2, lens2)
        log(f"warmup pass: {time.time()-t:.2f} s")
    t = time.time()
    hits = engine.align_pairs(reads1, lens1, reads2, lens2)
    dt = time.time() - t
    log(f"our pass: {dt:.2f} s ({2*len(lens1)/dt:.0f} reads/s)")
    n = len(lens1)
    table = best_per_seq(hits, n, params.megapath_mode)
    ours = {}
    decode = np.frombuffer(b"ACGT", dtype=np.uint8)
    qual = "I" * reads1.shape[1]
    with open(out_cfq, "w") as f:
        for i in range(n):
            for end, arr in ((0, reads1), (1, reads2)):
                comment = format_comment(table[end][i], ref, params)
                segs = comment[6:].split(";")
                best = int(segs[0])
                h = {}
                for seg in segs[1:]:
                    if seg:
                        sc, nm = seg.split(",", 1)
                        h[nm] = max(h.get(nm, 0), int(sc))
                ours[(i, end)] = (best, h)
                f.write(
                    f"@rd{i:06d}\t{comment}\n"
                    f"{decode[arr[i]].tobytes().decode()}\n+\n{qual}\n"
                )
    return ours, 2 * len(lens1) / dt


def report_tail(d: str, cfq: str, tag: str) -> str:
    """cfq -> Kraken report via the REFERENCE tail binaries; returns
    the report path (runMegaPath.sh:208,247,255 pipeline)."""
    cc = os.path.join(REFBUILD, "cc")
    lsam = os.path.join(d, f"{tag}.lsam.id")
    rep = os.path.join(d, f"{tag}.report")
    ra_rep = os.path.join(d, f"{tag}.ra.report")
    with open(lsam, "wb") as f, open(cfq, "rb") as fin:
        p1 = subprocess.Popen(
            [os.path.join(cc, "fastq2lsam"), "1"],
            stdin=fin, stdout=subprocess.PIPE,
        )
        p2 = subprocess.Popen(
            [
                os.path.join(cc, "taxLookupAcc"),
                os.path.join(d, "acc2tid.map"),
                os.path.join(d, "nodes.dmp"),
                os.path.join(d, "names.dmp"),
                "-",
            ],
            stdin=p1.stdout,
            stdout=f,
        )
        p1.stdout.close()
        p2.communicate()
        assert p2.returncode == 0
    with open(rep, "wb") as f:
        subprocess.run(
            [
                os.path.join(cc, "genKrakenReport"),
                os.path.join(d, "nodes.dmp"),
                os.path.join(d, "names.dmp"),
                lsam, "40",
            ],
            stdout=f, check=True,
        )
    ra = os.path.join(d, f"{tag}.ra.lsam.id")
    with open(ra, "wb") as f:
        subprocess.run(
            [os.path.join(cc, "reassign"), "-p", "2", "-t", "40", lsam],
            stdout=f, check=True,
        )
    with open(ra_rep, "wb") as f:
        subprocess.run(
            [
                os.path.join(cc, "genKrakenReport"),
                os.path.join(d, "nodes.dmp"),
                os.path.join(d, "names.dmp"),
                ra, "40",
            ],
            stdout=f, check=True,
        )
    return rep, ra_rep


def main() -> None:
    from tools.build_bench_shard import build

    ensure_refbuild()
    ref, fm, reads1, lens1, reads2, lens2 = build()
    d, fa, fq1, fq2 = materialize(ref, reads1, reads2)
    idx = build_ref_index(fa)
    ref_cfq = os.path.join(d, "ref.cfq")
    run_reference(idx, fq1, fq2, ref_cfq)
    if os.environ.get("AUDIT_PREP_ONLY"):
        log("prep complete (AUDIT_PREP_ONLY)")
        return
    want = parse_cfq(ref_cfq)

    our_cfq = os.path.join(d, "ours.cfq")
    ours, rps = run_ours(ref, fm, reads1, lens1, reads2, lens2, our_cfq)

    n = len(lens1)
    miss = []
    for key in sorted(want):
        w = want.get(key, (0, {}))
        o = ours.get(key, (0, {}))
        if w != o:
            miss.append((key, w[0], o[0]))
    log(f"read-end misses: {len(miss)}/{2*n}")
    for k, wb, ob in miss[:10]:
        log(f"  miss {k}: ref best {wb} ours {ob}")

    result = {
        "metric": "production_parity",
        "read_end_misses": len(miss),
        "read_ends": 2 * n,
        "parity_pct": round(100.0 * (1 - len(miss) / (2 * n)), 4),
        "our_reads_per_sec": round(rps, 1),
    }

    if not os.environ.get("AUDIT_SKIP_REPORT"):
        rep_r, ra_r = report_tail(d, ref_cfq, "ref")
        rep_o, ra_o = report_tail(d, our_cfq, "ours")
        same = open(rep_r, "rb").read() == open(rep_o, "rb").read()
        same_ra = open(ra_r, "rb").read() == open(ra_o, "rb").read()
        result["report_identical"] = same
        result["ra_report_identical"] = same_ra
        if not same or not same_ra:
            import difflib

            a = open(rep_r).read().splitlines()
            b = open(rep_o).read().splitlines()
            for l in difflib.unified_diff(a, b, "ref", "ours", lineterm=""):
                log(f"  report diff: {l}")
            a = open(ra_r).read().splitlines()
            b = open(ra_o).read().splitlines()
            for l in difflib.unified_diff(a, b, "ref.ra", "ours.ra", lineterm=""):
                log(f"  ra diff: {l}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
