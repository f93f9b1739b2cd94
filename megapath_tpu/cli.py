"""Command-line interface (runMegaPath.sh equivalent driver).

Subcommands:
  build-index   FASTA -> packed shards + FM indexes (2bwt-builder +
                splitFasta replacement)
  run           full pathogen-detection pipeline
  report        LSAM.id -> Kraken-style report (genKrakenReport)
  bench         alignment throughput benchmark
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _cmd_build_index(args) -> int:
    from megapath_tpu.index.shard import build_shard_indexes, split_fasta

    t0 = time.time()
    shards = split_fasta(args.fasta, args.out_prefix, max_bp=args.shard_bp)
    print(f"[build-index] {len(shards)} shard(s)", file=sys.stderr)
    out = build_shard_indexes(
        shards, os.path.dirname(args.out_prefix) or ".",
        sa_interval=args.sa_interval, lut_k=args.lut_k,
    )
    for rp, fp in out:
        print(f"{rp}\t{fp}")
    print(f"[build-index] done in {time.time()-t0:.1f}s", file=sys.stderr)
    return 0


def _cmd_run(args) -> int:
    from megapath_tpu.filters.bbduk import build_kmer_ref, load_adapters
    from megapath_tpu.index.fm import FMIndex
    from megapath_tpu.index.pack import PackedReference
    from megapath_tpu.pipeline import MegaPathPipeline, PipelineConfig
    from megapath_tpu.taxonomy import TaxDB

    db = TaxDB()
    db.read_nodes(args.nodes)
    db.read_names(args.names)
    db.read_acc2tid(args.acc2tid)

    def load_pack(prefix):
        return (
            PackedReference.load(prefix + ".ref.npz"),
            FMIndex.load(prefix + ".fm.npz"),
        )

    nt_shards = [load_pack(p) for p in args.nt_index]
    hg = load_pack(args.hg_index) if args.hg_index else None
    adapters = (
        build_kmer_ref(load_adapters(args.adapters)) if args.adapters else None
    )

    cfg = PipelineConfig(
        read_len=args.read_len,
        nt_cutoff=args.cutoff,
        spike_stdev=args.spike_stdev,
        spike_overlap=args.spike_overlap,
        skip_human=args.hg_index is None,
        skip_preprocess=args.adapters is None and args.skip_preprocess,
        device_seeding=not args.no_device_seeding,
    )
    pipe = MegaPathPipeline(nt_shards, db, hg_shard=hg, adapters=adapters, config=cfg)
    res = pipe.run_files(args.r1, args.r2, args.prefix)
    print(
        f"[run] pairs in={res.n_input_pairs} preprocessed={res.n_after_preprocess} "
        f"non-human={res.n_after_human} spike-removed={res.spike_removed}",
        file=sys.stderr,
    )
    print(f"[run] wrote {args.prefix}.nt.report / .nt.ra.report / .nt.lsam.id",
          file=sys.stderr)
    return 0


def _cmd_report(args) -> int:
    from megapath_tpu.io.fastq import open_maybe_gz
    from megapath_tpu.taxonomy import TaxDB
    from megapath_tpu.taxonomy.report import gen_kraken_report

    db = TaxDB()
    db.read_nodes(args.nodes)
    db.read_names(args.names)
    fp = open_maybe_gz(args.lsam_id, "rt")
    sys.stdout.write(gen_kraken_report(db, fp, score_threshold=args.threshold))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="megapath-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-index", help="build shard indexes from FASTA")
    b.add_argument("fasta")
    b.add_argument("out_prefix")
    b.add_argument("--shard-bp", type=int, default=int(2e9))
    b.add_argument("--sa-interval", type=int, default=8)
    b.add_argument("--lut-k", type=int, default=13)
    b.set_defaults(fn=_cmd_build_index)

    r = sub.add_parser("run", help="run the detection pipeline")
    r.add_argument("-1", dest="r1", required=True)
    r.add_argument("-2", dest="r2", required=True)
    r.add_argument("-p", dest="prefix", default="megapath")
    r.add_argument("--nt-index", nargs="+", required=True,
                   help="shard prefixes (expects .ref.npz/.fm.npz)")
    r.add_argument("--hg-index", default=None)
    r.add_argument("--nodes", required=True)
    r.add_argument("--names", required=True)
    r.add_argument("--acc2tid", required=True)
    r.add_argument("--adapters", default=None)
    r.add_argument("-L", dest="read_len", type=int, default=150)
    r.add_argument("-c", dest="cutoff", type=int, default=40)
    r.add_argument("-s", dest="spike_stdev", type=int, default=60)
    r.add_argument("-o", dest="spike_overlap", type=float, default=0.5)
    r.add_argument("--skip-preprocess", action="store_true")
    r.add_argument("--no-device-seeding", action="store_true")
    r.set_defaults(fn=_cmd_run)

    p = sub.add_parser("report", help="LSAM.id -> Kraken report")
    p.add_argument("nodes")
    p.add_argument("names")
    p.add_argument("lsam_id")
    p.add_argument("--threshold", type=int, default=40)
    p.set_defaults(fn=_cmd_report)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
