"""Amplicon pipeline end-to-end test: decoy filtering + SNP calling."""

import numpy as np
import pytest

from megapath_tpu.index.fm import build_fm_index
from megapath_tpu.index.pack import COMPLEMENT, decode_seq, pack_fasta
from megapath_tpu.io.fastq import FastqRecord
from megapath_tpu.pipeline.amplicon import AmpliconConfig, AmpliconPipeline


@pytest.fixture(scope="module")
def amp_world():
    rng = np.random.default_rng(77)
    tb = rng.integers(0, 4, 6000).astype(np.uint8)
    human = rng.integers(0, 4, 6000).astype(np.uint8)

    def pack(name, codes):
        ref = pack_fasta([FastqRecord(name, decode_seq(codes), "", "")])
        fm = build_fm_index(ref.codes, sa_interval=4, lut_k=6)
        return ref, fm

    return pack("TB", tb), pack("chr1", human), tb, human


def _pairs(codes, n, rng, read_len=100, ins=300, snp_at=None):
    r1 = []
    r2 = []
    qual = "I" * read_len
    src = codes.copy()
    if snp_at is not None:
        src[snp_at] = (src[snp_at] + 1) % 4
    for i in range(n):
        p = int(rng.integers(0, len(src) - ins))
        if snp_at is not None:
            # center reads around the SNP so it is covered
            p = int(rng.integers(max(0, snp_at - ins + read_len + 10),
                                 min(len(src) - ins, snp_at - 10)))
        a = src[p : p + read_len]
        seg = src[p + ins - read_len : p + ins]
        b = COMPLEMENT[seg[::-1]]
        r1.append(FastqRecord(f"p{i}", decode_seq(a), qual))
        r2.append(FastqRecord(f"p{i}", decode_seq(b), qual))
    return r1, r2


def test_amplicon_pipeline_calls_snp(amp_world):
    (tb_ref, human_ref), _, tb, human = amp_world[0], amp_world[1], amp_world[2], amp_world[3]
    tb_pack = amp_world[0]
    hg_pack = amp_world[1]
    rng = np.random.default_rng(9)

    pipe = AmpliconPipeline(
        target=tb_pack,
        decoys=[hg_pack],
        config=AmpliconConfig(final_as=80, min_depth=3),
    )

    snp_pos = 3000
    r1, r2 = _pairs(tb, 20, rng, snp_at=snp_pos)
    # add human contamination pairs (should be decoy-filtered)
    h1, h2 = _pairs(human, 5, rng)
    for i, (a, b) in enumerate(zip(h1, h2)):
        a.name = b.name = f"hum{i}"
    res = pipe.run_records(r1 + h1, r2 + h2)

    assert res.n_after_qc == 25
    assert res.n_after_decoy == 20  # human pairs removed
    assert res.n_final == 20
    assert any(v.pos == snp_pos and v.alt == "ACGT"[(tb[snp_pos] + 1) % 4]
               for v in res.variants), res.variants


def test_amplicon_pipeline_no_false_calls(amp_world):
    tb_pack = amp_world[0]
    tb = amp_world[2]
    rng = np.random.default_rng(10)
    pipe = AmpliconPipeline(target=tb_pack, config=AmpliconConfig(final_as=80, min_depth=3))
    r1, r2 = _pairs(tb, 15, rng)
    res = pipe.run_records(r1, r2)
    assert res.variants == []


def test_amplicon_run_files(amp_world, tmp_path):
    tb_pack = amp_world[0]
    tb = amp_world[2]
    rng = np.random.default_rng(5)
    pipe = AmpliconPipeline(
        target=tb_pack, config=AmpliconConfig(final_as=80, min_depth=3)
    )
    snp_pos = 2000
    r1, r2 = _pairs(tb, 16, rng, snp_at=snp_pos)
    p1, p2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    for p, recs in ((p1, r1), (p2, r2)):
        with open(p, "w") as f:
            for r in recs:
                f.write(f"@{r.name}\n{r.seq}\n+\n{r.qual}\n")
    res = pipe.run_files(str(p1), str(p2), str(tmp_path / "amp"))
    vcf = (tmp_path / "amp.vcf").read_text()
    assert "##fileformat=VCFv4.2" in vcf
    if res.variants:  # SNP present in reads vs reference
        assert f"TB\t{snp_pos + 1}\t" in vcf
    assert (tmp_path / "amp.done").exists()
    # rerun skips (resume marker)
    res2 = pipe.run_files(str(p1), str(p2), str(tmp_path / "amp"))
    assert res2.n_input == 0


def test_assembly_filter_retains_region_reads(amp_world):
    from megapath_tpu.index.pack import pack_reads

    tb_pack = amp_world[0]
    tb = amp_world[2]
    rng = np.random.default_rng(12)
    pipe = AmpliconPipeline(target=tb_pack, config=AmpliconConfig())
    # 30 pairs concentrated in region [1000, 2500)
    r1, r2 = [], []
    qual = "I" * 100
    for i in range(30):
        p = int(rng.integers(1000, 2500 - 300))
        a = tb[p : p + 100]
        b = COMPLEMENT[tb[p + 200 : p + 300][::-1]]
        r1.append(FastqRecord(f"p{i}", decode_seq(a), qual))
        r2.append(FastqRecord(f"p{i}", decode_seq(b), qual))
    reads1, lens1 = pack_reads([r.seq for r in r1], 512)
    reads2, lens2 = pack_reads([r.seq for r in r2], 512)
    keep = pipe.assembly_filter(
        r1, r2, reads1, lens1, reads2, lens2, regions=[(1000, 2500)]
    )
    # dense coverage assembles a credible contig; region reads retained
    assert keep.sum() >= 25
