"""End-to-end single-end alignment against simulated-truth reads.

This is the framework's "golden" gate (SURVEY.md §4.3): without a pinned
bwa-mem2 binary in the environment, ground truth comes from the read
simulator (positions encoded in names), plus structural SAM invariants.
"""
import numpy as np
import pytest

from tpubwa.index.fmindex import FMIndex
from tpubwa.io.fasta import Contig
from tpubwa.utils.sim import simulate_reads


@pytest.fixture(scope="module")
def ref_and_aligner(tmp_path_factory):
    from tpubwa.align.pipeline import Aligner

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, 12000).astype(np.uint8)
    contigs = [Contig("cA", 7000, 0), Contig("cB", 5000, 7000)]
    idx = FMIndex.build(contigs, codes)
    return codes, contigs, Aligner(idx)


def _align(aligner, reads):
    from tpubwa.io.fastq import Read, batch_reads

    rr = [Read(name=n, seq=s, qual=q) for n, s, q in reads]
    out = []
    for batch in batch_reads(rr, 32, 160):
        out.extend(aligner.align_se_batch(batch, 0))
    return out


def test_se_accuracy(ref_and_aligner):
    codes, contigs, aligner = ref_and_aligner
    reads = simulate_reads(codes, contigs, 48, length=120, err=0.02,
                           indel=0.002, seed=3)
    recs = _align(aligner, reads)
    assert len(recs) == 48
    n_ok = 0
    for rlist in recs:
        primary = [r for r in rlist if not (r.flag & 0x900)]
        assert len(primary) == 1
        r = primary[0]
        _, _, rid, pos, strand = r.qname.split("_")
        assert not (r.flag & 4), r.qname
        assert r.rname == contigs[int(rid)].name
        truth = int(pos) - contigs[int(rid)].offset + 1
        assert ((r.flag >> 4) & 1) == int(strand)
        if abs(r.pos - truth) <= 12:
            n_ok += 1
        # structural invariants
        assert 0 <= r.mapq <= 60
        assert any(t.startswith("NM:i:") for t in r.tags)
        assert any(t.startswith("AS:i:") for t in r.tags)
    assert n_ok == 48


def test_se_junk_read_unmapped(ref_and_aligner):
    codes, contigs, aligner = ref_and_aligner
    rng = np.random.default_rng(99)
    junk = "".join("ACGT"[c] for c in rng.integers(0, 4, 120))
    recs = _align(aligner, [("junk", junk, "I" * 120)])
    r = recs[0][0]
    assert r.flag & 4
    assert r.cigar == "*" and r.pos == 0 and r.rname == "*"


def test_se_n_read(ref_and_aligner):
    codes, contigs, aligner = ref_and_aligner
    # read with an N run still maps around it
    from tpubwa.utils.dna import decode
    pos = 2000
    seq = decode(codes[pos : pos + 120])
    seq = seq[:50] + "NNNN" + seq[54:]
    recs = _align(aligner, [("nread", seq, "I" * 120)])
    r = recs[0][0]
    assert not (r.flag & 4)
    assert abs(r.pos - (pos + 1)) <= 4


def test_se_cigar_consumes_read(ref_and_aligner):
    codes, contigs, aligner = ref_and_aligner
    reads = simulate_reads(codes, contigs, 24, length=100, err=0.03,
                           indel=0.01, seed=11)
    recs = _align(aligner, reads)
    import re
    for rlist in recs:
        for r in rlist:
            if r.flag & 4 or r.cigar == "*":
                continue
            ops = re.findall(r"(\d+)([MIDSH])", r.cigar)
            qlen = sum(int(n) for n, op in ops if op in "MIS")
            assert qlen == len(r.seq), (r.qname, r.cigar)
