"""Golden-SAM regression gate.

The reference project's primary correctness gate everywhere was diffing full
SAM output against a pinned binary (PHASE1_IMPLEMENTATION.md:229-240,
test_arm_optimizations.sh:199-214).  No bwa-mem2 binary exists in this
environment, so the committed golden files pin THIS framework's own output
on a fixed simulated fixture: any tie-break or scoring drift introduced by a
refactor shows up as a byte diff.  (The bwa-mem2 differential itself remains
the documented gate to run wherever a binary is available.)

Regenerate (only when an intentional semantic change is made):
    python tests/test_golden_sam.py --regen
"""
import io
import os
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _build_fixture(tmpdir: str):
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.io.fasta import Contig
    from tpubwa.utils.sim import simulate_pairs, simulate_reads, write_fastq

    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, 60000).astype(np.uint8)
    contigs = [Contig("gA", 40000, 0), Contig("gB", 20000, 40000)]
    ref = os.path.join(tmpdir, "golden_ref.fa")
    with open(ref, "w") as f:
        for c in contigs:
            f.write(f">{c.name}\n")
            seq = "".join("ACGT"[x] for x in
                          codes[c.offset:c.offset + c.length])
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + "\n")
    idx = FMIndex.build(contigs, codes)
    idx.save(ref)
    se = simulate_reads(codes, contigs, 300, length=150, err=0.015,
                        indel=0.002, seed=7)
    r1, r2 = simulate_pairs(codes, contigs, 100, length=125, isize_mean=320,
                            isize_std=40, err=0.01, seed=13)
    se_fq = os.path.join(tmpdir, "se.fq")
    fq1 = os.path.join(tmpdir, "r1.fq")
    fq2 = os.path.join(tmpdir, "r2.fq")
    write_fastq(se_fq, se)
    write_fastq(fq1, r1)
    write_fastq(fq2, r2)
    return ref, se_fq, fq1, fq2


def _strip_pg(sam: str) -> str:
    """Drop the @PG line (carries the command line) — everything else is
    semantic output."""
    return "".join(l for l in sam.splitlines(keepends=True)
                   if not l.startswith("@PG"))


def _run(tmpdir: str) -> tuple[str, str]:
    from tpubwa.align.pipeline import align_fastq

    ref, se_fq, fq1, fq2 = _build_fixture(tmpdir)
    buf_se = io.StringIO()
    rc = align_fastq(ref, se_fq, None, buf_se, batch_reads=64)
    assert rc == 0
    buf_pe = io.StringIO()
    rc = align_fastq(ref, fq1, fq2, buf_pe, batch_reads=64)
    assert rc == 0
    return _strip_pg(buf_se.getvalue()), _strip_pg(buf_pe.getvalue())


import pytest


@pytest.fixture(scope="module")
def golden_out(tmp_path_factory):
    return _run(str(tmp_path_factory.mktemp("golden")))


def test_golden_se_pe(golden_out):
    se, pe = golden_out
    with open(os.path.join(GOLDEN_DIR, "se.sam")) as f:
        golden_se = f.read()
    with open(os.path.join(GOLDEN_DIR, "pe.sam")) as f:
        golden_pe = f.read()
    # byte-for-byte — any diff is tie-break/scoring drift
    assert se == golden_se, "SE SAM output drifted from the golden snapshot"
    assert pe == golden_pe, "PE SAM output drifted from the golden snapshot"


def test_golden_repeat_determinism(golden_out, tmp_path):
    """The same input twice must produce byte-identical SAM (the reference's
    consecutive-runs stability gate, GRAVITON4_SVE2_RESULTS.md)."""
    b_se, b_pe = _run(str(tmp_path))
    assert golden_out[0] == b_se
    assert golden_out[1] == b_pe


def test_golden_multiworker_identity(golden_out, tmp_path):
    """`-t N` workers must not change output: batches are processed by a
    thread pool but emitted in input order, so SAM is byte-identical to the
    single-worker run regardless of scheduling."""
    from tpubwa.align.pipeline import align_fastq

    ref, se_fq, fq1, fq2 = _build_fixture(str(tmp_path))
    buf_se = io.StringIO()
    assert align_fastq(ref, se_fq, None, buf_se, batch_reads=64,
                       threads=3) == 0
    assert _strip_pg(buf_se.getvalue()) == golden_out[0]
    buf_pe = io.StringIO()
    assert align_fastq(ref, fq1, fq2, buf_pe, batch_reads=64,
                       threads=3) == 0
    assert _strip_pg(buf_pe.getvalue()) == golden_out[1]


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tempfile

        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with tempfile.TemporaryDirectory() as td:
            se, pe = _run(td)
        with open(os.path.join(GOLDEN_DIR, "se.sam"), "w") as f:
            f.write(se)
        with open(os.path.join(GOLDEN_DIR, "pe.sam"), "w") as f:
            f.write(pe)
        print(f"regenerated golden files in {GOLDEN_DIR}: "
              f"se {len(se)} bytes, pe {len(pe)} bytes")
