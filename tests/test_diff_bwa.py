"""bwa-mem2 differential gate (runs only where a binary exists).

Set TPUBWA_BWA_MEM2=/path/to/bwa-mem2 to enable; CI environments without
the binary skip.  The harness itself (scripts/diff_bwa.py) is unit-tested
on its SAM-comparison logic so it is known-good before it ever meets a
real binary."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts"))

from diff_bwa import compare, parse_sam  # noqa: E402

SAM_A = """@SQ\tSN:c1\tLN:100
r1\t0\tc1\t10\t60\t50M\t*\t0\t0\tA\tI\tNM:i:0\tMD:Z:50\tAS:i:50
r2\t16\tc1\t30\t60\t50M\t*\t0\t0\tA\tI\tNM:i:1\tMD:Z:25A24\tAS:i:45
r3\t4\t*\t0\t0\t*\t*\t0\t0\tA\tI
r4\t256\tc1\t50\t0\t50M\t*\t0\t0\tA\tI
"""

SAM_B = """@SQ\tSN:c1\tLN:100
r1\t0\tc1\t10\t60\t50M\t*\t0\t0\tA\tI\tNM:i:0\tMD:Z:50\tAS:i:50
r2\t16\tc1\t30\t37\t50M\t*\t0\t0\tA\tI\tNM:i:1\tMD:Z:25A24\tAS:i:45
"""


def test_parse_sam_primary_only():
    a = parse_sam(SAM_A)
    assert set(a) == {"r1/1", "r2/1"}  # unmapped + secondary dropped
    assert a["r1/1"][1:4] == ("c1", 10, "50M")


def test_compare_tiers(capsys):
    ok = compare(parse_sam(SAM_A), parse_sam(SAM_B))
    outp = capsys.readouterr().out
    assert ok  # tier 1 (placement) fully matches
    assert "tier 1 (QNAME/FLAG/RNAME/POS): 2/2" in outp
    assert "tier 3 (+MAPQ): 1/2" in outp  # r2 differs in MAPQ only


@pytest.mark.skipif(not os.environ.get("TPUBWA_BWA_MEM2"),
                    reason="no bwa-mem2 binary (set TPUBWA_BWA_MEM2)")
def test_against_real_bwa_mem2(tmp_path):
    import io

    import numpy as np

    from diff_bwa import parse_sam as ps, run_bwa, run_tpubwa
    from tpubwa.io.fasta import Contig
    from tpubwa.utils import sim
    from tpubwa.utils.dna import decode

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 100000).astype(np.uint8)
    ref = str(tmp_path / "ref.fa")
    with open(ref, "w") as f:
        f.write(">c1\n" + decode(codes) + "\n")
    reads = sim.simulate_reads(codes, [Contig("c1", 100000, 0)], 500,
                               length=150, err=0.01, seed=1)
    fq = str(tmp_path / "r.fq")
    sim.write_fastq(fq, reads)
    a = ps(run_bwa(os.environ["TPUBWA_BWA_MEM2"], ref, fq, None))
    b = ps(run_tpubwa(ref, fq, None))
    assert compare(a, b)
