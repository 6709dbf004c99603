"""Differential gate for the flat columnar SE finalize (align/flatsam.py):
its SAM text must be BYTE-IDENTICAL to the per-read generator pipeline
(finalize.se_records_g driven by drive_rounds) on error/indel-rich
simulations that exercise every sub-path — exact-match shortcut, banded
DP cigars, band-doubling retries, soft clips, reverse strand MD, multi-
region fallbacks, and unmapped reads."""
import numpy as np
import pytest

from tpubwa.index.fmindex import FMIndex
from tpubwa.io.fasta import Contig
from tpubwa.utils.sim import simulate_reads


@pytest.fixture(scope="module")
def aligner():
    from tpubwa.align.pipeline import Aligner

    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, 40000).astype(np.uint8)
    # a tandem-duplicated block makes some reads multi-region (secondary /
    # XA / supplementary paths exercise the generator fallback)
    codes[30000:31500] = codes[5000:6500]
    contigs = [Contig("fA", 25000, 0), Contig("fB", 15000, 25000)]
    idx = FMIndex.build(contigs, codes)
    return codes, contigs, Aligner(idx)


@pytest.mark.parametrize("err,indel,n", [(0.01, 0.0, 400),
                                         (0.04, 0.01, 400)])
def test_flat_matches_generator(aligner, err, indel, n):
    codes, contigs, al = aligner
    from tpubwa.io.fastq import Read, batch_reads

    reads = simulate_reads(codes, contigs, n, length=150, err=err,
                           indel=indel, seed=int(err * 1000) + n)
    # a few junk reads that cannot map (unmapped path)
    rng = np.random.default_rng(0)
    for i in range(6):
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 150))
        reads.append((f"junk_{i}", seq, "I" * 150))
    rr = [Read(name=nm, seq=s, qual=q) for nm, s, q in reads]
    for batch in batch_reads(rr, 128, 160):
        want = "".join(r.line() + "\n"
                       for rl in al.align_se_batch(batch, 0) for r in rl)
        got = al.align_se_text(batch, 0)
        assert got == want
