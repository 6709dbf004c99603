"""Flat (columnar+native) PE SAM path vs the generator path: byte parity.

The PE analog of tests/test_flatsam.py — the reference's single biggest
win was batching exactly this phase (ARM-BATCHED-SAM-PLAN.md: worker_sam
was 76% of wall), and the rebuild pins the batched path to the generator
path byte-for-byte on error/indel-rich simulations."""
import numpy as np
import pytest

from tpubwa.align import pair as pairmod
from tpubwa.align.pipeline import Aligner
from tpubwa.config import MemOptions
from tpubwa.index.fmindex import FMIndex
from tpubwa.io.fasta import Contig
from tpubwa.io.fastq import Read, batch_reads
from tpubwa.utils import sim


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(17)
    codes = rng.integers(0, 4, 60000).astype(np.uint8)
    contigs = [Contig("cA", 35000, 0), Contig("cB", 25000, 35000)]
    idx = FMIndex.build(contigs, codes)
    al = Aligner(idx, MemOptions(batch_reads=64, max_read_len=160))
    r1, r2 = sim.simulate_pairs(codes, contigs, 64, length=120,
                                err=0.015, indel=0.002, seed=9)
    b1 = next(batch_reads([Read(n, s, q) for n, s, q in r1], 64, 160))
    b2 = next(batch_reads([Read(n, s, q) for n, s, q in r2], 64, 160))
    return al, b1, b2


def test_pe_flat_matches_generators(setup):
    al, b1, b2 = setup
    try:
        text_flat = pairmod.align_pe_batch(al, b1, b2, 0)
        pairmod.FLAT_PE = False
        text_gen = pairmod.align_pe_batch(al, b1, b2, 0)
    finally:
        pairmod.FLAT_PE = True
    assert text_flat == text_gen
    # the flat path must actually cover most pairs on this workload
    lines = [ln for ln in text_flat.splitlines() if ln]
    assert len(lines) >= 128  # one record per end minimum


def test_pe_flat_proper_pairs(setup):
    al, b1, b2 = setup
    text = pairmod.align_pe_batch(al, b1, b2, 0)
    flags = [int(ln.split("\t")[1]) for ln in text.splitlines() if ln]
    n_proper = sum(1 for f in flags if f & 2)
    n_paired = sum(1 for f in flags if f & 1)
    assert n_paired == len(flags)
    assert n_proper >= int(0.8 * len(flags))  # FR sim -> mostly proper
    # both ends present
    assert sum(1 for f in flags if f & 0x40) == \
        sum(1 for f in flags if f & 0x80)


@pytest.fixture(scope="module")
def repeat_setup():
    """chr21-style repeat genome: nearly every read is multi-region
    post-seeding — the workload where r4's flat PE collapsed to
    generators (VERDICT r4 missing #2 / next #3)."""
    from tpubwa.utils.gensim import repeat_genome

    rng = np.random.default_rng(23)
    codes = repeat_genome(rng, 120_000)
    contigs = [Contig("cR", 120_000, 0)]
    idx = FMIndex.build(contigs, codes)
    al = Aligner(idx, MemOptions(batch_reads=96, max_read_len=160))
    r1, r2 = sim.simulate_pairs(codes, contigs, 96, length=125,
                                err=0.01, indel=0.002, seed=31)
    b1 = next(batch_reads([Read(n, s, q) for n, s, q in r1], 96, 160))
    b2 = next(batch_reads([Read(n, s, q) for n, s, q in r2], 96, 160))
    return al, b1, b2


def test_pe_flat_repeat_genome_parity(repeat_setup):
    """Multi-region ends (XS from sub/csub, XA alternates, z-chosen
    regions) through the columnar path: byte parity on the repeat
    fixture, and the flat path must actually COVER most pairs (the r4
    flat path fell back to generators for any multi-region end)."""
    al, b1, b2 = repeat_setup
    try:
        text_flat = pairmod.align_pe_batch(al, b1, b2, 0)
        pairmod.FLAT_PE = False
        text_gen = pairmod.align_pe_batch(al, b1, b2, 0)
    finally:
        pairmod.FLAT_PE = True
    assert text_flat == text_gen
    # repeat genome -> XS and XA must actually appear in flat output
    assert "XA:Z:" in text_flat
    assert any(("XS:i:" in ln and "XS:i:0" not in ln.split("XS:i:")[1][:4])
               for ln in text_flat.splitlines())
