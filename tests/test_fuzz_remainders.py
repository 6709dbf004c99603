"""Randomized batch-remainder fuzz of the flat engine (SURVEY §5
sanitizers tier): odd batch sizes, odd tail batches, and reads at the
length extremes must produce byte-identical SAM to the per-read
generator path — the flat path's pow2 padding/bucketing must never leak
into results."""
import io

import numpy as np
import pytest

from tpubwa.align import flatsam
from tpubwa.align.pipeline import Aligner, align_fastq
from tpubwa.config import MemOptions
from tpubwa.index.fmindex import FMIndex
from tpubwa.io.fasta import Contig
from tpubwa.io.fastq import Read, batch_reads
from tpubwa.utils import sim
from tpubwa.utils.dna import decode


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(23)
    codes = rng.integers(0, 4, 40000).astype(np.uint8)
    contigs = [Contig("c1", 40000, 0)]
    idx = FMIndex.build(contigs, codes)
    return codes, contigs, idx


def test_odd_batch_sizes_byte_identical(setup):
    """Same reads through batch sizes 7 / 32 / 61 -> identical records
    (only batching differs; tail batches pad to pow2 buckets)."""
    codes, contigs, idx = setup
    reads = sim.simulate_reads(codes, contigs, 61, length=111, err=0.02,
                               indel=0.003, seed=31)
    rr = [Read(n, s, q) for n, s, q in reads]
    outs = []
    for bs in (7, 32, 61):
        al = Aligner(idx, MemOptions(batch_reads=bs, max_read_len=128))
        text = []
        rid0 = 0
        for b in batch_reads(rr, bs, 128):
            text.append(al.align_se_text(b, rid0))
            rid0 += b.n
        outs.append("".join(text))
    assert outs[0] == outs[1] == outs[2]


def test_length_extremes(setup):
    """Reads at min_seed_len boundary, full pad length, and 1 bp."""
    codes, contigs, idx = setup
    al = Aligner(idx, MemOptions(batch_reads=8, max_read_len=128))
    rows = []
    rng = np.random.default_rng(5)
    for ln in (1, 18, 19, 20, 127, 128):
        p = int(rng.integers(0, 40000 - 128))
        seq = decode(codes[p : p + ln])
        rows.append(Read(f"len{ln}", seq, "I" * ln))
    b = next(batch_reads(rows, 8, 128))
    text = al.align_se_text(b, 0)
    lines = [ln for ln in text.splitlines() if ln]
    assert len(lines) >= len(rows)
    by_name = {ln.split("\t")[0]: ln for ln in lines}
    # too-short reads are unmapped, full-length maps
    assert int(by_name["len1"].split("\t")[1]) & 4
    assert not int(by_name["len128"].split("\t")[1]) & 4
