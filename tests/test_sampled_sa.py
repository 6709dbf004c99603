"""Sampled-SA serving: exact parity with the full-resolution SA.

The sampled mode (ops/fm.py sa_lookup_sampled: position-sampled rows +
bounded LF-walk; bwa classic's bwt_sa idea re-expressed for fixed-trip
device loops) must change COST only, never results — pinned here at both
the lookup level and end-to-end SAM level (VERDICT r4 next #5)."""
import io

import numpy as np
import pytest

from tpubwa.align.pipeline import Aligner, align_fastq  # noqa: F401
from tpubwa.config import MemOptions
from tpubwa.index.fmindex import FMIndex
from tpubwa.utils import sim
from tpubwa.utils.dna import decode


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("sampled_sa")
    rng = np.random.default_rng(99)
    from tpubwa.utils.gensim import repeat_genome

    codes = repeat_genome(rng, 60_000)
    ref = d / "ref.fa"
    seq = decode(codes)
    with open(ref, "w") as f:
        f.write(">c1\n")
        for i in range(0, len(seq), 80):
            f.write(seq[i : i + 80] + "\n")
    idx = FMIndex.from_fasta(str(ref))
    idx.save(str(ref))
    from tpubwa.io.fasta import read_fasta

    contigs, ref_codes, _ = read_fasta(str(ref))
    reads = sim.simulate_reads(ref_codes, contigs, 300, length=150,
                               err=0.02, seed=3)
    fq = d / "reads.fq"
    sim.write_fastq(str(fq), reads)
    return str(ref), str(fq), idx


def test_lookup_parity(fixture):
    """sa_lookup_sampled == full SA over every row, shifts 2 and 4."""
    import jax.numpy as jnp

    from tpubwa.ops.fm import (DeviceIndex, build_sampled_sa,
                               sa_lookup_sampled)

    _, _, idx = fixture
    di = DeviceIndex.from_host(idx)
    sa = idx.sa
    rows = np.arange(len(sa), dtype=np.int64)
    for shift in (2, 4):
        ss = build_sampled_sa(sa, shift, wide=False)
        got = np.asarray(
            sa_lookup_sampled(di, ss, jnp.asarray(rows.astype(np.int32)),
                              shift))
        np.testing.assert_array_equal(got, sa.astype(got.dtype))


def test_e2e_sam_parity(fixture):
    """Full pipeline SAM is byte-identical with sampled-SA serving."""
    ref, fq, _ = fixture

    def run(shift):
        out = io.StringIO()
        idx = FMIndex.load(ref)
        al = Aligner(idx, MemOptions(batch_reads=128,
                                     sa_sample_shift=shift))
        from tpubwa.align.pipeline import run_se_pipeline

        run_se_pipeline(al, fq, out)
        return out.getvalue()

    base = run(0)
    assert base.count("\n") >= 300
    assert run(4) == base
