"""Golden gates on a composition-realistic genome (VERDICT r4 missing #5).

Every other fixture is uniform-random or pure segmental-repeat; this one
has what real sequence has — N-islands (FASTA holes), microsatellite/
homopolymer runs, GC-skewed isochores, two scales of mobile elements,
and a diverged segmental duplication (utils/simgenome.py).  Gates mirror
the reference's real-genome validation style (alignment-count and
position invariants, /root/reference/scripts/aws-comparison-test.sh:
219-228): mapping-rate floor near simulated truth, every read accounted
for exactly once as a primary, N-read handling, and flat-vs-generator
SAM byte parity on this composition.
"""
import io

import numpy as np
import pytest

from tpubwa.align.pipeline import Aligner, run_se_pipeline
from tpubwa.config import MemOptions
from tpubwa.index.fmindex import FMIndex
from tpubwa.io.fasta import Contig, read_fasta
from tpubwa.utils import sim
from tpubwa.utils.dna import decode
from tpubwa.utils.simgenome import realistic_genome

LENGTH = 200_000
N_READS = 160


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(77)
    codes = realistic_genome(rng, LENGTH)
    d = tmp_path_factory.mktemp("realg")
    fa = str(d / "realg.fa")
    with open(fa, "w") as f:
        f.write(">rg1\n")
        seq = decode(codes)
        for i in range(0, len(seq), 80):
            f.write(seq[i:i + 80] + "\n")
    FMIndex.from_fasta(fa).save(fa)
    contigs, codes2, holes = read_fasta(fa)
    assert len(holes) >= 5          # the N-islands round-tripped as holes
    idx = FMIndex.load(fa)
    # simulate from non-N positions only (truth must be mappable)
    ok = codes2 < 4
    # windows fully N-free
    win = np.lib.stride_tricks.sliding_window_view(ok, 150).all(axis=1)
    good_pos = np.nonzero(win)[0]
    reads = []
    rr = np.random.default_rng(9)
    for i in range(N_READS):
        pos = int(good_pos[rr.integers(0, len(good_pos))])
        frag = codes2[pos:pos + 150].copy()
        strand = int(rr.integers(0, 2))
        s = sim._mutate(rr, frag, 0.01, 0.001, 150)
        if strand:
            from tpubwa.utils.dna import revcomp_codes

            s = revcomp_codes(s)
        reads.append((f"sim_{i}_0_{pos}_{strand}", decode(s),
                      "I" * len(s)))
    return fa, idx, contigs, reads


def _run(aligner, fa_reads_path):
    out = io.StringIO()
    run_se_pipeline(aligner, fa_reads_path, out)
    return out.getvalue()


def test_realistic_golden_gates(setup, tmp_path):
    fa, idx, contigs, reads = setup
    fq = str(tmp_path / "r.fq")
    sim.write_fastq(fq, reads)
    al = Aligner(idx, MemOptions(batch_reads=64))
    text = _run(al, fq)

    prim = {}
    n_records = 0
    for line in text.splitlines():
        f = line.split("\t")
        n_records += 1
        flag = int(f[1])
        if flag & 0x900:
            continue
        assert f[0] not in prim, "duplicate primary"
        prim[f[0]] = (flag, f[2], int(f[3]), int(f[4]))
    # every read is accounted for exactly once as a primary
    assert len(prim) == N_READS
    n_near = n_mapped = 0
    for name, (flag, rname, pos, mapq) in prim.items():
        true_pos = int(name.split("_")[3])
        if flag & 4:
            continue
        n_mapped += 1
        assert rname == "rg1"
        if abs(pos - 1 - true_pos) <= 50:
            n_near += 1
    # mapping-rate floors (reference style: aws-comparison-test.sh's
    # alignment-count gate).  All reads come from N-free windows at 1%
    # error, so near-truth primary placement should dominate; STR/dup
    # placements may legitimately move a handful.
    assert n_mapped >= int(0.97 * N_READS), (n_mapped, N_READS)
    assert n_near >= int(0.92 * N_READS), (n_near, n_mapped)


def test_all_n_read_unmapped(setup):
    fa, idx, contigs, reads = setup
    from tpubwa.io.fastq import Read, batch_reads

    al = Aligner(idx, MemOptions(batch_reads=8))
    rr = [Read("nread", "N" * 150, "I" * 150),
          Read("polya", "A" * 150, "I" * 150)]
    for batch in batch_reads(rr, 8, 160):
        recs = [r for rl in al.align_se_batch(batch, 0) for r in rl]
    byname = {r.qname: r for r in recs if not (r.flag & 0x900)}
    # the all-N read must come back unmapped, not dropped
    assert byname["nread"].flag & 4
    # the homopolymer read must be accounted for with exactly one
    # primary (it may legitimately map with high MAPQ: the other A-run
    # copies' seeds are max_occ-filtered, exactly like bwa's)
    assert "polya" in byname
    assert sum(r.qname == "polya" and not (r.flag & 0x900)
               for r in recs) == 1


def test_flat_vs_generator_parity_on_realistic(setup):
    """SAM byte parity between the flat columnar engine and the per-read
    generator path on realistic composition (the parity nets that pinned
    the repeat-genome fixtures extend to STR/N/GC-skew sequence)."""
    fa, idx, contigs, reads = setup
    from tpubwa.io.fastq import Read, batch_reads

    rr = [Read(n, s, q) for n, s, q in reads[:96]]
    al = Aligner(idx, MemOptions(batch_reads=96))
    for batch in batch_reads(rr, 96, 160):
        flat_text = al.align_se_text(batch, 0)
        recs = al.align_se_batch(batch, 0)
    gen_text = "".join(r.line() + "\n" for rl in recs for r in rl)
    assert flat_text == gen_text
