"""Edge-read tier: the reference's explicit edge-case list (empty reads,
all-N, max-length, long/short — IMPLEMENTATION_STATUS.md:229-231) run through
the full CLI pipeline; every read must produce a SAM record and the run must
not abort.
"""
import io
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    from tpubwa.index.fmindex import FMIndex

    d = tmp_path_factory.mktemp("edge")
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, 30000).astype(np.uint8)
    path = os.path.join(str(d), "ref.fa")
    with open(path, "w") as f:
        f.write(">e1\n")
        seq = "".join("ACGT"[c] for c in codes)
        for i in range(0, len(seq), 80):
            f.write(seq[i:i + 80] + "\n")
    FMIndex.from_fasta(path).save(path)
    return path, codes


def _fastq(path, reads):
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def _align(ref_path, fq, threads=1):
    from tpubwa.align.pipeline import align_fastq

    buf = io.StringIO()
    rc = align_fastq(ref_path, fq, None, buf, batch_reads=32,
                     threads=threads)
    assert rc == 0
    return [l for l in buf.getvalue().splitlines()
            if not l.startswith("@")]


def test_edge_reads(ref, tmp_path):
    ref_path, codes = ref
    max_len = 160  # MemOptions default max_read_len
    good = "".join("ACGT"[c] for c in codes[1000:1000 + 150])
    reads = [
        ("empty", ""),
        ("one_base", "A"),
        ("all_n", "N" * 100),
        ("max_len", "".join("ACGT"[c] for c in codes[2000:2000 + max_len])),
        ("too_long", "".join("ACGT"[c] for c in codes[:max_len + 40])),
        ("good", good),
        ("short", good[:8]),
    ]
    fq = str(tmp_path / "edge.fq")
    _fastq(fq, reads)
    recs = _align(ref_path, fq)
    by_name = {}
    for line in recs:
        f = line.split("\t")
        by_name.setdefault(f[0], []).append(f)
    # every read shows up exactly once (no supplementary expected here)
    assert set(by_name) == {n for n, _ in reads}
    # unalignable reads are flagged unmapped, not dropped
    for n in ("empty", "one_base", "all_n", "too_long", "short"):
        assert int(by_name[n][0][1]) & 4, f"{n} should be unmapped"
    # max-length and normal reads map at their true positions
    assert int(by_name["max_len"][0][3]) == 2001
    assert int(by_name["good"][0][3]) == 1001
    assert int(by_name["good"][0][4]) > 0  # MAPQ>0 unique placement


def test_edge_reads_repeat_identical(ref, tmp_path):
    """5x repeated runs must be byte-identical (reference stability gate:
    5+ consecutive runs, GRAVITON4_SVE2_RESULTS.md:430-443)."""
    ref_path, codes = ref
    rng = np.random.default_rng(9)
    reads = []
    for i in range(40):
        p = int(rng.integers(0, len(codes) - 120))
        s = "".join("ACGT"[c] for c in codes[p:p + 120])
        # inject errors so DP is live
        s = list(s)
        for _ in range(3):
            j = int(rng.integers(0, len(s)))
            s[j] = "ACGT"[int(rng.integers(0, 4))]
        reads.append((f"r{i}", "".join(s)))
    fq = str(tmp_path / "stab.fq")
    _fastq(fq, reads)
    first = _align(ref_path, fq)
    for _ in range(4):
        assert _align(ref_path, fq) == first
