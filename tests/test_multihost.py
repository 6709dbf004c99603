"""Multi-host scale-out scaffold (reference analog: N instances each run
the whole binary on their own shard — WEEK2_COMPLETE_SUCCESS.md:244-258;
BASELINE.md north star requires a >=2-host mode).

Each host process aligns batches with global_seq % n_hosts == host_id into
a SHARED chunk directory (global chunk numbering); concatenating
chunk_*.sam in name order must reproduce the single-host SAM body
byte-for-byte.  Validated here as 2 real CPU processes."""
import glob
import io
import os
import subprocess
import sys

import numpy as np
import pytest

from tpubwa.index.fmindex import FMIndex
from tpubwa.io.fasta import Contig
from tpubwa.utils import sim
from tpubwa.utils.dna import decode


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 4, 20000).astype(np.uint8)
    ref = str(d / "ref.fa")
    with open(ref, "w") as f:
        f.write(">c1\n" + decode(codes) + "\n")
    FMIndex.build([Contig("c1", 20000, 0)], codes).save(ref)
    reads = sim.simulate_reads(codes, [Contig("c1", 20000, 0)], 96,
                               length=100, err=0.01, seed=6)
    fq = str(d / "r.fq")
    sim.write_fastq(fq, reads)
    return str(d), ref, fq


def _single_host_body(ref, fq):
    from tpubwa.align.pipeline import align_fastq

    out = io.StringIO()
    # batch 32 -> 3 items, so the 2-host split is non-trivial
    assert align_fastq(ref, fq, None, out, batch_reads=32) == 0
    return "".join(ln + "\n" for ln in out.getvalue().splitlines()
                   if not ln.startswith("@"))


def test_two_processes_concatenate_to_single_host(fixture):
    d, ref, fq = fixture
    single = _single_host_body(ref, fq)

    chunks = os.path.join(d, "chunks")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for h in (0, 1):
        r = subprocess.run(
            [sys.executable, "-m", "tpubwa.cli", "mem", "--batch", "32",
             "--hosts", "2", "--host-id", str(h), "--chunks", chunks,
             ref, fq],
            env=env, capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
    files = sorted(glob.glob(os.path.join(chunks, "chunk_*.sam")))
    assert len(files) == 3  # 96 reads / 32 per batch, global numbering
    merged = "".join(open(f).read() for f in files)
    assert merged == single


def test_shard_filter_in_process(fixture):
    """In-process shard runs cover disjoint, complete item sets."""
    from tpubwa.align.pipeline import align_fastq

    d, ref, fq = fixture
    single = _single_host_body(ref, fq)
    chunks = os.path.join(d, "chunks2")
    for h in (0, 1):
        out = io.StringIO()
        assert align_fastq(ref, fq, None, out, batch_reads=32,
                           chunk_dir=chunks, shard=(h, 2)) == 0
    files = sorted(glob.glob(os.path.join(chunks, "chunk_*.sam")))
    merged = "".join(open(f).read() for f in files)
    assert merged == single
