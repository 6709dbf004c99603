"""Restartable chunked output: idempotent per-batch chunk files + resume.

SURVEY.md §5 "Failure detection / elastic recovery": per-host read-shard
restart + idempotent output chunking is the framework's recovery story for
batch alignment jobs (no training state).
"""
import io
import os

import numpy as np


def _fixture(tmpdir):
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.utils.sim import simulate_reads, write_fastq
    from tpubwa.io.fasta import Contig

    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, 25000).astype(np.uint8)
    contigs = [Contig("c1", 25000, 0)]
    ref = os.path.join(tmpdir, "ref.fa")
    with open(ref, "w") as f:
        f.write(">c1\n")
        seq = "".join("ACGT"[c] for c in codes)
        for i in range(0, len(seq), 80):
            f.write(seq[i:i + 80] + "\n")
    FMIndex.build(contigs, codes).save(ref)
    reads = simulate_reads(codes, contigs, 100, length=120, err=0.01,
                           seed=3)
    fq = os.path.join(tmpdir, "r.fq")
    write_fastq(fq, reads)
    return ref, fq


def test_chunk_resume_identical(tmp_path):
    from tpubwa.align.pipeline import align_fastq

    ref, fq = _fixture(str(tmp_path))
    # straight run (no chunking) = ground truth
    buf0 = io.StringIO()
    assert align_fastq(ref, fq, None, buf0, batch_reads=32) == 0

    # chunked run
    cdir = str(tmp_path / "chunks")
    buf1 = io.StringIO()
    assert align_fastq(ref, fq, None, buf1, batch_reads=32,
                       chunk_dir=cdir) == 0
    assert buf1.getvalue().split("@PG")[0] == buf0.getvalue().split("@PG")[0]
    assert os.path.exists(os.path.join(cdir, "manifest.json"))
    chunks = sorted(c for c in os.listdir(cdir) if c != "manifest.json")
    assert len(chunks) == 4  # 100 reads / 32 per batch
    assert all(c.endswith(".sam") and not c.endswith(".tmp") for c in chunks)

    # simulate an interrupted run: delete two chunks, poison the others so
    # we can prove completed chunks are NOT recomputed on resume
    os.remove(os.path.join(cdir, chunks[1]))
    os.remove(os.path.join(cdir, chunks[3]))
    sentinel = os.path.join(cdir, chunks[0])
    with open(sentinel) as f:
        keep = f.read()
    with open(sentinel, "w") as f:
        f.write("SENTINEL\n")

    buf2 = io.StringIO()
    assert align_fastq(ref, fq, None, buf2, batch_reads=32,
                       chunk_dir=cdir) == 0
    body = buf2.getvalue()
    assert "SENTINEL" in body  # chunk 0 reused verbatim, not recomputed
    # restore and verify full resume equals the straight run byte-for-byte
    with open(sentinel, "w") as f:
        f.write(keep)
    buf3 = io.StringIO()
    assert align_fastq(ref, fq, None, buf3, batch_reads=32,
                       chunk_dir=cdir) == 0
    assert buf3.getvalue().split("@PG")[0] == buf0.getvalue().split("@PG")[0]

    # resuming the same chunk dir under a different run identity (other
    # batch size -> different chunk boundaries) must refuse, not splice
    # stale chunks into the output (ADVICE r2: manifest check)
    import pytest

    with pytest.raises(RuntimeError, match="manifest"):
        align_fastq(ref, fq, None, io.StringIO(), batch_reads=16,
                    chunk_dir=cdir)
