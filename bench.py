#!/usr/bin/env python
"""End-to-end throughput benchmark: reads/sec on one chip.

Workload mirrors the reference's headline benchmark family (BASELINE.md:
1M x 150bp reads, Graviton4 16T => 130,378 reads/s end-to-end): an
E. coli-scale synthetic reference with 1%-error 150bp single-end reads
(error-injected so the DP path is live — SURVEY.md §4.5), full pipeline
FASTQ -> seeding -> chaining -> extension -> SAM text.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

vs_baseline is measured reads/s divided by the reference's best measured
end-to-end number on its own headline workload (130,378 reads/s,
GRAVITON4_BENCHMARK_RESULTS.md:21-30 — a 16-vCPU machine vs our 1 chip).

Env knobs: TPUBWA_BENCH_READS (default 20000), TPUBWA_BENCH_REF_MB
(default 4.6), TPUBWA_BENCH_PE=1 for paired-end.
"""
from __future__ import annotations

import io
import json
import os
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 130_378.0


def _work_dir() -> str:
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")
    os.makedirs(d, exist_ok=True)
    return d


def _ensure_fixture(ref_mb: float, n_reads: int, pe: bool):
    """Build (once, cached on disk) the synthetic reference + index + reads."""
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.utils import sim
    from tpubwa.utils.dna import decode

    d = _work_dir()
    ref_len = int(ref_mb * 1e6)
    ref_fa = os.path.join(d, f"ref_{ref_len}.fa")
    if not os.path.exists(ref_fa):
        rng = np.random.default_rng(42)
        codes = rng.integers(0, 4, ref_len).astype(np.uint8)
        with open(ref_fa, "w") as f:
            f.write(">benchref\n")
            seq = decode(codes)
            for i in range(0, len(seq), 80):
                f.write(seq[i : i + 80] + "\n")
    if not FMIndex.exists(ref_fa):
        t = time.monotonic()
        FMIndex.from_fasta(ref_fa).save(ref_fa)
        print(f"[bench] index built in {time.monotonic()-t:.1f}s",
              file=sys.stderr)

    tag = "pe" if pe else "se"
    fq1 = os.path.join(d, f"reads_{ref_len}_{n_reads}_{tag}_1.fq")
    fq2 = os.path.join(d, f"reads_{ref_len}_{n_reads}_{tag}_2.fq")
    if not os.path.exists(fq1):
        from tpubwa.io.fasta import read_fasta

        contigs, codes, _holes = read_fasta(ref_fa)
        if pe:
            r1, r2 = sim.simulate_pairs(codes, contigs, n_reads // 2,
                                        length=150, err=0.01, seed=7)
            sim.write_fastq(fq1, r1)
            sim.write_fastq(fq2, r2)
        else:
            reads = sim.simulate_reads(codes, contigs, n_reads, length=150,
                                       err=0.01, seed=7)
            sim.write_fastq(fq1, reads)
    return ref_fa, fq1, (fq2 if pe else None)


class _NullOut(io.TextIOBase):
    """SAM sink that still forces full text materialization."""

    def __init__(self) -> None:
        self.n_bytes = 0
        self.n_records = 0

    def write(self, s: str) -> int:  # type: ignore[override]
        self.n_bytes += len(s)
        self.n_records += s.count("\n")
        return len(s)


def main() -> int:
    n_reads = int(os.environ.get("TPUBWA_BENCH_READS", "20000"))
    ref_mb = float(os.environ.get("TPUBWA_BENCH_REF_MB", "4.6"))
    pe = os.environ.get("TPUBWA_BENCH_PE", "0") == "1"

    ref_fa, fq1, fq2 = _ensure_fixture(ref_mb, n_reads, pe)

    from tpubwa.align.pipeline import align_fastq
    from tpubwa.cli import _enable_compile_cache
    from tpubwa.config import MemOptions

    _enable_compile_cache()

    # warmup: compile every device program at the PRODUCTION batch shape
    # (a smaller warm batch would leave the real shapes to compile inside
    # the timed region — the round-1 bench's mistake)
    warm_n = MemOptions().batch_reads
    warm_fq = os.path.join(_work_dir(), "warm.fq")
    with open(fq1) as f, open(warm_fq, "w") as w:
        for i, line in enumerate(f):
            if i >= 4 * warm_n:
                break
            w.write(line)
    threads = int(os.environ.get("TPUBWA_BENCH_THREADS", "3"))
    t = time.monotonic()
    align_fastq(ref_fa, warm_fq, None, _NullOut(), threads=threads)
    print(f"[bench] warmup (compile) {time.monotonic()-t:.1f}s",
          file=sys.stderr)

    sink = _NullOut()
    t0 = time.monotonic()
    align_fastq(ref_fa, fq1, fq2, sink, threads=threads)
    dt = time.monotonic() - t0

    rps = n_reads / dt
    result = {
        "metric": ("reads_per_sec_1chip_"
                   + ("pe" if pe else "se") + f"_{ref_mb:g}Mb_150bp_err1pct"),
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 4),
    }
    print(f"[bench] {n_reads} reads in {dt:.2f}s -> {rps:.0f} reads/s "
          f"({sink.n_records} SAM lines)", file=sys.stderr)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
