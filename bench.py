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


def _repeat_genome(rng, ref_len: int) -> np.ndarray:
    """chr21-style repeat-structured synthetic genome.

    A uniform-random reference has no repeat structure, which silently
    skips whole pipeline phases (max_occ filtering, re-seeding, MAPQ-vs-
    sub logic) — the reference project's recorded trap
    (/root/reference/SVE_OPTIMIZATION_FINDINGS.md:63-84).  Structure:
    8 segmental copies of one base segment at ~2% divergence (large
    duplications -> multi-hit seeds), with a ~300 bp high-copy element
    (Alu-like, ~10% divergence) inserted every ~3 kb (~15k copies ->
    max_occ saturation)."""
    n_seg = 8
    alu_len, alu_every = 300, 3000
    seg_len = ref_len // n_seg
    base = rng.integers(0, 4, seg_len).astype(np.uint8)
    alu = rng.integers(0, 4, alu_len).astype(np.uint8)
    segs = []
    for _ in range(n_seg):
        seg = base.copy()
        mut = rng.random(seg_len) < 0.02
        seg[mut] = (seg[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
        for p in range(alu_every, seg_len - alu_len, alu_every):
            a = alu.copy()
            m = rng.random(alu_len) < 0.10
            a[m] = (a[m] + rng.integers(1, 4, int(m.sum()))) % 4
            seg[p : p + alu_len] = a
        segs.append(seg)
    return np.concatenate(segs)[:ref_len]


def _ensure_fixture(ref_mb: float, n_reads: int, pe: bool,
                    style: str = "random"):
    """Build (once, cached on disk) the synthetic reference + index + reads."""
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.utils import sim
    from tpubwa.utils.dna import decode

    d = _work_dir()
    ref_len = int(ref_mb * 1e6)
    tag0 = "" if style == "random" else f"_{style}"
    ref_fa = os.path.join(d, f"ref_{ref_len}{tag0}.fa")
    if not os.path.exists(ref_fa):
        rng = np.random.default_rng(42)
        if style == "chr21":
            codes = _repeat_genome(rng, ref_len)
        else:
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

    tag = ("pe" if pe else "se") + tag0
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


def bench_kernel() -> int:
    """DP-kernel microbenchmark: banded affine-gap cells/sec vs a stated
    VPU roofline (BASELINE.md north star: "DP cells/sec at per-chip
    speed-of-light").

    Workload: B lanes of full-length extensions with query == target so no
    lane exits early (every row of every lane is computed).  Two numbers:
    - hardware cells/s: rows x full vector width the VPU actually computes
      (the kernel evaluates the whole Q-wide row per target row, masked)
    - effective DP cells/s: rows x band columns (the algorithmic work)
    Roofline: v5e VPU ~= 8x128 lanes x 4 int32 ALUs x ~0.94 GHz ~= 3.85e12
    int-ops/s; the row update needs >=8 VPU ops per hardware cell (score
    select, M, E, F running-max, H max, band mask — trackers/cummax steps
    amortize across the row) -> ~4.8e11 hardware cells/s speed-of-light."""
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpubwa.cli import _enable_compile_cache
    from tpubwa.config import MemOptions
    from tpubwa.ops.extend import extend_batch

    _enable_compile_cache()

    platform = jax.devices()[0].platform
    if platform == "tpu":
        from tpubwa.ops.extend_pallas import extend_batch_pallas as fn
    else:
        fn = extend_batch

    opt = MemOptions()
    B, Q, T = 4096, 256, 256
    rng = np.random.default_rng(0)
    qlen = np.full(B, Q, np.int32)
    tlen = np.full(B, T, np.int32)
    w = np.full(B, opt.w, np.int32)
    h0 = np.full(B, 30, np.int32)
    eb = np.full(B, 5, np.int32)
    mat = jnp.asarray(opt.score_matrix())
    kw = dict(o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
              e_ins=opt.e_ins, zdrop=opt.zdrop, mat_max=opt.a)
    # Honest timing on a tunneled backend: block_until_ready can return
    # before device compute completes (observed: times independent of the
    # work size), so the kernel runs REP times inside ONE device program
    # (lax.scan, data-dependent carry so XLA cannot dedupe) and the wall
    # time is forced by a d2h readback; the tunnel's ~26 ms fixed transfer
    # cost is measured separately and subtracted.
    REP = 16
    q = rng.integers(0, 4, (B, Q)).astype(np.int32)
    t = q.copy()  # full match: no early exit, every row computed
    args = [jnp.asarray(x) for x in (q, qlen, t, tlen)] + [mat] + \
        [jnp.asarray(x) for x in (w, h0, eb)]

    @jax.jit
    def many(q, qlen, t, tlen, mat, w, h0, eb):
        def body(c, _):
            # the carry feeds the next iteration's inputs with a real
            # data dependency — identical pure iterations get CSE'd into
            # ONE kernel call otherwise (observed: "0.0 ms" timings)
            out = fn(q, qlen, t, tlen, mat, w, h0 + (c & 7), eb, **kw)
            return c + out.score[0], out.score[0]
        _, s = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                            length=REP)
        return s

    _ = np.asarray(many(*args))  # compile
    dt = 1e9
    for _i in range(3):
        # distinct h0 per timed call: the tunnel content-caches d2h
        # results, so identical outputs would read back for free
        a2 = list(args)
        a2[6] = args[6] + (_i + 1)
        t0 = _t.monotonic()
        _ = np.asarray(many(*a2))
        dt = min(dt, _t.monotonic() - t0)
    # d2h fixed cost: min over a few fresh tiny readbacks (a single probe
    # can queue behind stray device work); clamped to half the raw time
    probe = (jnp.arange(REP, dtype=jnp.int32) + args[5][0])
    _ = np.asarray(probe)
    overhead = 1e9
    for k in range(3):
        t0 = _t.monotonic()
        _ = np.asarray(probe + (k + 1))
        overhead = min(overhead, _t.monotonic() - t0)
    overhead = min(overhead, 0.5 * dt)
    print(f"[bench --kernel] raw {dt*1e3:.1f} ms for {REP} reps, "
          f"d2h overhead {overhead*1e3:.1f} ms", file=sys.stderr)
    dt = max(dt - overhead, 1e-9) / REP

    hw_cells = B * T * Q
    band_cols = min(2 * opt.w + 1, Q)
    eff_cells = B * T * band_cols
    roofline = 4.8e11  # stated hardware-cell speed-of-light, see docstring
    result = {
        "metric": f"dp_kernel_cells_per_sec_{platform}",
        "value": round(hw_cells / dt / 1e9, 2),
        "unit": "Gcells/s (hardware; effective band "
                f"{eff_cells / dt / 1e9:.2f})",
        "vs_baseline": round(hw_cells / dt / roofline, 4),
    }
    print(f"[bench --kernel] {B} lanes x {T} rows x {Q} cols in {dt*1e3:.1f}"
          f" ms -> {hw_cells/dt/1e9:.2f} Gcells/s hardware, "
          f"{eff_cells/dt/1e9:.2f} Gcells/s effective, "
          f"{hw_cells/dt/roofline*100:.1f}% of stated VPU roofline",
          file=sys.stderr)
    print(json.dumps(result))
    return 0


def main() -> int:
    if "--kernel" in sys.argv:
        return bench_kernel()
    n_reads = int(os.environ.get("TPUBWA_BENCH_READS", "20000"))
    ref_mb = float(os.environ.get("TPUBWA_BENCH_REF_MB", "4.6"))
    pe = os.environ.get("TPUBWA_BENCH_PE", "0") == "1"
    style = os.environ.get("TPUBWA_BENCH_STYLE", "random")

    ref_fa, fq1, fq2 = _ensure_fixture(ref_mb, n_reads, pe, style=style)

    from tpubwa.align.pipeline import align_fastq
    from tpubwa.cli import _enable_compile_cache
    from tpubwa.config import MemOptions

    _enable_compile_cache()

    # warmup: compile every device program at the PRODUCTION batch shapes —
    # one full batch AND one tail-sized batch (the real run ends with
    # n_reads % batch_reads; its bucket shapes would otherwise compile
    # inside the timed region)
    threads_env = os.environ.get("TPUBWA_BENCH_THREADS", "1")  # serial
    # dispatch-ahead driver: measured faster than the thread pool (GIL)
    batch_sz = int(os.environ.get("TPUBWA_BENCH_BATCH", "0")) \
        or MemOptions().batch_reads
    warm_n = batch_sz + (n_reads % batch_sz or batch_sz)
    warm_fq = os.path.join(_work_dir(), "warm.fq")
    with open(fq1) as f, open(warm_fq, "w") as w:
        for i, line in enumerate(f):
            if i >= 4 * warm_n:
                break
            w.write(line)
    threads = int(threads_env)
    batch_n = os.environ.get("TPUBWA_BENCH_BATCH")
    batch_n = int(batch_n) if batch_n else None

    # ONE Aligner for warmup + every timed pass: constructing per pass
    # re-uploads the device index through the ~30 MB/s tunnel (0.4 GB for
    # the chr21 fixture = ~14 s/pass of pure h2d) and re-traces the jit
    # caches — neither is steady-state serving cost
    import jax as _jax

    from tpubwa.align.pair import align_pe_fastq
    from tpubwa.align.pipeline import Aligner, run_se_pipeline
    from tpubwa.index.fmindex import FMIndex

    idx = FMIndex.load(ref_fa)
    chain = MemOptions.auto_chain(_jax.devices()[0].platform,
                                  len(_jax.devices()))
    opt = MemOptions.preset(chain[0])
    if batch_n:
        opt.batch_reads = batch_n
    aligner = Aligner(idx, opt)

    def run_pass(fq_a, fq_b, sink):
        if pe and fq_b:
            return align_pe_fastq(aligner, fq_a, fq_b, sink,
                                  workers=threads)
        return run_se_pipeline(aligner, fq_a, sink, workers=threads)

    t = time.monotonic()
    if pe:
        warm2 = os.path.join(_work_dir(), "warm2.fq")
        with open(fq2) as f, open(warm2, "w") as w:
            for i, line in enumerate(f):
                if i >= 4 * warm_n:
                    break
                w.write(line)
        run_pass(warm_fq, warm2, _NullOut())
    else:
        run_pass(warm_fq, None, _NullOut())
    print(f"[bench] warmup (compile) {time.monotonic()-t:.1f}s",
          file=sys.stderr)

    # MEDIAN of three full passes (VERDICT r4 weak #8: the shared chip's
    # load varies 2-3x run to run; best-of-2 made <1.3x deltas
    # indistinguishable from noise); every pass is a complete end-to-end
    # alignment of all reads
    n_pass = int(os.environ.get("TPUBWA_BENCH_PASSES", "3"))
    times = []
    aligner.timers = type(aligner.timers)()  # timed-region phase profile
    for _p in range(n_pass):
        sink = _NullOut()
        t0 = time.monotonic()
        run_pass(fq1, fq2, sink)
        times.append(time.monotonic() - t0)
    times.sort()
    dt = times[len(times) // 2] if n_pass >= 3 else times[0]
    print("[bench] pass times: "
          + " ".join(f"{x:.2f}s" for x in times), file=sys.stderr)
    print(aligner.timers.report(), file=sys.stderr)

    rps = n_reads / dt
    result = {
        "metric": ("reads_per_sec_1chip_"
                   + ("pe" if pe else "se") + f"_{ref_mb:g}Mb"
                   + ("" if style == "random" else f"_{style}")
                   + "_150bp_err1pct"),
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
