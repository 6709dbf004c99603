#!/usr/bin/env python
"""Fine-grained phase profiler (round-2 diagnosis).

Splits what BENCH_r01's coarse timers blurred: device-seeding compute vs
download, extension-round host packing vs device wait, finalize GA device
time vs host Python.  Run on the real chip.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_READS = int(os.environ.get("N", "4096"))


def main():
    import jax

    from bench import _ensure_fixture
    from tpubwa.align.pipeline import Aligner
    from tpubwa.config import MemOptions
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.io.fastq import stream_batches

    ref_fa, fq1, _ = _ensure_fixture(4.6, 20000, False)
    idx = FMIndex.load(ref_fa)
    opt = MemOptions()
    al = Aligner(idx, opt)

    batches = []
    for b in stream_batches(fq1, opt.batch_reads, opt.max_read_len):
        batches.append(b)
        if sum(x.n for x in batches) >= N_READS + opt.batch_reads:
            break
    warm, batch = batches[0], batches[1]

    # ---- warmup (compile everything)
    t = time.monotonic()
    al.align_se_batch(warm, 0)
    print(f"warmup {time.monotonic()-t:.1f}s")

    n = batch.n
    print(f"== profiling batch of {n} reads ==")

    # 1. seeding: dispatch + block (device compute), then download
    t0 = time.monotonic()
    handle = al.seed_batch_dispatch(batch.codes, batch.lens)
    t_disp = time.monotonic() - t0
    cs, meta_dev = handle[0], handle[1]
    t0 = time.monotonic()
    jax.block_until_ready(meta_dev)
    jax.block_until_ready(cs.packed)
    t_seed_dev = time.monotonic() - t0
    t0 = time.monotonic()
    rows, l_rep = al.seed_batch_finish(handle)
    t_seed_dl = time.monotonic() - t0
    print(f"seed: dispatch {t_disp*1e3:.0f}ms  device {t_seed_dev*1e3:.0f}ms"
          f"  download {t_seed_dl*1e3:.0f}ms   ({len(rows)} seed rows)")

    # 2. chaining (host python)
    t0 = time.monotonic()
    chains = al.chain_batch(rows, l_rep, batch.lens)
    t_chain = time.monotonic() - t0
    nch = sum(len(c) for c in chains)
    nseeds = sum(len(ch.seeds) for c in chains for ch in c)
    print(f"chain: {t_chain*1e3:.0f}ms   ({nch} chains, {nseeds} seeds kept)")

    # 3. extension rounds: instrument packing vs device
    from tpubwa.align import region as regionmod
    from tpubwa.align.region import extend_read

    gens = [
        extend_read(opt, idx.l_pac, idx.fetch_ref, int(batch.lens[b]),
                    batch.codes[b, : batch.lens[b]], chains[b])
        for b in range(batch.n)
    ]
    # instrumented copy of run_extension_rounds
    import jax.numpy as jnp
    t_pack = t_dev = t_unpack = 0.0
    n_rounds = 0
    results = [None] * len(gens)
    pending = [None] * len(gens)
    live = set()
    for i, g in enumerate(gens):
        try:
            pending[i] = next(g)
            live.add(i)
        except StopIteration as e:
            results[i] = e.value or []
    mat_j = jnp.asarray(al.mat)
    q_pad, t_pad = 192, 768
    while live:
        n_rounds += 1
        t0 = time.monotonic()
        idxs = sorted(live)
        nb = len(idxs)
        B = 64
        while B < nb:
            B <<= 1
        t_max = max(max(min(len(pending[i].t_l), t_pad),
                        min(len(pending[i].t_r), t_pad)) for i in idxs)
        t_b = 256 if t_max <= 256 else t_pad
        q_l = np.full((B, q_pad), 4, np.int32)
        t_l = np.full((B, t_b), 4, np.int32)
        q_r = np.full((B, q_pad), 4, np.int32)
        t_r = np.full((B, t_b), 4, np.int32)
        qlen_l = np.zeros(B, np.int32); tlen_l = np.zeros(B, np.int32)
        qlen_r = np.zeros(B, np.int32); tlen_r = np.zeros(B, np.int32)
        h0 = np.ones(B, np.int32)
        for r, i in enumerate(idxs):
            job = pending[i]
            nql = min(len(job.q_l), q_pad); ntl = min(len(job.t_l), t_b)
            nqr = min(len(job.q_r), q_pad); ntr = min(len(job.t_r), t_b)
            q_l[r, :nql] = job.q_l[:nql]; t_l[r, :ntl] = job.t_l[:ntl]
            q_r[r, :nqr] = job.q_r[:nqr]; t_r[r, :ntr] = job.t_r[:ntr]
            qlen_l[r] = nql; tlen_l[r] = ntl
            qlen_r[r] = nqr; tlen_r[r] = ntr
            h0[r] = max(job.h0, 1)
        w0 = np.full(B, opt.w, np.int32)
        pen5 = np.full(B, opt.pen_clip5, np.int32)
        pen3 = np.full(B, opt.pen_clip3, np.int32)
        t_pack += time.monotonic() - t0
        t0 = time.monotonic()
        out = al._extend(
            jnp.asarray(q_l), jnp.asarray(qlen_l), jnp.asarray(t_l),
            jnp.asarray(tlen_l), jnp.asarray(q_r), jnp.asarray(qlen_r),
            jnp.asarray(t_r), jnp.asarray(tlen_r), mat_j, jnp.asarray(w0),
            jnp.asarray(h0), jnp.asarray(pen5), jnp.asarray(pen3),
            o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
            e_ins=opt.e_ins, zdrop=opt.zdrop, mat_max=opt.a)
        packed = np.asarray(jnp.stack(
            list(out.left) + list(out.right) + [out.aw0, out.aw1]))
        t_dev += time.monotonic() - t0
        t0 = time.monotonic()
        from tpubwa.ops.extend_ref import ExtendResult
        for r, i in enumerate(idxs):
            left = ExtendResult(*(int(packed[f, r]) for f in range(6)))
            right = ExtendResult(*(int(packed[6 + f, r]) for f in range(6)))
            res = (left, right, int(packed[12, r]), int(packed[13, r]))
            try:
                pending[i] = gens[i].send(res)
            except StopIteration as e:
                results[i] = e.value or []
                live.discard(i)
        t_unpack += time.monotonic() - t0
    print(f"extend: {n_rounds} rounds; pack {t_pack*1e3:.0f}ms  "
          f"device {t_dev*1e3:.0f}ms  unpack+gen {t_unpack*1e3:.0f}ms")
    regs = results

    # 4. finalize: instrument GA executor vs host
    from tpubwa.align import finalize
    from tpubwa.utils.rounds import drive_rounds

    class TimedExec:
        def __init__(self, inner):
            self.inner = inner
            self.t = 0.0
            self.n_jobs = 0
            self.n_calls = 0
        def __call__(self, jobs):
            t0 = time.monotonic()
            out = self.inner(jobs)
            self.t += time.monotonic() - t0
            self.n_jobs += len(jobs)
            self.n_calls += 1
            return out

    ex = TimedExec(al.ga_exec)
    t0 = time.monotonic()
    gens = [
        finalize.se_records_g(opt, idx, batch.names[b], batch.seqs[b],
                              batch.quals[b], batch.codes[b, : batch.lens[b]],
                              regs[b], b)
        for b in range(batch.n)
    ]
    out = drive_rounds(gens, ex)
    t_fin = time.monotonic() - t0
    t0 = time.monotonic()
    text = "".join(r.line() + "\n" for rl in out for r in rl)
    t_text = time.monotonic() - t0
    print(f"finalize: total {t_fin*1e3:.0f}ms (GA exec {ex.t*1e3:.0f}ms, "
          f"{ex.n_jobs} jobs in {ex.n_calls} rounds; host "
          f"{(t_fin-ex.t)*1e3:.0f}ms)  text {t_text*1e3:.0f}ms "
          f"({len(text)} bytes)")

    total = (t_seed_dev + t_seed_dl + t_chain + t_pack + t_dev + t_unpack
             + t_fin + t_text)
    print(f"TOTAL {total:.2f}s -> {n/total:.0f} reads/s")


if __name__ == "__main__":
    main()
