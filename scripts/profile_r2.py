#!/usr/bin/env python
"""Fine-grained round-2 profiling: split each phase into
device-compute / download / host-python subcosts on one batch."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from bench import _ensure_fixture
from tpubwa.align.pipeline import Aligner
from tpubwa.config import MemOptions
from tpubwa.index.fmindex import FMIndex
from tpubwa.io.fastq import stream_batches

N = int(os.environ.get("N", "4096"))
ref_fa, fq1, _ = _ensure_fixture(4.6, 20000, False)
idx = FMIndex.load(ref_fa)
al = Aligner(idx, MemOptions())

batches = []
for b in stream_batches(fq1, N, 160):
    batches.append(b)
    if len(batches) >= 2:
        break

import jax
import jax.numpy as jnp

def bsync(x):
    jax.block_until_ready(x)

def run(batch, label):
    t0 = time.monotonic()
    # --- seeding: dispatch + block (device compute) ---
    handle = al.seed_batch_dispatch(batch.codes, batch.lens)
    cs, meta_dev = handle[0], handle[1]
    bsync(meta_dev)
    bsync(cs.packed)
    t1 = time.monotonic()
    # --- download seeds ---
    rows, l_rep = al.seed_batch_finish(handle)
    t2 = time.monotonic()
    # --- chain ---
    chains = al.chain_batch(rows, l_rep, batch.lens)
    t3 = time.monotonic()
    # --- extension: instrument inside ---
    import tpubwa.align.region as regionmod
    from tpubwa.align.region import extend_read
    gens = [extend_read(al.opt, idx.l_pac, idx.fetch_ref, int(batch.lens[i]),
                        batch.codes[i, :batch.lens[i]], chains[i])
            for i in range(batch.n)]
    # instrumented copy of run_extension_rounds
    opt, mat = al.opt, al.mat
    from tpubwa.ops.extend_ref import ExtendResult
    n = len(gens)
    results = [None]*n
    pending = [None]*n
    live = set()
    tm = dict(pack=0.0, dev=0.0, dl=0.0, gen=0.0)
    tg = time.monotonic()
    for i, g in enumerate(gens):
        try:
            pending[i] = next(g); live.add(i)
        except StopIteration as e:
            results[i] = e.value or []
    tm["gen"] += time.monotonic()-tg
    mat_j = jnp.asarray(mat)
    q_pad, t_pad = 192, 768
    nrounds = 0
    lanes_tot = 0
    while live:
        nrounds += 1
        idxs = sorted(live); nb = len(idxs); lanes_tot += nb
        B = 64
        while B < nb: B <<= 1
        tp = time.monotonic()
        t_max = max(max(min(len(pending[i].t_l), t_pad),
                        min(len(pending[i].t_r), t_pad)) for i in idxs)
        t_b = 256 if t_max <= 256 else t_pad
        q_l = np.full((B, q_pad), 4, np.int32); t_l = np.full((B, t_b), 4, np.int32)
        q_r = np.full((B, q_pad), 4, np.int32); t_r = np.full((B, t_b), 4, np.int32)
        qlen_l = np.zeros(B, np.int32); tlen_l = np.zeros(B, np.int32)
        qlen_r = np.zeros(B, np.int32); tlen_r = np.zeros(B, np.int32)
        h0 = np.ones(B, np.int32)
        for r, i in enumerate(idxs):
            job = pending[i]
            nql = min(len(job.q_l), q_pad); ntl = min(len(job.t_l), t_b)
            nqr = min(len(job.q_r), q_pad); ntr = min(len(job.t_r), t_b)
            q_l[r, :nql] = job.q_l[:nql]; t_l[r, :ntl] = job.t_l[:ntl]
            q_r[r, :nqr] = job.q_r[:nqr]; t_r[r, :ntr] = job.t_r[:ntr]
            qlen_l[r] = nql; tlen_l[r] = ntl; qlen_r[r] = nqr; tlen_r[r] = ntr
            h0[r] = max(job.h0, 1)
        w0 = np.full(B, opt.w, np.int32)
        pen5 = np.full(B, opt.pen_clip5, np.int32)
        pen3 = np.full(B, opt.pen_clip3, np.int32)
        tm["pack"] += time.monotonic()-tp
        td = time.monotonic()
        out = al._extend(
            jnp.asarray(q_l), jnp.asarray(qlen_l), jnp.asarray(t_l),
            jnp.asarray(tlen_l), jnp.asarray(q_r), jnp.asarray(qlen_r),
            jnp.asarray(t_r), jnp.asarray(tlen_r), mat_j, jnp.asarray(w0),
            jnp.asarray(h0), jnp.asarray(pen5), jnp.asarray(pen3),
            o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
            e_ins=opt.e_ins, zdrop=opt.zdrop, mat_max=opt.a)
        stacked = jnp.stack(list(out.left) + list(out.right) + [out.aw0, out.aw1])
        bsync(stacked)
        tm["dev"] += time.monotonic()-td
        tdl = time.monotonic()
        packed = np.asarray(stacked)
        tm["dl"] += time.monotonic()-tdl
        tg = time.monotonic()
        for r, i in enumerate(idxs):
            left = ExtendResult(*(int(packed[f, r]) for f in range(6)))
            right = ExtendResult(*(int(packed[6 + f, r]) for f in range(6)))
            res = (left, right, int(packed[12, r]), int(packed[13, r]))
            try:
                pending[i] = gens[i].send(res)
            except StopIteration as e:
                results[i] = e.value or []
                live.discard(i)
        tm["gen"] += time.monotonic()-tg
    regs = results
    t4 = time.monotonic()
    # --- finalize: instrument ---
    from tpubwa.align import finalize
    from tpubwa.utils.rounds import drive_rounds
    gens = [finalize.se_records_g(opt, idx, batch.names[b], batch.seqs[b],
                                  batch.quals[b], batch.codes[b, :batch.lens[b]],
                                  regs[b], b)
            for b in range(batch.n)]
    # measure executor time separately
    fin_tm = dict(exec=0.0)
    orig_exec = al.ga_exec
    class TimedExec:
        def __call__(self, jobs):
            t = time.monotonic()
            r = orig_exec(jobs)
            fin_tm["exec"] += time.monotonic()-t
            return r
    out = drive_rounds(gens, TimedExec())
    t5 = time.monotonic()
    # SAM text
    text = "".join(r.line() + "\n" for rlist in out for r in rlist)
    t6 = time.monotonic()
    nseeds = len(rows)
    print(f"[{label}] B={batch.n} seeds={nseeds} ext_rounds={nrounds} lanes={lanes_tot}")
    print(f"  seed_dev    {t1-t0:7.3f}")
    print(f"  seed_dl     {t2-t1:7.3f}")
    print(f"  chain       {t3-t2:7.3f}")
    print(f"  extension   {t4-t3:7.3f}  (pack {tm['pack']:.3f} dev {tm['dev']:.3f} dl {tm['dl']:.3f} gen {tm['gen']:.3f})")
    print(f"  finalize    {t5-t4:7.3f}  (ga_exec {fin_tm['exec']:.3f} host {t5-t4-fin_tm['exec']:.3f})")
    print(f"  sam_text    {t6-t5:7.3f}")
    print(f"  TOTAL       {t6-t0:7.3f}")
    return out

run(batches[0], "warmup/compile")
run(batches[1], "steady")
run(batches[0], "steady2")
