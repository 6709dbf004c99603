#!/usr/bin/env python
"""Break down device seeding: round1 / round2 / round3 / expand / compact."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from bench import _ensure_fixture
from tpubwa.config import MemOptions
from tpubwa.index.fmindex import FMIndex
from tpubwa.io.fastq import stream_batches

N = int(os.environ.get("N", "4096"))
ref_fa, fq1, _ = _ensure_fixture(4.6, 20000, False)
idx = FMIndex.load(ref_fa)
opt = MemOptions()

import jax
import jax.numpy as jnp
from tpubwa.ops.fm import DeviceIndex
from tpubwa.ops.smem_chain import (smem_round1_chain, smem_round3_chain,
                                   collect_smems_chain)
from tpubwa.ops.seeds import smems_to_seeds, compact_seeds

di = DeviceIndex.from_host(idx)
batches = list(b for i, b in zip(range(2), stream_batches(fq1, N, 160)))

def force(x):
    if hasattr(x, "_fields"):
        return sum(float(jnp.sum(getattr(x, f))) for f in x._fields)
    return float(jnp.sum(x))

def t(label, fn, n=3):
    force(fn())  # compile
    ts = []
    for _ in range(n):
        t0 = time.monotonic()
        force(fn())
        ts.append(time.monotonic() - t0)
    print(f"  {label:28s} {min(ts)*1000:8.1f} ms (min of {n})")
    return min(ts)

for b in batches[:1]:
    q = jnp.asarray(b.codes, jnp.int32)
    lens = jnp.asarray(b.lens)
    print(f"B={b.n}")
    t("round1", lambda: smem_round1_chain(di, q, lens, min_seed_len=19, cap=64))
    t("round3", lambda: smem_round3_chain(di, q, lens, min_seed_len=19,
                                          max_mem_intv=20, cap=64))
    t("collect(all)", lambda: collect_smems_chain(
        di, q, lens, min_seed_len=opt.min_seed_len, split_len=opt.split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
        out_cap=opt.max_smems_per_read))
    sm = collect_smems_chain(di, q, lens, min_seed_len=opt.min_seed_len,
                             split_len=opt.split_len, split_width=opt.split_width,
                             max_mem_intv=opt.max_mem_intv,
                             out_cap=opt.max_smems_per_read)
    jax.block_until_ready(sm)
    t("expand", lambda: smems_to_seeds(di, sm, max_occ=opt.max_occ,
                                       out_seeds=opt.max_seeds_per_read))
    sb = smems_to_seeds(di, sm, max_occ=opt.max_occ, out_seeds=opt.max_seeds_per_read)
    jax.block_until_ready(sb)
    t("compact", lambda: compact_seeds(sb))
    from tpubwa.ops.seeds import seed_rows
    t("seed_rows(fused)", lambda: seed_rows(di, sm, max_occ=opt.max_occ,
                                            per_read_cap=opt.max_seeds_per_read))
    # how many round-2 candidates?
    n_ = np.asarray(sm.n)
    print(f"  smems: total={int(n_.sum())} max/read={int(n_.max())}")
