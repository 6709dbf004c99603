#!/usr/bin/env python
"""Bisect the cold-compile cost of the seeding program (VERDICT r2 missing
#2: 1,526s warmup).  Compiles each device piece separately at production
shapes and prints per-piece compile seconds.

Env: TPUBWA_SMEM_UNROLL to sweep the chain-step unroll factor.
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpubwa.config import MemOptions
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.io.fasta import Contig
    from tpubwa.ops import smem_chain
    from tpubwa.ops.fm import DeviceIndex
    from tpubwa.ops.seeds import seed_rows

    print(f"devices: {jax.devices()}  UNROLL={smem_chain.UNROLL}",
          file=sys.stderr)
    opt = MemOptions()
    B = int(os.environ.get("B", opt.batch_reads))
    L = opt.max_read_len

    rng = np.random.default_rng(0)
    ref_len = 200_000
    codes = rng.integers(0, 4, ref_len).astype(np.uint8)
    idx = FMIndex.build([Contig("c1", ref_len, 0)], codes)
    di = DeviceIndex.from_host(idx)
    q = jnp.asarray(rng.integers(0, 4, (B, L)), jnp.int32)
    lens = jnp.full((B,), 150, jnp.int32)

    def timed(name, f, *a, **kw):
        t0 = time.monotonic()
        lowered = f.lower(*a, **kw)
        t1 = time.monotonic()
        lowered.compile()
        t2 = time.monotonic()
        print(f"{name:32s} trace {t1-t0:7.1f}s  compile {t2-t1:7.1f}s")

    G = 2 * B
    rd = jnp.zeros((G,), jnp.int32)
    mid = jnp.full((G,), 40, jnp.int32)
    thr = jnp.ones((G,), jnp.int32)
    act = jnp.ones((G,), bool)

    which = os.environ.get("WHICH", "r1,r2,r3,seeds,full")
    if "r1" in which:
        timed("smem_round1_chain", smem_chain.smem_round1_chain, di, q, lens,
              min_seed_len=opt.min_seed_len, cap=opt.max_smems_per_read)
    if "r2" in which:
        timed("smem_through_chain", smem_chain.smem_through_chain, di, q,
              lens, rd, mid, thr, act, min_seed_len=opt.min_seed_len, cap=32)
    if "r3" in which:
        timed("smem_round3_chain", smem_chain.smem_round3_chain, di, q, lens,
              min_seed_len=opt.min_seed_len,
              max_mem_intv=opt.max_mem_intv, cap=opt.max_smems_per_read)
    if "seeds" in which:
        sm = smem_chain.smem_round1_chain(
            di, q, lens, min_seed_len=opt.min_seed_len,
            cap=opt.max_smems_per_read)
        timed("seed_rows", seed_rows, di, sm, max_occ=opt.max_occ,
              per_read_cap=opt.max_seeds_per_read)
    if "full" in which:
        t0 = time.monotonic()
        out = smem_chain.collect_smems_chain(
            di, q, lens, min_seed_len=opt.min_seed_len,
            split_len=opt.split_len, split_width=opt.split_width,
            max_mem_intv=opt.max_mem_intv, out_cap=opt.max_smems_per_read)
        jax.block_until_ready(out.n)
        print(f"{'collect (staged, cold)':32s} total {time.monotonic()-t0:7.1f}s")
        t0 = time.monotonic()
        out = smem_chain.collect_smems_chain(
            di, q, lens, min_seed_len=opt.min_seed_len,
            split_len=opt.split_len, split_width=opt.split_width,
            max_mem_intv=opt.max_mem_intv, out_cap=opt.max_smems_per_read)
        jax.block_until_ready(out.n)
        print(f"{'collect (staged, warm)':32s} total {time.monotonic()-t0:7.1f}s")


if __name__ == "__main__":
    main()
