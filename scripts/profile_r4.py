#!/usr/bin/env python
"""Round-4 production-path profiler.

Breaks the flat SE path into its real stages on the chip:
  seeding: dispatch / r1 / r2 / r3+sort / expand / meta+rows download
  chain:   native ext_prepare
  extend:  device waves
  final:   native ext_finalize + flatsam (device windows / GA / host text)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_READS = int(os.environ.get("N", "4096"))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _ensure_fixture
    from tpubwa.align import flatext, flatsam
    from tpubwa.align.pipeline import Aligner
    from tpubwa.cli import _enable_compile_cache
    from tpubwa.config import MemOptions
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.io.fastq import stream_batches

    _enable_compile_cache()
    import os as _os
    style = _os.environ.get("STYLE", "random")
    mb = float(_os.environ.get("REF_MB", "4.6"))
    ref_fa, fq1, _ = _ensure_fixture(mb, 20000, False, style=style)
    idx = FMIndex.load(ref_fa)
    opt = MemOptions()
    al = Aligner(idx, opt)

    batches = []
    for b in stream_batches(fq1, opt.batch_reads, opt.max_read_len):
        batches.append(b)
        if len(batches) >= 2:
            break
    warm, batch = batches[0], batches[1]

    t = time.monotonic()
    al.align_se_text(warm, 0)
    print(f"warmup {time.monotonic()-t:.1f}s")

    n = batch.n
    print(f"== profiling batch of {n} reads ==")

    # --- seeding stages individually (after warm) ---
    from tpubwa.ops.smem_chain import _smem_r1_prep, _smem_r2_loop, \
        _smem_r3_sort
    from tpubwa.ops.seeds import seed_rows as seed_rows_fn

    q = jnp.asarray(np.asarray(batch.codes, np.int32))
    lens = jnp.asarray(np.asarray(batch.lens, np.int32))

    def timeit(label, fn, reps=3):
        out = fn()
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.monotonic()
            out = fn()
            jax.block_until_ready(out)
            best = min(best, time.monotonic() - t0)
        print(f"  {label:24s} {best*1e3:8.1f} ms")
        return out, best

    kw = dict(min_seed_len=opt.min_seed_len, split_len=opt.split_len,
              split_width=opt.split_width, out_cap=opt.max_smems_per_read)
    (r1out, t_r1) = timeit("r1_prep", lambda: _smem_r1_prep(
        al.di, q, lens, min_seed_len=opt.min_seed_len,
        split_len=opt.split_len, split_width=opt.split_width,
        out_cap=opt.max_smems_per_read))
    mems, src_tab, r1s, r1e, r1w, total = r1out
    G = 2 * batch.n
    (mems2, t_r2) = timeit("r2_loop", lambda: _smem_r2_loop(
        al.di, q, lens, mems, src_tab, r1s, r1e, r1w, total,
        min_seed_len=opt.min_seed_len, r2_cap=32,
        out_cap=opt.max_smems_per_read, G=G))
    (sm, t_r3) = timeit("r3_sort", lambda: _smem_r3_sort(
        al.di, q, lens, mems2, min_seed_len=opt.min_seed_len,
        max_mem_intv=opt.max_mem_intv, out_cap=opt.max_smems_per_read))
    (cs, t_exp) = timeit("seed_rows(expand)", lambda: seed_rows_fn(
        al.di, sm, max_occ=opt.max_occ,
        per_read_cap=opt.max_seeds_per_read))

    # full dispatch+finish (timed end to end)
    t0 = time.monotonic()
    handle = al.seed_batch_dispatch(batch.codes, batch.lens)
    t_disp = time.monotonic() - t0
    cs2, meta_dev = handle[0], handle[1]
    t0 = time.monotonic()
    jax.block_until_ready(meta_dev)
    t_dev = time.monotonic() - t0
    t0 = time.monotonic()
    rows, l_rep = al.seed_batch_finish(handle)
    t_dl = time.monotonic() - t0
    print(f"  dispatch {t_disp*1e3:.0f}ms  device-wait {t_dev*1e3:.0f}ms  "
          f"finish/download {t_dl*1e3:.0f}ms  ({len(rows)} seed rows, "
          f"{rows.nbytes} B)")

    # --- chain prepare (native) ---
    B = batch.n
    t0 = time.monotonic()
    bounds = np.searchsorted(rows[:, 0], np.arange(B + 1))
    skip = (np.asarray(batch.lens) < opt.min_seed_len).astype(np.uint8)
    prep = flatext.prepare_jobs(opt, idx.l_pac, al.contig_offsets, rows,
                                bounds, skip, batch.lens, l_rep[:B])
    t_prep = time.monotonic() - t0
    handle2, jobs, n_jobs = prep
    print(f"  ext_prepare {t_prep*1e3:.0f}ms  ({n_jobs} jobs)")

    # --- extension waves ---
    codes_dev, lens_dev = handle[2], handle[3]
    t0 = time.monotonic()
    results = flatext.run_waves(al, codes_dev, lens_dev, jobs, n_jobs)
    t_waves = time.monotonic() - t0
    t0 = time.monotonic()
    fields, fbounds = flatext.finalize_fields(handle2, results, B, n_jobs)
    t_fin = time.monotonic() - t0
    print(f"  waves {t_waves*1e3:.0f}ms   ext_finalize {t_fin*1e3:.0f}ms")

    # --- flat SAM ---
    t0 = time.monotonic()
    text = flatsam.se_text_batch(al, batch, 0, fields, fbounds,
                                 codes_dev=codes_dev)
    t_sam = time.monotonic() - t0
    print(f"  flatsam {t_sam*1e3:.0f}ms  ({len(text)} bytes)")

    # flatsam sub-stages (replicated classification; profiler-only)
    opt2 = opt
    B2 = batch.n
    cnt = np.diff(fbounds)
    j0 = fbounds[:-1]
    j0s = np.minimum(j0, max(len(fields["score"]) - 1, 0))
    first_score = np.where(cnt > 0, fields["score"][j0s], -1)
    simple = cnt == 1
    s_rows = np.flatnonzero(simple & (first_score >= opt2.T))
    jj = j0[s_rows]
    rb_, re_, qb_, qe_ = (fields["rb"][jj], fields["re"][jj],
                          fields["qb"][jj], fields["qe"][jj])
    lq_, rlen_ = qe_ - qb_, re_ - rb_
    ok = ((lq_ > 0) & (rlen_ > 0) & (lq_ <= flatsam.QPAD)
          & (rlen_ <= flatsam.TWIN)
          & ~((rb_ < idx.l_pac) & (idx.l_pac < re_)))
    flat_rows = s_rows[ok]
    N = flat_rows.size
    print(f"  [flat classification: {N} flat, "
          f"{B2 - N} complex/unmapped]")
    jf = j0[flat_rows]
    rb = fields["rb"][jf].astype(np.int64)
    re_a = fields["re"][jf].astype(np.int64)
    qb_a = fields["qb"][jf].astype(np.int64)
    qe_a = fields["qe"][jf].astype(np.int64)
    lq = qe_a - qb_a
    rlen = re_a - rb
    rev = rb >= idx.l_pac
    lanes = flatsam._pow2(N, 256)

    def padv(a, dtype=np.int32):
        v = np.zeros(lanes, dtype)
        v[:N] = a
        return v

    def run_windows():
        return flatsam._flat_windows(
            al.di, codes_dev, jnp.asarray(padv(flat_rows)),
            jnp.asarray(padv(qb_a)), jnp.asarray(padv(lq)),
            jnp.asarray(padv(rb)), jnp.asarray(padv(rlen)),
            jnp.asarray(padv(rev, np.bool_)),
            q_pad=flatsam.QPAD, t_win=flatsam.TWIN, a=opt2.a, b=opt2.b)

    outw, t_win = timeit("flat_windows(dev)", run_windows)
    qDj, tDj, pkj = outw
    t0 = time.monotonic()
    _ = np.asarray(pkj)
    t_wdl = time.monotonic() - t0
    print(f"  windows download {t_wdl*1e3:.0f}ms ({pkj.nbytes} B)")

    # GA-loop + host-text split via monkeypatch
    acc = {"ga": 0.0, "ga_calls": 0, "ga_lanes": 0}
    real_ga = flatsam._ga_rows

    def timed_ga(*a, **k):
        t0 = time.monotonic()
        out = real_ga(*a, **k)
        jax.block_until_ready(out)
        acc["ga"] += time.monotonic() - t0
        acc["ga_calls"] += 1
        acc["ga_lanes"] += a[2].shape[0]
        return out

    flatsam._ga_rows = timed_ga
    t0 = time.monotonic()
    text = flatsam.se_text_batch(al, batch, 0, fields, fbounds,
                                 codes_dev=codes_dev)
    t_sam2 = time.monotonic() - t0
    flatsam._ga_rows = real_ga
    print(f"  flatsam again {t_sam2*1e3:.0f}ms: GA dev {acc['ga']*1e3:.0f}ms"
          f" ({acc['ga_calls']} calls, {acc['ga_lanes']} lanes); "
          f"residual host ~{(t_sam2 - acc['ga'] - t_win - t_wdl)*1e3:.0f}ms")

    total_t = (t_dev + t_dl + t_prep + t_waves + t_fin + t_sam)
    print(f"TOTAL (serial, excl dispatch) {total_t:.2f}s -> "
          f"{n/total_t:.0f} reads/s single-stream")
    print(f"  device share: seed {t_r1+t_r2+t_r3+t_exp:.2f}s  "
          f"(r1 {t_r1:.2f} r2 {t_r2:.2f} r3 {t_r3:.2f} exp {t_exp:.2f})")


if __name__ == "__main__":
    main()
