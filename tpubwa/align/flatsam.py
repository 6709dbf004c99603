"""Flat columnar SE SAM finalization.

The VERDICT-r2 "batch SAM assembly" redesign (reference analog: the
mem_sam_pe_batch move, docs-archive/ARM-BATCHED-SAM-PLAN.md): instead of
driving one finalize generator per read (finalize.se_records_g), the
common case — exactly ONE surviving alignment region — is processed as
columnar numpy over the whole batch:

  * mapq / band-width / retry-loop control: vectorized (bit-exact
    replicas of finalize.approx_mapq_se / infer_bw / reg2aln_g's loop)
  * reference windows: ONE device word-gather call (ops.fm.ref_window_right)
  * cigar DP: one bucketed global_align_cigar_batch call per retry round
    (most reads take the exact-match shortcut and never hit the DP)
  * NM/MD: vectorized mismatch masks for pure-M cigars; per-read
    cigar_nm_md only for gapped cigars
  * SAM text: one f-string per record, joined once

Reads with 0 or >=2 regions (or geometrically odd single regions) fall
back to the per-read generator path — semantics are identical by
construction and pinned by tests/test_flatsam.py (byte-equality vs the
generator pipeline on error/indel-rich simulations).
"""
from __future__ import annotations

import functools
import math

import jax
import numpy as np

from tpubwa.align import finalize
from tpubwa.config import MemOptions
from tpubwa.ops.global_align import cigar_nm_md, steps_to_cigar
from tpubwa.utils.rounds import drive_rounds

QPAD = 192     # query window pad (== GA bucket Q)
TWIN = 256     # reference window pad (== GA bucket T)
MD_CHARS = "ACGTN"
CIGAR_OPS = "MIDSH"


def _trunci(x) -> np.ndarray:
    """float -> int with Python int() semantics (truncate toward zero)."""
    return np.trunc(x).astype(np.int64)


def _log_exact(l: np.ndarray) -> np.ndarray:
    """math.log per distinct integer value (bit-exact vs the scalar path;
    numpy's SIMD log may differ by an ulp)."""
    ul, inv = np.unique(l, return_inverse=True)
    logs = np.array([math.log(float(v)) for v in ul], dtype=np.float64)
    return logs[inv]


def _infer_bw_vec(l1, l2, score, a: int, q: int, r: int) -> np.ndarray:
    """finalize.infer_bw, vectorized."""
    w = _trunci((np.minimum(l1, l2) * a - score - q) / r + 2.0)
    w = np.maximum(w, np.abs(l1 - l2))
    zero = (l1 == l2) & (l1 * a - score < (q + r - a) * 2)
    return np.where(zero, 0, w)


def _pow2(n: int, lo: int = 64) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


MM_K = 24   # per-lane mismatch pack capacity (150bp @ a few % error)


@functools.partial(jax.jit,
                   static_argnames=("q_pad", "t_win", "a", "b", "mm_k"))
def _flat_windows(di, codes, rd, qb, lq, rb, rlen, rev, *,
                  q_pad: int, t_win: int, a: int, b: int,
                  mm_k: int = MM_K):
    """Device half of the flat finalize: build the SAM/DP-oriented query
    and reference window buffers (genome-forward; revcomp'd rows for rev
    hits), plus the exact-match score, mismatch count, and a COMPACTED
    mismatch pack (positions + reference letters).

    The window buffers stay device-resident (the GA wrapper gathers lanes
    from them on device); only the compact per-lane vectors download —
    the axon tunnel's device->host path is ~10 MB/s, so shipping the full
    [lanes, q_pad+t_win] buffers would dominate the whole SAM phase."""
    import jax.numpy as jnp

    from tpubwa.ops.fm import ref_window_right

    I32 = jnp.int32
    L = codes.shape[1]
    qg = codes[rd].astype(I32)                          # [N, L]
    jq = jnp.arange(q_pad, dtype=I32)[None, :]
    qF = jnp.take_along_axis(qg, jnp.minimum(qb[:, None] + jq, L - 1),
                             axis=1)
    qmask = jq < lq[:, None]
    qF = jnp.where(qmask, qF, 4)

    def revrows(arr, ln, P):
        j = jnp.arange(P, dtype=I32)[None, :]
        idx = jnp.clip(ln[:, None] - 1 - j, 0, P - 1)
        return jnp.take_along_axis(arr, idx, axis=1)

    comp = lambda x: jnp.where(x < 4, 3 - x, x)  # noqa: E731
    qD = jnp.where(rev[:, None], comp(revrows(qF, lq, q_pad)), qF)
    qD = jnp.where(qmask, qD, 4)

    W = ref_window_right(di, rb, t_win)                 # [N, t_win] 2l-asc
    jt = jnp.arange(t_win, dtype=I32)[None, :]
    tmask = jt < rlen[:, None]
    W = jnp.where(tmask, W, 4)
    tD = jnp.where(rev[:, None], comp(revrows(W, rlen, t_win)), W)
    tD = jnp.where(tmask, tD, 4)

    # exact-match pairing (orientation-invariant): bwa_fill_scmat values
    # are {match: a, mismatch: -b, N: -1}
    tq = W[:, :q_pad]
    pair = jnp.where(qF >= 4, -1, jnp.where(tq == qF, a, -b))
    exact_score = jnp.sum(jnp.where(qmask, pair, 0), axis=1).astype(I32)
    mm = qmask & ((qD != tD[:, :q_pad]) | (qD >= 4))
    nm = jnp.sum(mm, axis=1).astype(I32)
    # compacted mismatch pack: first mm_k mismatch columns, ascending
    key = jnp.where(mm, jq, q_pad + 1)
    pos = jnp.sort(key, axis=1)[:, :mm_k]
    let = jnp.take_along_axis(tD[:, :q_pad],
                              jnp.minimum(pos, q_pad - 1), axis=1)
    return (qD.astype(jnp.int8), tD.astype(jnp.int8), exact_score, nm,
            pos.astype(jnp.uint8), let.astype(jnp.uint8))


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins"))
def _ga_rows(qD, tD, rows, qlen, tlen, w, mat, *, o_del: int, e_del: int,
             o_ins: int, e_ins: int):
    """Global-alignment over device-resident window buffers: gather the
    requested lanes on device, run the batched DP + traceback, return
    (score i32, steps i8) — steps download at 1 byte/op."""
    import jax.numpy as jnp

    from tpubwa.ops.global_align import global_align_cigar_batch

    q = qD[rows].astype(jnp.int32)
    t = tD[rows].astype(jnp.int32)
    res = global_align_cigar_batch(q, qlen, t, tlen, mat, w, o_del=o_del,
                                   e_del=e_del, o_ins=o_ins, e_ins=e_ins)
    return res.score, res.steps.astype(jnp.int8)


@jax.jit
def _gather_rows(qD, tD, rows):
    """Row-gather of the device window buffers (host fallback for gapped
    cigars' NM/MD and for mismatch packs that overflowed MM_K)."""
    return qD[rows], tD[rows]


def se_text_batch(aligner, batch, read_id0: int, fields: dict,
                  bounds: np.ndarray, codes_dev=None) -> str:
    """SAM text for a ReadBatch from flat region arrays (fields/bounds as
    returned by flatext.finalize_fields).  codes_dev: the device-resident
    read batch from seeding (re-uploaded if absent)."""
    import jax.numpy as jnp

    opt: MemOptions = aligner.opt
    idx = aligner.idx
    l_pac = idx.l_pac
    B = batch.n
    lens = np.asarray(batch.lens[:B], dtype=np.int64)
    cnt = np.diff(bounds)
    j0 = bounds[:-1]
    j0s = np.minimum(j0, max(len(fields["score"]) - 1, 0))
    first_score = np.where(cnt > 0, fields["score"][j0s], -1)

    simple = cnt == 1
    unmapped = (cnt == 0) | (simple & (first_score < opt.T))

    # geometric eligibility of the flat path for simple reads
    s_rows = np.flatnonzero(simple & (first_score >= opt.T))
    if s_rows.size:
        j = j0[s_rows]
        rb_, re_, qb_, qe_ = (fields["rb"][j], fields["re"][j],
                              fields["qb"][j], fields["qe"][j])
        lq_, rlen_ = qe_ - qb_, re_ - rb_
        ok = ((lq_ > 0) & (rlen_ > 0) & (lq_ <= QPAD) & (rlen_ <= TWIN)
              & ~((rb_ < l_pac) & (l_pac < re_)))
        flat_rows = s_rows[ok]
    else:
        flat_rows = s_rows
    flat_set = np.zeros(B, bool)
    flat_set[flat_rows] = True
    complex_rows = np.flatnonzero(~unmapped & ~flat_set)

    out: list[str] = [""] * B

    # ---------------------------------------------------- unmapped ----
    for b in np.flatnonzero(unmapped):
        q = batch.quals[b] or "*"
        out[b] = (f"{batch.names[b]}\t4\t*\t0\t0\t*\t*\t0\t0\t"
                  f"{batch.seqs[b]}\t{q}\n")

    # ------------------------------------------- complex: generators ----
    if complex_rows.size:
        gens = [
            finalize.se_records_g(
                opt, idx, batch.names[b], batch.seqs[b], batch.quals[b],
                batch.codes[b, : batch.lens[b]],
                _alnregs_for(fields, bounds, int(b)), read_id0 + int(b))
            for b in complex_rows
        ]
        for b, recs in zip(complex_rows, drive_rounds(gens, aligner.ga_exec)):
            out[b] = "".join(r.line() + "\n" for r in recs)

    # ----------------------------------------------- flat columnar ----
    N = flat_rows.size
    if N == 0:
        return "".join(out)
    j = j0[flat_rows]
    rb = fields["rb"][j].astype(np.int64)
    re = fields["re"][j].astype(np.int64)
    qb = fields["qb"][j].astype(np.int64)
    qe = fields["qe"][j].astype(np.int64)
    score = fields["score"][j].astype(np.int64)
    truesc = fields["truesc"][j].astype(np.int64)
    aw = fields["w"][j].astype(np.int64)
    frac = fields["frac_rep"][j]
    L = lens[flat_rows]
    lq = qe - qb
    rlen = re - rb
    rev = rb >= l_pac
    pos0 = np.where(rev, 2 * l_pac - re, rb)      # genome-forward, 0-based
    offs = aligner.contig_offsets
    rid = np.searchsorted(offs, pos0, side="right") - 1

    # mapq — finalize.approx_mapq_se with the single-region invariants
    # (mark_primary sets sub=0; flat AlnRegs carry csub=0, sub_n=0)
    a_, b_ = opt.a, opt.b
    subv = opt.min_seed_len * a_
    lmax = np.maximum(lq, rlen)
    identity = 1.0 - (lmax * a_ - score) / (a_ + b_) / lmax
    tmp = np.where(lmax < opt.mapQ_coef_len, 1.0,
                   opt.mapQ_coef_fac / _log_exact(lmax))
    tmp = tmp * identity * identity
    mapq = _trunci(6.02 * (score - subv) / a_ * tmp * tmp + 0.499)
    mapq = np.maximum(np.minimum(mapq, 60), 0)
    mapq = _trunci(mapq * (1.0 - frac) + 0.499)
    mapq = np.where(subv >= score, 0, mapq)

    # band for the final global alignment (reg2aln_g)
    w2 = np.maximum(
        _infer_bw_vec(lq, rlen, truesc, a_, opt.o_del, opt.e_del),
        _infer_bw_vec(lq, rlen, truesc, a_, opt.o_ins, opt.e_ins))
    w2 = np.where(w2 > opt.w, np.minimum(w2, aw), w2)

    # device half: oriented query/ref window buffers + exact score + NM
    # (codes are already device-resident from seeding; one jit call)
    lanes = _pow2(N, 256)

    def padv(a, dtype=np.int32):
        v = np.zeros(lanes, dtype)
        v[:N] = a
        return v

    if codes_dev is None:
        codes_dev = jnp.asarray(np.asarray(batch.codes, np.int32))
    qDj, tDj, esj, nmj, mposj, mletj = _flat_windows(
        aligner.di, codes_dev, jnp.asarray(padv(flat_rows)),
        jnp.asarray(padv(qb)), jnp.asarray(padv(lq)),
        jnp.asarray(padv(rb)), jnp.asarray(padv(rlen)),
        jnp.asarray(padv(rev, np.bool_)),
        q_pad=QPAD, t_win=TWIN, a=opt.a, b=opt.b)
    # qDj/tDj stay on device; only compact vectors download (~10 MB/s d2h)
    exact_score = np.asarray(esj)[:N].astype(np.int64)
    nm_dev = np.asarray(nmj)[:N].astype(np.int64)
    mm_pos = np.asarray(mposj)[:N]
    mm_let = np.asarray(mletj)[:N]

    # reg2aln_g's band-doubling retry loop, on shrinking subsets
    res_score = np.zeros(N, np.int64)
    res_cigar: list = [None] * N
    last_sc = np.full(N, -(1 << 30), np.int64)
    active = np.arange(N)
    maxw = opt.w * 4
    it = 0
    while active.size:
        w_eff = np.minimum(w2[active], maxw)
        sc_it = np.empty(active.size, np.int64)
        exact = (lq[active] == rlen[active]) & (w_eff == 0)
        eidx = np.flatnonzero(exact)
        if eidx.size:
            rows = active[eidx]
            sc_it[eidx] = exact_score[rows]
            for k, r in zip(eidx, rows):
                res_cigar[r] = [(0, int(lq[r]))]
        didx = np.flatnonzero(~exact)
        if didx.size:
            rows = active[didx]
            # gen_cigar_g's inner band computation
            lqr, rlr = lq[rows], rlen[rows]
            max_ins = _trunci((((lqr + 1) >> 1) * a_ - opt.o_ins)
                              / opt.e_ins + 1.0)
            max_del = _trunci((((lqr + 1) >> 1) * a_ - opt.o_del)
                              / opt.e_del + 1.0)
            max_gap = np.maximum(np.maximum(max_ins, max_del), 1)
            ww = (max_gap + np.abs(rlr - lqr) + 1) >> 1
            ww = np.minimum(ww, w_eff[didx])
            ww = np.maximum(ww, np.abs(rlr - lqr) + 3)
            M = _pow2(didx.size)

            def padm(a, dtype=np.int32):
                v = np.zeros(M, dtype)
                v[: didx.size] = a
                return v

            sc_dev, steps_dev = _ga_rows(
                qDj, tDj, jnp.asarray(padm(rows)), jnp.asarray(padm(lqr)),
                jnp.asarray(padm(rlr)), jnp.asarray(padm(ww)),
                aligner.mat_dev, o_del=opt.o_del, e_del=opt.e_del,
                o_ins=opt.o_ins, e_ins=opt.e_ins)
            sc = np.asarray(sc_dev)
            steps = np.asarray(steps_dev)
            sc_it[didx] = sc[: didx.size]
            for lane, r in enumerate(rows):
                res_cigar[r] = steps_to_cigar(steps[lane])
        res_score[active] = sc_it
        done = (sc_it == last_sc[active]) | (w_eff == maxw)
        last_sc[active] = sc_it
        w2[active] = w_eff << 1
        it += 1
        cont = (~done) & (it < 3) & (sc_it < truesc[active] - a_)
        active = active[cont]

    # NM/MD: from the device mismatch pack for pure-M cigars; gapped
    # cigars (and the rare >MM_K pack overflow) fetch their window rows
    pure_m = np.array([c is not None and len(c) == 1 and c[0][0] == 0
                       for c in res_cigar])
    nm = np.zeros(N, np.int64)
    md: list[str] = [""] * N
    need_rows = np.flatnonzero(~pure_m | (nm_dev > MM_K))
    qh = th = None
    if need_rows.size:
        M = _pow2(need_rows.size)
        rpad = np.zeros(M, np.int32)
        rpad[: need_rows.size] = need_rows
        qhj, thj = _gather_rows(qDj, tDj, jnp.asarray(rpad))
        qh = np.asarray(qhj)[: need_rows.size]
        th = np.asarray(thj)[: need_rows.size]
        rowmap = {int(r): i for i, r in enumerate(need_rows)}
    for r in np.flatnonzero(pure_m):
        nm[r] = nm_dev[r]
        k = int(nm_dev[r])
        if k == 0:
            md[r] = str(int(lq[r]))
        elif k <= MM_K:
            parts = []
            prev = 0
            for c, t in zip(mm_pos[r, :k], mm_let[r, :k]):
                parts.append(str(int(c) - prev))
                parts.append(MD_CHARS[int(t)])
                prev = int(c) + 1
            parts.append(str(int(lq[r]) - prev))
            md[r] = "".join(parts)
        else:                       # pack overflow: rebuild from the rows
            i = rowmap[r]
            _, md[r] = cigar_nm_md(qh[i, : lq[r]], th[i, : rlen[r]],
                                   res_cigar[r])
    for r in np.flatnonzero(~pure_m):
        i = rowmap[r]
        n_, m_ = cigar_nm_md(qh[i, : lq[r]], th[i, : rlen[r]],
                             res_cigar[r])
        nm[r] = n_
        md[r] = m_

    # position fixups + clips + cigar strings (aln2sam field rules)
    clip5 = np.where(rev, L - qe, qb)
    clip3 = np.where(rev, qb, L - qe)
    names, seqs, quals = batch.names, batch.seqs, batch.quals
    cnames = [c.name for c in idx.contigs]
    for i in range(N):
        b = int(flat_rows[i])
        cigar = res_cigar[i]
        p = int(pos0[i])
        if cigar and cigar[0][0] == 2:      # squeeze edge deletions
            p += cigar[0][1]
            cigar = cigar[1:]
        if cigar and cigar[-1][0] == 2:
            cigar = cigar[:-1]
        c5, c3 = int(clip5[i]), int(clip3[i])
        cs = "".join(f"{ln}{CIGAR_OPS[op]}" for op, ln in cigar)
        if c5:
            cs = f"{c5}S" + cs
        if c3:
            cs = cs + f"{c3}S"
        r = int(rid[i])
        p1 = p - int(offs[r]) + 1
        if rev[i]:
            seq = seqs[b].translate(finalize.REVCOMP_TRANS)[::-1]
            qual = quals[b][::-1] if quals[b] else "*"
            flag = 16
        else:
            seq = seqs[b]
            qual = quals[b] or "*"
            flag = 0
        out[b] = (f"{names[b]}\t{flag}\t{cnames[r]}\t{p1}\t{int(mapq[i])}\t"
                  f"{cs}\t*\t0\t0\t{seq}\t{qual}\t"
                  f"NM:i:{int(nm[i])}\tMD:Z:{md[i]}\t"
                  f"AS:i:{int(score[i])}\tXS:i:0\n")
    return "".join(out)


def _alnregs_for(fields: dict, bounds: np.ndarray, b: int):
    """Materialize AlnReg objects for one read (complex-path fallback)."""
    from tpubwa.align.region import AlnReg

    regs = []
    for i in range(int(bounds[b]), int(bounds[b + 1])):
        regs.append(AlnReg(
            rb=int(fields["rb"][i]), re=int(fields["re"][i]),
            qb=int(fields["qb"][i]), qe=int(fields["qe"][i]),
            rid=int(fields["rid"][i]), score=int(fields["score"][i]),
            truesc=int(fields["truesc"][i]), w=int(fields["w"][i]),
            seedcov=int(fields["seedcov"][i]),
            seedlen0=int(fields["seedlen0"][i]),
            frac_rep=float(fields["frac_rep"][i])))
    return regs
