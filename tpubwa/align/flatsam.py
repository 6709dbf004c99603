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
from tpubwa.ops.global_align import cigar_nm_md
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
    """Lane-bucket size: 4^k granularity up to 4096 (64, 256, 1024, 4096),
    pow2 above (8192, 16384, ...).  Coarse buckets keep the set of
    compiled shapes tiny — a tail batch whose subset sizes land in a
    never-seen pow2 bucket would stall mid-pipeline on a fresh compile —
    while the pow2 tail avoids 2x padding waste at production lane
    counts."""
    b = lo
    while b < n:
        b <<= 2 if b < 4096 else 1
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
    # ONE packed int16 download (the tunnel costs ~25 ms per blocking d2h
    # regardless of size): [lanes, 2+mm_k] = score, nm, (letter<<8 | pos)
    packed = jnp.concatenate(
        [exact_score.astype(jnp.int16)[:, None],
         nm.astype(jnp.int16)[:, None],
         ((let.astype(jnp.int16) << 8) | pos.astype(jnp.int16))], axis=1)
    return qD.astype(jnp.int8), tD.astype(jnp.int8), packed


GA_K = 24   # per-lane cigar-segment pack capacity


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "ga_k"))
def _ga_rows(qD, tD, rows, qlen, tlen, w, mat, *, o_del: int, e_del: int,
             o_ins: int, e_ins: int, ga_k: int = GA_K):
    """Global-alignment over device-resident window buffers: gather the
    requested lanes on device, run the batched DP + traceback, and
    run-length-encode the traceback ON DEVICE so only a compact
    [M, 2+ga_k] int16 pack downloads (col0 score, col1 nseg, then
    (len<<2 | op) per cigar segment in CIGAR order).  Lanes with
    nseg > ga_k are re-rendered by the caller via the generator path."""
    import jax.numpy as jnp

    from tpubwa.ops.global_align import global_align_cigar_batch

    I16 = jnp.int16
    I32 = jnp.int32
    q = qD[rows].astype(jnp.int32)
    t = tD[rows].astype(jnp.int32)
    res = global_align_cigar_batch(q, qlen, t, tlen, mat, w, o_del=o_del,
                                   e_del=e_del, o_ins=o_ins, e_ins=e_ins)
    s = res.steps.astype(I32)                       # [M, S] ops, 3 = end
    M, S = s.shape
    valid = s != 3
    prev = jnp.concatenate(
        [jnp.full((M, 1), -1, I32), s[:, :-1]], axis=1)
    newseg = valid & (s != prev)
    segid = jnp.where(valid, jnp.cumsum(newseg.astype(I32), axis=1), 0)
    nseg = jnp.sum(newseg.astype(I32), axis=1)      # [M]
    rowsM = jnp.arange(M)[:, None]
    dst = jnp.minimum(segid, ga_k + 1)              # slot 0 unused
    lens = jnp.zeros((M, ga_k + 2), I32).at[rowsM, dst].add(
        valid.astype(I32))
    ops = jnp.zeros((M, ga_k + 2), I32).at[rowsM, dst].max(
        jnp.where(valid, s, 0))
    # steps come out in traceback (reverse) order; cigar segment c is
    # steps-segment (nseg - c)
    c = jnp.arange(ga_k, dtype=I32)[None, :]
    src = jnp.clip(nseg[:, None] - c, 0, ga_k + 1)
    in_rng = (c < nseg[:, None]) & (nseg[:, None] <= ga_k)
    seg = jnp.where(
        in_rng,
        (jnp.take_along_axis(lens, src, axis=1) << 2)
        | jnp.take_along_axis(ops, src, axis=1), 0)
    packed = jnp.concatenate(
        [res.score.astype(I16)[:, None], nseg.astype(I16)[:, None],
         seg.astype(I16)], axis=1)
    return packed


@jax.jit
def _gather_rows(qD, tD, rows):
    """Row-gather of the device window buffers (host fallback for gapped
    cigars' NM/MD and for mismatch packs that overflowed MM_K)."""
    return qD[rows], tD[rows]


def mapq_se_vec(opt: MemOptions, lq, rlen, score, frac, sub, csub
                ) -> np.ndarray:
    """finalize.approx_mapq_se vectorized for sub_n == 0 lanes (exact
    integer/float ordering preserved)."""
    a_, b_ = opt.a, opt.b
    sub_e = np.where(sub == 0, opt.min_seed_len * a_, sub)
    sub_e = np.maximum(sub_e, csub)
    lmax = np.maximum(lq, rlen)
    identity = 1.0 - (lmax * a_ - score) / (a_ + b_) / lmax
    tmp = np.where(lmax < opt.mapQ_coef_len, 1.0,
                   opt.mapQ_coef_fac / _log_exact(lmax))
    tmp = tmp * identity * identity
    mapq = _trunci(6.02 * (score - sub_e) / a_ * tmp * tmp + 0.499)
    mapq = np.where(score == 0, 0, mapq)
    mapq = np.maximum(np.minimum(mapq, 60), 0)
    mapq = _trunci(mapq * (1.0 - frac) + 0.499)
    return np.where(sub_e >= score, 0, mapq)


def flat_core(aligner, codes_dev, rd, L, rb, re, qb, qe, truesc, aw):
    """The shared flat-record pipeline for N selected single regions:
    device windows -> band-doubling GA retry -> columnar cigars ->
    edge-deletion squeeze -> NM/MD inputs.

    rd indexes rows of codes_dev; all other inputs are int64 [N] columns.
    Returns a dict of emission columns; ``ok`` is False for lanes whose
    cigar overflowed the GA_K pack (callers re-render those via the
    generator path)."""
    import jax.numpy as jnp

    opt: MemOptions = aligner.opt
    l_pac = aligner.idx.l_pac
    offs = aligner.contig_offsets
    a_ = opt.a
    N = rd.size
    lq = qe - qb
    rlen = re - rb
    rev = rb >= l_pac
    pos0 = np.where(rev, 2 * l_pac - re, rb)      # genome-forward, 0-based
    rid = np.searchsorted(offs, pos0, side="right") - 1

    # band for the final global alignment (reg2aln_g)
    w2 = np.maximum(
        _infer_bw_vec(lq, rlen, truesc, a_, opt.o_del, opt.e_del),
        _infer_bw_vec(lq, rlen, truesc, a_, opt.o_ins, opt.e_ins))
    w2 = np.where(w2 > opt.w, np.minimum(w2, aw), w2)

    # device half: oriented query/ref window buffers + exact score + NM
    lanes = _pow2(N, 256)

    def padv(a, dtype=np.int32):
        v = np.zeros(lanes, dtype)
        v[:N] = a
        return v

    qDj, tDj, pkj = _flat_windows(
        aligner.di, codes_dev, jnp.asarray(padv(rd)),
        jnp.asarray(padv(qb)), jnp.asarray(padv(lq)),
        jnp.asarray(padv(rb, np.int64)),  # rb exceeds int32 on wide indexes
        jnp.asarray(padv(rlen)),
        jnp.asarray(padv(rev, np.bool_)),
        q_pad=QPAD, t_win=TWIN, a=opt.a, b=opt.b)
    # qDj/tDj stay on device; ONE packed compact vector downloads (the
    # d2h tunnel costs ~25 ms per blocking transfer)
    pk = np.asarray(pkj)[:N].astype(np.int64)
    exact_score = pk[:, 0]
    nm_dev = pk[:, 1]
    mm_pos = pk[:, 2:] & 0xFF
    mm_let = (pk[:, 2:] >> 8) & 0x7

    # reg2aln_g's band-doubling retry loop, on shrinking subsets.  Cigars
    # stay COLUMNAR: segs [N, GA_K] of (len<<2 | op) in cigar order +
    # nseg [N] (-1 = pack overflow -> generator re-render).
    segs = np.zeros((N, GA_K), np.int32)
    segs[:, 0] = (lq << 2).astype(np.int32)
    nseg = np.ones(N, np.int32)
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
            segs[rows] = 0
            segs[rows, 0] = (lq[rows] << 2).astype(np.int32)
            nseg[rows] = 1
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

            pk_dev = _ga_rows(
                qDj, tDj, jnp.asarray(padm(rows)), jnp.asarray(padm(lqr)),
                jnp.asarray(padm(rlr)), jnp.asarray(padm(ww)),
                aligner.mat_dev, o_del=opt.o_del, e_del=opt.e_del,
                o_ins=opt.o_ins, e_ins=opt.e_ins)
            gp = np.asarray(pk_dev)[: didx.size].astype(np.int64)
            sc_it[didx] = gp[:, 0]
            gn = gp[:, 1].astype(np.int32)
            fit = gn <= GA_K
            rf = rows[fit]
            segs[rf] = gp[fit, 2:2 + GA_K].astype(np.int32)
            nseg[rf] = gn[fit]
            nseg[rows[~fit]] = -1
        done = (sc_it == last_sc[active]) | (w_eff == maxw)
        last_sc[active] = sc_it
        w2[active] = w_eff << 1
        it += 1
        cont = (~done) & (it < 3) & (sc_it < truesc[active] - a_)
        active = active[cont]

    ok = nseg >= 0
    nseg = np.maximum(nseg, 0)

    # NM/MD classification uses the PRE-squeeze cigar (the generator path
    # computes NM/MD before squeezing edge deletions)
    pure_m = (nseg == 1) & ((segs[:, 0] & 3) == 0) & ok
    need = ~pure_m | (nm_dev > MM_K)
    win_row = np.full(N, -1, np.int32)
    qh = th = None
    nr = np.flatnonzero(need)
    if nr.size:
        # floor the bucket at lanes/4: the row gather is cheap per lane
        # and a stable shape avoids tail-batch compile stalls
        M = _pow2(nr.size, lo=max(64, lanes // 4))
        rpad = np.zeros(M, np.int32)
        rpad[: nr.size] = nr
        qhj, thj = _gather_rows(qDj, tDj, jnp.asarray(rpad))
        qh = np.asarray(qhj)[: nr.size]
        th = np.asarray(thj)[: nr.size]
        win_row[nr] = np.arange(nr.size, dtype=np.int32)
    nm_in = np.where(pure_m & (nm_dev <= MM_K), nm_dev,
                     -1).astype(np.int32)

    # edge-deletion squeeze + pos/rid re-resolution, vectorized; the
    # squeezed deletion lengths still count for NM/MD (generator parity),
    # so they're carried separately (lead_d/trail_d)
    pos = pos0.copy()
    lead_d = np.zeros(N, np.int32)
    trail_d = np.zeros(N, np.int32)
    lead = (nseg > 0) & ((segs[:, 0] & 3) == 2)
    if lead.any():
        lr = np.flatnonzero(lead)
        lead_d[lr] = segs[lr, 0] >> 2
        pos[lr] += segs[lr, 0] >> 2
        segs[lr, :-1] = segs[lr, 1:]
        segs[lr, -1] = 0
        nseg[lr] -= 1
        # the squeeze can move pos past a contig boundary: re-resolve rid
        # from the adjusted position (finalize.reg2aln_g resolves rid
        # after the squeeze; ADVICE r3)
        rid[lr] = np.searchsorted(offs, pos[lr], side="right") - 1
    last_i = np.maximum(nseg - 1, 0)
    tl = (nseg > 0) & ((segs[np.arange(N), last_i] & 3) == 2)
    if tl.any():
        tr = np.flatnonzero(tl)
        trail_d[tr] = segs[tr, last_i[tr]] >> 2
        nseg[tr] -= 1
    p1 = pos - offs[rid] + 1

    clip5 = np.where(rev, L - qe, qb).astype(np.int32)
    clip3 = np.where(rev, qb, L - qe).astype(np.int32)
    # reference span of the POST-squeeze cigar (aln2sam's _ref_len; TLEN)
    reflen = rlen - lead_d - trail_d
    return dict(ok=ok, segs=segs, nseg=nseg, lead_d=lead_d,
                trail_d=trail_d, p1=p1, rid=rid, rev=rev, clip5=clip5,
                clip3=clip3, nm_in=nm_in, mm_pos=mm_pos, mm_let=mm_let,
                lq=lq, rlen=rlen, win_row=win_row, qh=qh, th=th,
                reflen=reflen)


_CORE_LANE_KEYS = ("segs", "nseg", "lead_d", "trail_d", "p1", "rid",
                   "rev", "clip5", "clip3", "nm_in", "mm_pos", "mm_let",
                   "lq", "rlen", "win_row", "reflen")


def core_filter(core: dict, keep: np.ndarray) -> dict:
    """Subset a flat_core result to the kept lanes (win_row values still
    index the full qh/th blocks, which are not filtered)."""
    out = dict(core)
    for k in _CORE_LANE_KEYS:
        out[k] = core[k][keep]
    out["ok"] = core["ok"][keep]
    return out


def emit_flat(aligner, names, seqs, quals, other, lane_b, core: dict,
              flag, mapq, score, rnext, pnext, tlen) -> str:
    """Render the full output text: flat lanes (ascending lane_b, columns
    from flat_core + the caller's flag/mapq/mate fields) interleaved with
    pre-rendered `other` row text, in row order.  Native emitter with a
    python fallback."""
    text = _emit_native(aligner, names, seqs, quals, other, lane_b, core,
                        flag, mapq, score, rnext, pnext, tlen)
    if text is not None:
        return text
    return _emit_py(aligner, names, seqs, quals, other, lane_b, core,
                    flag, mapq, score, rnext, pnext, tlen)


def _emit_py(aligner, names, seqs, quals, other, lane_b, core, flag,
             mapq, score, rnext, pnext, tlen) -> str:
    idx = aligner.idx
    cnames = [c.name for c in idx.contigs]
    rows = [other[b] or "" for b in range(len(other))]
    segs, nseg = core["segs"], core["nseg"]
    lq, rlen = core["lq"], core["rlen"]
    for i in range(lane_b.size):
        b = int(lane_b[i])
        ns_i = int(nseg[i])
        cigar = [(int(v) & 3, int(v) >> 2) for v in segs[i, :ns_i]]
        if core["nm_in"][i] >= 0:
            nm_i = int(core["nm_in"][i])
            parts = []
            prev = 0
            for c, t in zip(core["mm_pos"][i, :nm_i],
                            core["mm_let"][i, :nm_i]):
                parts.append(str(int(c) - prev))
                parts.append(MD_CHARS[int(t)])
                prev = int(c) + 1
            parts.append(str(int(lq[i]) - prev))
            md_i = "".join(parts)
        else:
            w_i = int(core["win_row"][i])
            full = ([(2, int(core["lead_d"][i]))] if core["lead_d"][i]
                    else []) + cigar + \
                ([(2, int(core["trail_d"][i]))] if core["trail_d"][i]
                 else [])
            nm_i, md_i = cigar_nm_md(core["qh"][w_i, : lq[i]],
                                     core["th"][w_i, : rlen[i]], full)
        c5, c3 = int(core["clip5"][i]), int(core["clip3"][i])
        cs = "".join(f"{ln}{CIGAR_OPS[op]}" for op, ln in cigar)
        if c5:
            cs = f"{c5}S" + cs
        if c3:
            cs = cs + f"{c3}S"
        r = int(core["rid"][i])
        if core["rev"][i]:
            seq = seqs[b].translate(finalize.REVCOMP_TRANS)[::-1]
            qual = quals[b][::-1] if quals[b] else "*"
        else:
            seq = seqs[b]
            qual = quals[b] or "*"
        nr = int(rnext[i])
        rnext_s = "*" if nr == -1 else ("=" if nr == -2 else cnames[nr])
        rows[b] = (f"{names[b]}\t{int(flag[i])}\t{cnames[r]}\t"
                   f"{int(core['p1'][i])}\t{int(mapq[i])}\t"
                   f"{cs}\t{rnext_s}\t{int(pnext[i])}\t{int(tlen[i])}\t"
                   f"{seq}\t{qual}\t"
                   f"NM:i:{int(nm_i)}\tMD:Z:{md_i}\t"
                   f"AS:i:{int(score[i])}\tXS:i:0\n")
    return "".join(rows)


def _concat_strs(strs):
    """Concatenate strings into (bytes, int64 offsets[len+1])."""
    enc = [s.encode() for s in strs]
    off = np.zeros(len(enc) + 1, np.int64)
    if enc:
        off[1:] = np.cumsum([len(e) for e in enc])
    return b"".join(enc), off


def _emit_native(aligner, names, seqs, quals, other, lane_b, core, flag,
                 mapq, score, rnext, pnext, tlen) -> str | None:
    """One native call assembles every flat record's line (NM/MD, cigar
    string, revcomp, field formatting) and splices the pre-rendered
    non-flat rows in row order (native/samemit.cpp)."""
    import ctypes

    from tpubwa.native import load_native

    lib = load_native()
    if lib is None or not hasattr(lib, "sam_emit_se"):
        return None
    B = len(other)
    N = lane_b.size
    c = ctypes
    u8p = c.POINTER(c.c_uint8)

    def bptr(buf: bytes):
        return c.cast(c.c_char_p(buf), u8p)

    i32p = c.POINTER(c.c_int32)
    i64p = c.POINTER(c.c_int64)
    i8p = c.POINTER(c.c_int8)

    name_buf, name_off = _concat_strs(names)
    seq_buf, seq_off = _concat_strs(seqs)
    qual_buf, qual_off = _concat_strs([q or "" for q in quals])
    other_buf, other_off = _concat_strs([t or "" for t in other])
    cname_buf, cname_off = _concat_strs(
        [ct.name for ct in aligner.idx.contigs])

    holds = []  # keep converted arrays alive through the call

    def A(arr, dtype, pt):
        a = np.ascontiguousarray(arr, dtype=dtype)
        holds.append(a)
        return a.ctypes.data_as(pt)

    qh, th = core["qh"], core["th"]
    if qh is None:
        qh = np.zeros((1, QPAD), np.int8)
        th = np.zeros((1, TWIN), np.int8)
    cap = (len(other_buf) + len(name_buf) + 2 * len(seq_buf)
           + len(qual_buf) + N * 160 + 4096)
    outb = np.empty(cap, np.uint8)
    args = [
        c.c_int64(B),
        bptr(other_buf), A(other_off, np.int64, i64p),
        bptr(name_buf), A(name_off, np.int64, i64p),
        bptr(seq_buf), A(seq_off, np.int64, i64p),
        bptr(qual_buf), A(qual_off, np.int64, i64p),
        bptr(cname_buf), A(cname_off, np.int64, i64p),
        c.c_int64(N),
        A(lane_b, np.int32, i32p), A(core["rev"], np.uint8, u8p),
        A(flag, np.int32, i32p),
        A(core["rid"], np.int32, i32p), A(core["p1"], np.int64, i64p),
        A(mapq, np.int32, i32p), A(score, np.int32, i32p),
        A(rnext, np.int32, i32p), A(pnext, np.int64, i64p),
        A(tlen, np.int64, i64p),
        A(core["clip5"], np.int32, i32p), A(core["clip3"], np.int32, i32p),
        A(core["nseg"], np.int32, i32p), A(core["segs"], np.int32, i32p),
        c.c_int64(GA_K),
        A(core["lead_d"], np.int32, i32p),
        A(core["trail_d"], np.int32, i32p),
        A(core["nm_in"], np.int32, i32p),
        A(core["mm_pos"], np.uint8, u8p), A(core["mm_let"], np.uint8, u8p),
        c.c_int64(MM_K),
        A(core["lq"], np.int32, i32p), A(core["rlen"], np.int32, i32p),
        A(core["win_row"], np.int32, i32p),
        A(qh, np.int8, i8p), A(th, np.int8, i8p),
        c.c_int64(QPAD), c.c_int64(TWIN),
        outb.ctypes.data_as(u8p), c.c_int64(cap),
    ]
    ret = lib.sam_emit_se(*args)
    if ret > cap:
        outb = np.empty(ret, np.uint8)
        args[-2] = outb.ctypes.data_as(u8p)
        args[-1] = c.c_int64(ret)
        ret = lib.sam_emit_se(*args)
    return outb[:ret].tobytes().decode()


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

    if codes_dev is None:
        codes_dev = jnp.asarray(np.asarray(batch.codes, np.int32))
    core = flat_core(aligner, codes_dev, flat_rows, L, rb, re, qb, qe,
                     truesc, aw)

    # cigar-pack overflow lanes: re-render via the per-read generator
    # path (identical records by construction) and drop from the flat set
    bad = np.flatnonzero(~core["ok"])
    if bad.size:
        gens = [
            finalize.se_records_g(
                opt, idx, batch.names[b], batch.seqs[b], batch.quals[b],
                batch.codes[b, : batch.lens[b]],
                _alnregs_for(fields, bounds, int(b)), read_id0 + int(b))
            for b in flat_rows[bad]
        ]
        for b, recs in zip(flat_rows[bad],
                           drive_rounds(gens, aligner.ga_exec)):
            out[b] = "".join(r.line() + "\n" for r in recs)
        keep = core["ok"]
        core = core_filter(core, keep)
        flat_rows = flat_rows[keep]
        score, frac = score[keep], frac[keep]
        N = flat_rows.size
        if N == 0:
            return "".join(out)

    zeros = np.zeros(N, np.int64)
    mapq = mapq_se_vec(opt, core["lq"], core["rlen"], score, frac,
                       zeros, zeros)
    flag = np.where(core["rev"], 16, 0).astype(np.int32)
    rnext = np.full(N, -1, np.int32)
    return emit_flat(aligner, batch.names[:B], batch.seqs[:B],
                     batch.quals[:B], out, flat_rows, core, flag, mapq,
                     score, rnext, zeros, zeros)


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
