"""Chain -> alignment regions via batched seed extension.

Semantics of bwa-mem's mem_chain2aln (reference call stack SURVEY.md §3.1
worker_aln → mem_chain2aln_across_reads_V2 → BandedPairWiseSW).  The TPU
redesign: each read is a generator-coroutine that walks its chains/seeds
(score-descending, with bwa's containment skip tests and band-doubling
retries) and *yields* extension jobs; the driver (run_extension_rounds)
batches one pending job per read per round into a single device
extend_batch call — the reference's "one SIMD lane = one extension pair"
SoA batching, re-expressed as lockstep rounds over the read batch.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Iterator

import numpy as np

from tpubwa.align.chain import Chain
from tpubwa.config import MemOptions
from tpubwa.ops.extend_ref import ExtendResult

MAX_BAND_TRY = 2


@dataclasses.dataclass
class AlnReg:
    """Alignment region (bwa mem_alnreg_t)."""

    rb: int = 0           # [rb, re): reference in 2*l_pac coords
    re: int = 0
    qb: int = 0           # [qb, qe): query
    qe: int = 0
    rid: int = -1
    score: int = -1
    truesc: int = -1
    sub: int = 0
    csub: int = 0
    sub_n: int = 0
    w: int = 0
    seedcov: int = 0
    secondary: int = -1
    secondary_all: int = -1
    seedlen0: int = 0
    n_comp: int = 1
    frac_rep: float = 0.0
    hash: int = 0


@dataclasses.dataclass
class ExtJob:
    query: np.ndarray   # codes, already reversed for left extension
    target: np.ndarray
    w: int
    h0: int
    end_bonus: int


def cal_max_gap(opt: MemOptions, qlen: int) -> int:
    l_del = int((qlen * opt.a - opt.o_del) / opt.e_del + 1.0)
    l_ins = int((qlen * opt.a - opt.o_ins) / opt.e_ins + 1.0)
    l = max(max(l_del, l_ins), 1)
    return min(l, opt.w * 2)


def extend_read(opt: MemOptions, l_pac: int,
                fetch_ref: Callable[[int, int], np.ndarray],
                l_query: int, query: np.ndarray,
                chains: list[Chain]) -> Iterator[ExtJob]:
    """Generator: yields ExtJob, expects ExtendResult sent back; its return
    value (StopIteration.value) is the list[AlnReg] for the read."""
    regs: list[AlnReg] = []
    for c in chains:
        if not c.seeds:
            continue
        # reference window for the whole chain
        rmax0, rmax1 = l_pac * 2, 0
        for t in c.seeds:
            b = t.rbeg - (t.qbeg + cal_max_gap(opt, t.qbeg))
            e = t.rbeg + t.len + (l_query - t.qbeg - t.len) \
                + cal_max_gap(opt, l_query - t.qbeg - t.len)
            rmax0 = min(rmax0, b)
            rmax1 = max(rmax1, e)
        rmax0 = max(rmax0, 0)
        rmax1 = min(rmax1, l_pac * 2)
        if rmax0 < l_pac < rmax1:  # crossing the strand boundary: pick a side
            if c.seeds[0].rbeg < l_pac:
                rmax1 = l_pac
            else:
                rmax0 = l_pac
        rseq = fetch_ref(rmax0, rmax1)

        # seeds by (score, index) ascending, visited in descending order
        srt = sorted(range(len(c.seeds)),
                     key=lambda i: (c.seeds[i].score, i))
        dropped = [False] * len(c.seeds)
        for k in reversed(range(len(srt))):
            s = c.seeds[srt[k]]
            # --- containment skip test (vs regions computed so far) ---
            contained = False
            for p in regs:
                if (s.rbeg < p.rb or s.rbeg + s.len > p.re
                        or s.qbeg < p.qb or s.qbeg + s.len > p.qe):
                    continue
                if s.len - p.seedlen0 > 0.1 * l_query:
                    continue
                qd = s.qbeg - p.qb
                rd = s.rbeg - p.rb
                max_gap = cal_max_gap(opt, min(qd, rd))
                ww = min(max_gap, p.w)
                if qd - rd < ww and rd - qd < ww:
                    contained = True
                    break
                qd = p.qe - (s.qbeg + s.len)
                rd = p.re - (s.rbeg + s.len)
                max_gap = cal_max_gap(opt, min(qd, rd))
                ww = min(max_gap, p.w)
                if qd - rd < ww and rd - qd < ww:
                    contained = True
                    break
            if contained:
                # confirm no overlapping major seed suggests a different aln
                diff = False
                for i2 in range(k + 1, len(srt)):
                    if dropped[srt[i2]]:
                        continue
                    t = c.seeds[srt[i2]]
                    if t.len < s.len * 0.95:
                        continue
                    if (s.qbeg <= t.qbeg
                            and s.qbeg + s.len - t.qbeg >= s.len >> 2
                            and t.qbeg - s.qbeg != t.rbeg - s.rbeg):
                        diff = True
                        break
                    if (t.qbeg <= s.qbeg
                            and t.qbeg + t.len - s.qbeg >= s.len >> 2
                            and s.qbeg - t.qbeg != s.rbeg - t.rbeg):
                        diff = True
                        break
                if not diff:
                    dropped[srt[k]] = True
                    continue

            a = AlnReg(w=opt.w, score=-1, truesc=-1, rid=c.rid,
                       frac_rep=c.frac_rep, seedlen0=s.len)
            aw0 = aw1 = opt.w

            if s.qbeg:  # left extension (reversed sequences)
                qs = query[: s.qbeg][::-1].copy()
                rs = rseq[: s.rbeg - rmax0][::-1].copy()
                res = None
                for i in range(MAX_BAND_TRY):
                    prev = a.score
                    aw0 = opt.w << i
                    res = yield ExtJob(qs, rs, aw0, s.len * opt.a,
                                       opt.pen_clip5)
                    a.score = res.score
                    if (a.score == prev
                            or res.max_off < (aw0 >> 1) + (aw0 >> 2)):
                        break
                if res.gscore <= 0 or res.gscore <= a.score - opt.pen_clip5:
                    a.qb = s.qbeg - res.qle
                    a.rb = s.rbeg - res.tle
                    a.truesc = a.score
                else:
                    a.qb = 0
                    a.rb = s.rbeg - res.gtle
                    a.truesc = res.gscore
            else:
                a.score = a.truesc = s.len * opt.a
                a.qb = 0
                a.rb = s.rbeg

            if s.qbeg + s.len != l_query:  # right extension
                qe = s.qbeg + s.len
                re0 = s.rbeg + s.len - rmax0
                sc0 = a.score
                res = None
                for i in range(MAX_BAND_TRY):
                    prev = a.score
                    aw1 = opt.w << i
                    res = yield ExtJob(query[qe:l_query], rseq[re0:],
                                       aw1, sc0, opt.pen_clip3)
                    a.score = res.score
                    if (a.score == prev
                            or res.max_off < (aw1 >> 1) + (aw1 >> 2)):
                        break
                if res.gscore <= 0 or res.gscore <= a.score - opt.pen_clip3:
                    a.qe = qe + res.qle
                    a.re = rmax0 + re0 + res.tle
                    a.truesc += a.score - sc0
                else:
                    a.qe = l_query
                    a.re = rmax0 + re0 + res.gtle
                    a.truesc += res.gscore - sc0
            else:
                a.qe = l_query
                a.re = s.rbeg + s.len

            a.seedcov = 0
            for t in c.seeds:
                if (t.qbeg >= a.qb and t.qbeg + t.len <= a.qe
                        and t.rbeg >= a.rb and t.rbeg + t.len <= a.re):
                    a.seedcov += t.len
            a.w = max(aw0, aw1)
            regs.append(a)
    return regs


def run_extension_rounds(gens: list[Iterator[ExtJob]], opt: MemOptions,
                         mat: np.ndarray, extend_batch_fn,
                         q_pad: int = 192, t_pad: int = 768,
                         ) -> list[list[AlnReg]]:
    """Drive per-read extension generators in lockstep rounds; one pending
    job per read per round, all jobs in one device batch.  Batch shape is
    static (len(gens) lanes) so the device kernel compiles once; finished
    reads occupy dead lanes."""
    import jax.numpy as jnp

    n = len(gens)
    results: list[list[AlnReg] | None] = [None] * n
    pending: list[ExtJob | None] = [None] * n
    live = set()
    for i, g in enumerate(gens):
        try:
            pending[i] = next(g)
            live.add(i)
        except StopIteration as e:
            results[i] = e.value or []

    mat_j = jnp.asarray(mat)
    while live:
        idxs = sorted(live)
        nb = len(idxs)
        # lane compaction: most reads finish after 2-4 extension jobs, so
        # later rounds run with far fewer lanes.  Bucket the batch size
        # (powers of two) and target pad so only a few shapes ever compile.
        B = 64
        while B < nb:
            B <<= 1
        t_max = max(min(len(pending[i].target), t_pad) for i in idxs)
        t_b = 256 if t_max <= 256 else t_pad
        q = np.full((B, q_pad), 4, np.int32)
        t = np.full((B, t_b), 4, np.int32)
        qlen = np.zeros(B, np.int32)
        tlen = np.zeros(B, np.int32)
        w = np.zeros(B, np.int32)
        h0 = np.ones(B, np.int32)
        bonus = np.zeros(B, np.int32)
        for r, i in enumerate(idxs):
            job = pending[i]
            nq = min(len(job.query), q_pad)
            nt = min(len(job.target), t_b)
            q[r, :nq] = job.query[:nq]
            t[r, :nt] = job.target[:nt]
            qlen[r] = nq
            tlen[r] = nt
            w[r] = job.w
            h0[r] = max(job.h0, 1)
            bonus[r] = job.end_bonus
        out = extend_batch_fn(
            jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t),
            jnp.asarray(tlen), mat_j, jnp.asarray(w), jnp.asarray(h0),
            jnp.asarray(bonus),
            o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
            e_ins=opt.e_ins, zdrop=opt.zdrop, mat_max=opt.a)
        # one stacked download (device->host bandwidth is the bottleneck)
        packed = np.asarray(jnp.stack(
            [out.score, out.qle, out.tle, out.gtle, out.gscore,
             out.max_off]))
        for r, i in enumerate(idxs):
            res = ExtendResult(int(packed[0, r]), int(packed[1, r]),
                               int(packed[2, r]), int(packed[3, r]),
                               int(packed[4, r]), int(packed[5, r]))
            try:
                pending[i] = gens[i].send(res)
            except StopIteration as e:
                results[i] = e.value or []
                live.discard(i)
    return results
