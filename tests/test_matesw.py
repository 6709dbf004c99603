"""mem_matesw orientation-loop semantics (VERDICT r2 weak #4).

bwa's mem_matesw increments n after every *performed* rescue SW (successful
or not) and breaks out of the 4-orientation loop as soon as n > 0; a
direction whose window never reaches the SW (mid off the anchor's contig,
or window shorter than min_seed_len) does NOT count as an attempt and the
loop continues.  These tests pin both halves of that behavior on
matesw_gen (tpubwa/align/pair.py).
"""
import numpy as np

from tpubwa.align.pair import PEStat, matesw_gen, run_matesw_rounds
from tpubwa.align.region import AlnReg
from tpubwa.config import MemOptions
from tpubwa.index.fmindex import FMIndex
from tpubwa.io.fasta import Contig
from tpubwa.ops.localsw import localsw_batch


def _mk_idx(rng, la=8000, lb=8000):
    codes = rng.integers(0, 4, la + lb).astype(np.uint8)
    contigs = [Contig("a", la, 0), Contig("b", lb, la)]
    return FMIndex.build(contigs, codes), codes


def _anchor(rb, rid=0):
    a = AlnReg()
    a.rid = rid
    a.rb = rb
    a.re = rb + 100
    a.qb, a.qe = 0, 100
    a.score = a.truesc = 100
    a.frac_rep = 0.0
    a.secondary = -1
    return a


def _run(opt, idx, pes, a, ms, ma):
    gen = matesw_gen(opt, idx, pes, a, len(ms), ms, ma)
    run_matesw_rounds(opt, [gen], localsw_batch, opt.score_matrix())
    return ma


def test_matesw_falls_through_unattempted_dirs():
    """Direction 0's window lands on the wrong contig (no SW attempt), so
    the loop must continue and rescue the mate in direction 1 (FR)."""
    rng = np.random.default_rng(77)
    idx, codes = _mk_idx(rng)
    opt = MemOptions()
    l_ms = 100
    # anchor near the end of contig 0; the true mate is the reverse
    # complement of ref[7700:7800) (proper FR downstream placement)
    a = _anchor(7500)
    mate_fwd = codes[7700:7800].astype(np.uint8)
    ms = (3 - mate_fwd)[::-1].copy()  # read-orientation mate sequence
    # dir 0 (FF): window [7800, 8550) -> mid 8175 is on contig 1 -> rid
    # mismatch, SW never performed, loop must NOT stop here
    # dir 1 (FR): window [7450, 8000) on contig 0 -> SW performed, rescue ok
    pes = [PEStat(low=300, high=900, failed=False),
           PEStat(low=100, high=500, failed=False),
           PEStat(failed=True), PEStat(failed=True)]
    ma: list[AlnReg] = []
    _run(opt, idx, pes, a, ms, ma)
    assert len(ma) == 1, "rescue in a later orientation must be attempted"
    b = ma[0]
    # rescued region is on the reverse strand; forward projection must
    # cover the true mate locus
    l2 = idx.l_pac * 2
    fwd_b, fwd_e = l2 - b.re, l2 - b.rb
    assert b.rb >= idx.l_pac, "FR rescue of a forward anchor is rev-strand"
    assert abs(fwd_b - 7700) <= 5 and abs(fwd_e - 7800) <= 5, (fwd_b, fwd_e)
    assert b.score >= opt.min_seed_len


def test_matesw_stops_after_first_attempt():
    """A performed-but-failed SW in direction 0 must stop the loop (bwa's
    `if (n) break`): the true mate sits in direction 1's window, but it
    must NOT be rescued because direction 0 already ran the SW."""
    rng = np.random.default_rng(78)
    idx, codes = _mk_idx(rng)
    opt = MemOptions()
    a = _anchor(4000)
    mate_fwd = codes[4300:4400].astype(np.uint8)
    ms = (3 - mate_fwd)[::-1].copy()
    # dir 0 (FF) window [4100, 4250): valid on contig 0, SW runs, but the
    # mate is RC so the forward-orientation score stays < min_seed_len
    # dir 1 (FR) window [4200, 4600): would rescue the mate — must be skipped
    pes = [PEStat(low=100, high=150, failed=False),
           PEStat(low=200, high=500, failed=False),
           PEStat(failed=True), PEStat(failed=True)]
    ma: list[AlnReg] = []
    _run(opt, idx, pes, a, ms, ma)
    assert ma == [], "loop must break after the first performed SW"


def test_matesw_skips_consistent_orientation():
    """An existing mate region at a consistent distance marks that
    orientation as skipped before any SW."""
    rng = np.random.default_rng(79)
    idx, codes = _mk_idx(rng)
    opt = MemOptions()
    a = _anchor(4000)
    mate_fwd = codes[4300:4400].astype(np.uint8)
    ms = (3 - mate_fwd)[::-1].copy()
    pes = [PEStat(failed=True), PEStat(low=200, high=500, failed=False),
           PEStat(failed=True), PEStat(failed=True)]
    # pre-existing region exactly where dir-1 rescue would land
    l2 = idx.l_pac * 2
    existing = _anchor(l2 - 4400, rid=0)
    existing.re = l2 - 4300
    ma = [existing]
    _run(opt, idx, pes, a, ms, ma)
    assert len(ma) == 1, "consistent orientation must be skipped entirely"
