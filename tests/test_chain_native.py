"""Native chaining engine (native/chain.cpp) vs the Python reference
(align/chain.py chain_read + filter_chains): exact-equality differential
tests over random seed sets and realistic seeding output."""
import numpy as np
import pytest

from tpubwa.align import chain as chainmod
from tpubwa.config import MemOptions


def _python_chains(opt, l_pac, offs, seed_rows, bounds, skip, l_rep, lens):
    out = []
    for b in range(len(bounds) - 1):
        if skip[b]:
            out.append([])
            continue
        seg = seed_rows[bounds[b]:bounds[b + 1]]
        seeds = [chainmod.Seed(int(r[1]), int(r[2]), int(r[3]), int(r[3]))
                 for r in seg]
        chains = chainmod.chain_read(opt, l_pac, offs, seeds,
                                     int(lens[b]), int(l_rep[b]))
        out.append(chainmod.filter_chains(opt, chains))
    return out


def _native_chains(opt, l_pac, offs, seed_rows, bounds, skip, l_rep, lens):
    cb = chainmod.chain_filter_batch_native(
        opt, l_pac, offs, seed_rows, bounds, skip)
    assert cb is not None, "native chaining library unavailable"
    return cb.to_lists(len(bounds) - 1, l_rep, lens)


def _assert_equal(py, nat):
    assert len(py) == len(nat)
    for b, (cp, cn) in enumerate(zip(py, nat)):
        assert len(cp) == len(cn), f"read {b}: {len(cp)} vs {len(cn)} chains"
        for k, (a, c) in enumerate(zip(cp, cn)):
            assert a.rid == c.rid, (b, k)
            assert a.w == c.w, (b, k)
            assert a.frac_rep == pytest.approx(c.frac_rep), (b, k)
            sa = [(s.rbeg, s.qbeg, s.len) for s in a.seeds]
            sc = [(s.rbeg, s.qbeg, s.len) for s in c.seeds]
            assert sa == sc, (b, k)


def _run_case(opt, l_pac, offs, seed_rows, lens, l_rep):
    B = len(lens)
    bounds = np.searchsorted(seed_rows[:, 0], np.arange(B + 1))
    skip = (lens < opt.min_seed_len).astype(np.uint8)
    py = _python_chains(opt, l_pac, offs, seed_rows, bounds, skip,
                        l_rep, lens)
    nat = _native_chains(opt, l_pac, offs, seed_rows, bounds, skip,
                         l_rep, lens)
    _assert_equal(py, nat)


def test_chain_native_random():
    """Random clustered seeds across strand boundary + two contigs."""
    rng = np.random.default_rng(11)
    opt = MemOptions()
    l_pac = 50_000
    offs = np.array([0, 30_000], dtype=np.int64)  # two contigs
    B = 200
    lens = np.full(B, 150, np.int64)
    l_rep = rng.integers(0, 100, B)
    rows = []
    for b in range(B):
        n_cluster = rng.integers(1, 4)
        for _ in range(n_cluster):
            anchor = rng.integers(0, 2 * l_pac - 200)
            n_seed = rng.integers(1, 8)
            qs = np.sort(rng.integers(0, 130, n_seed))
            for q in qs:
                jitter = rng.integers(-30, 30)
                ln = rng.integers(19, 40)
                rb = int(np.clip(anchor + q + jitter, 0, 2 * l_pac - ln))
                rows.append((b, rb, int(q), int(ln)))
    rows.sort()
    seed_rows = np.array(rows, dtype=np.int64)
    _run_case(opt, l_pac, offs, seed_rows, lens, l_rep)


def test_chain_native_edge_cases():
    """Contained seeds, strand-boundary seeds, short reads, empty reads."""
    opt = MemOptions()
    l_pac = 1000
    offs = np.array([0], dtype=np.int64)
    rows = [
        # read 0: chainable pair + contained seed
        (0, 100, 0, 30), (0, 130, 30, 30), (0, 110, 10, 19),
        # read 1: seed bridging the strand boundary (rid -2 -> dropped)
        (1, 990, 0, 20),
        # read 2: two distant clusters -> two chains
        (2, 50, 0, 25), (2, 1500, 5, 25),
        # read 3 has no seeds; read 4 is shorter than min_seed_len
        (4, 10, 0, 19),
    ]
    seed_rows = np.array(rows, dtype=np.int64)
    lens = np.array([150, 150, 150, 150, 10], dtype=np.int64)
    l_rep = np.zeros(5, dtype=np.int64)
    _run_case(opt, l_pac, offs, seed_rows, lens, l_rep)


def test_chain_native_tight_options():
    """Non-default filter knobs exercise drop/first/kept-cap branches."""
    rng = np.random.default_rng(7)
    opt = MemOptions(max_chain_extend=2, drop_ratio=0.9, mask_level=0.3,
                     min_chain_weight=20)
    l_pac = 20_000
    offs = np.array([0], dtype=np.int64)
    B = 100
    lens = np.full(B, 150, np.int64)
    l_rep = np.zeros(B, np.int64)
    rows = []
    for b in range(B):
        for _ in range(rng.integers(2, 6)):
            anchor = rng.integers(0, 2 * l_pac - 200)
            for q in np.sort(rng.integers(0, 120, rng.integers(1, 5))):
                ln = rng.integers(19, 60)
                rb = int(np.clip(anchor + q, 0, 2 * l_pac - ln))
                rows.append((b, rb, int(q), int(ln)))
    rows.sort()
    seed_rows = np.array(rows, dtype=np.int64)
    _run_case(opt, l_pac, offs, seed_rows, lens, l_rep)


def test_chain_native_real_seeding(tmp_path):
    """Differential test on actual device-seeding output of simulated reads."""
    from tpubwa.align.pipeline import Aligner
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.io.fasta import Contig
    from tpubwa.io.fastq import Read, batch_reads
    from tpubwa.utils.sim import simulate_reads

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 20000).astype(np.uint8)
    contigs = [Contig("c1", 20000, 0)]
    idx = FMIndex.build(contigs, codes)
    al = Aligner(idx)
    reads = simulate_reads(codes, contigs, 64, length=150, err=0.02,
                           indel=0.003, seed=9)
    rr = [Read(name=n, seq=s, qual=q) for n, s, q in reads]
    for batch in batch_reads(rr, 64, 160):
        seed_rows, l_rep = al.seed_batch(batch.codes, batch.lens)
        bounds = np.searchsorted(seed_rows[:, 0], np.arange(batch.n + 1))
        skip = (np.asarray(batch.lens) < al.opt.min_seed_len).astype(np.uint8)
        py = _python_chains(al.opt, idx.l_pac, al.contig_offsets, seed_rows,
                            bounds, skip, l_rep, batch.lens)
        nat = _native_chains(al.opt, idx.l_pac, al.contig_offsets, seed_rows,
                             bounds, skip, l_rep, batch.lens)
        _assert_equal(py, nat)
