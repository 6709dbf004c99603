import numpy as np
import pytest

from tpubwa.index.fmindex import FMIndex
from tpubwa.io.fasta import Contig
from tpubwa.ops import fm_ref
from tpubwa.utils.dna import decode, encode


@pytest.fixture(scope="module")
def idx(request):
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, 2000).astype(np.uint8)
    return FMIndex.build([Contig("c1", 2000, 0)], codes)


def seq_string(idx):
    return decode(np.concatenate(
        [idx.fetch_ref(0, idx.l_pac), idx.fetch_ref(idx.l_pac, idx.seq_len)]))


def count_occurrences(text: str, pat: str) -> int:
    n, i = 0, text.find(pat)
    while i >= 0:
        n += 1
        i = text.find(pat, i + 1)
    return n


def test_backward_search_counts(idx, rng):
    """Repeated backward extension == naive substring counting."""
    text = seq_string(idx)
    for _ in range(30):
        plen = int(rng.integers(1, 25))
        if rng.random() < 0.7:  # sample a real substring
            p0 = int(rng.integers(0, idx.seq_len - plen))
            pat = text[p0 : p0 + plen]
        else:
            pat = decode(rng.integers(0, 4, plen).astype(np.uint8))
        q = encode(pat)
        k, l, s = fm_ref.set_intv(idx, int(q[-1]))
        for c in q[-2::-1]:
            k, l, s = fm_ref.backward_ext_all(idx, k, l, s, True)[int(c)]
        assert s == count_occurrences(text, pat), pat
        # check the SA rows really start with the pattern
        if s:
            for r in range(k, min(k + s, k + 5)):
                pos = int(idx.sa[r])
                assert text[pos : pos + plen] == pat


def test_bidirectional_consistency(idx, rng):
    """Forward-extending matches backward-extending the reversed pattern,
    and the co-interval (l) equals the interval of the revcomp pattern."""
    text = seq_string(idx)
    for _ in range(20):
        plen = int(rng.integers(2, 15))
        p0 = int(rng.integers(0, idx.seq_len - plen))
        pat = encode(text[p0 : p0 + plen])
        # forward build (forward entries are indexed by complement base)
        k, l, s = fm_ref.set_intv(idx, int(pat[0]))
        for c in pat[1:]:
            k, l, s = fm_ref.backward_ext_all(idx, k, l, s, False)[3 - int(c)]
        # backward build
        k2, l2, s2 = fm_ref.set_intv(idx, int(pat[-1]))
        for c in pat[-2::-1]:
            k2, l2, s2 = fm_ref.backward_ext_all(idx, k2, l2, s2, True)[int(c)]
        assert (k, l, s) == (k2, l2, s2)
        # l interval == interval of revcomp(pat)
        rc = (3 - pat[::-1]).astype(np.uint8)
        k3, l3, s3 = fm_ref.set_intv(idx, int(rc[-1]))
        for c in rc[-2::-1]:
            k3, l3, s3 = fm_ref.backward_ext_all(idx, k3, l3, s3, True)[int(c)]
        assert (k3, s3) == (l, s)


def brute_force_smems(idx, q, min_intv=1):
    """Oracle: maximal exact matches of the read (occ >= min_intv)."""
    text = seq_string(idx)
    L = len(q)

    def occ(b, e):
        if e > L or b < 0 or e <= b:
            return 0
        if np.any(q[b:e] > 3):
            return 0
        return count_occurrences(text, decode(q[b:e]))

    E = {}
    for b in range(L):
        e = b
        while occ(b, e + 1) >= min_intv:
            e += 1
        E[b] = e
    out = []
    best = -1
    for b in range(L):
        if E[b] > b and E[b] > best:
            out.append((b, E[b]))
        best = max(best, E[b])
    return out


def test_smem1_vs_bruteforce(idx, rng):
    text = seq_string(idx)
    for trial in range(15):
        L = int(rng.integers(20, 60))
        p0 = int(rng.integers(0, idx.l_pac - L))
        q = encode(text[p0 : p0 + L])
        # inject some mutations / ambiguity
        nmut = int(rng.integers(0, 4))
        for _ in range(nmut):
            q[rng.integers(0, L)] = rng.integers(0, 5)
        expect = brute_force_smems(idx, q)
        got = set()
        x = 0
        while x < L:
            if q[x] < 4:
                x, mems = fm_ref.smem1(idx, q, L, x, 1)
                got.update((m.start, m.end) for m in mems)
            else:
                x += 1
        assert got == set(expect), (decode(q), sorted(got), expect)
        # occurrence counts on SMEMs are exact
        x = 0
        while x < L:
            if q[x] < 4:
                x, mems = fm_ref.smem1(idx, q, L, x, 1)
                for m in mems:
                    assert m.s == count_occurrences(text, decode(q[m.start:m.end]))
            else:
                x += 1


def make_reads(idx, rng, n, L, err=0.03):
    text = seq_string(idx)
    reads = np.zeros((n, L), dtype=np.uint8)
    for i in range(n):
        p0 = int(rng.integers(0, idx.l_pac - L))
        q = encode(text[p0 : p0 + L])
        mut = rng.random(L) < err
        q[mut] = rng.integers(0, 5, int(mut.sum()))
        reads[i] = q
    return reads


def test_chain_collect_matches_scalar(idx, rng):
    """The chain-structured SMEM engine (the production seeding path) is
    exactly equal to the scalar reference across all three rounds."""
    import jax.numpy as jnp

    from tpubwa.ops.fm import DeviceIndex
    from tpubwa.ops.smem_chain import collect_smems_chain

    di = DeviceIndex.from_host(idx)
    for trial, (B, L, err, msl, sl, sw, mmi) in enumerate([
            (12, 50, 0.04, 10, 15, 10, 20),
            (16, 70, 0.02, 12, 18, 12, 25),
            (8, 40, 0.10, 8, 12, 10, 0),      # round 3 disabled
            (8, 60, 0.0, 10, 15, 10, 20),     # error-free (long SMEMs)
    ]):
        reads = make_reads(idx, rng, B, L, err=err)
        reads[1, 5:9] = 4  # an N run
        lens = np.full(B, L, dtype=np.int32)
        lens[-1] = max(L - 17, 12)
        sm = collect_smems_chain(
            di, jnp.asarray(reads, jnp.int32), jnp.asarray(lens),
            min_seed_len=msl, split_len=sl, split_width=sw,
            max_mem_intv=mmi, out_cap=64)
        n = np.asarray(sm.n)
        assert not np.asarray(sm.overflow).any()
        for b in range(B):
            want = fm_ref.collect_smems(
                idx, reads[b], int(lens[b]), min_seed_len=msl, split_len=sl,
                split_width=sw, max_mem_intv=mmi)
            assert n[b] == len(want), (trial, b, n[b], len(want))
            for j, m in enumerate(want):
                got = (int(sm.k[b, j]), int(sm.l[b, j]), int(sm.s[b, j]),
                       int(sm.start[b, j]), int(sm.end[b, j]))
                assert got == (m.k, m.l, m.s, m.start, m.end), (trial, b, j)


def test_ref_window_fetch_matches_per_base():
    """ref_window_left/right (word-gather window fetch, the extension hot
    path) must equal fetch_ref_batch per-element on every strand/direction
    combination, over the window's strand-valid span."""
    import jax.numpy as jnp

    from tpubwa.index.fmindex import Contig, FMIndex
    from tpubwa.ops.fm import (DeviceIndex, fetch_ref_batch,
                               ref_window_left, ref_window_right)

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    idx = FMIndex.build([Contig("c", 5000, 0)], codes)
    di = DeviceIndex.from_host(idx)
    L = int(idx.l_pac)
    T, J = 768, 64
    jt = np.arange(T)[None, :]

    starts = np.concatenate([rng.integers(0, L, J // 2),
                             rng.integers(L, 2 * L, J // 2)]).astype(np.int32)
    ref = np.asarray(fetch_ref_batch(di, jnp.asarray(starts[:, None] + jt)))
    got = np.asarray(ref_window_right(di, jnp.asarray(starts), T))
    strand_hi = np.where(starts < L, L, 2 * L)
    valid = (starts[:, None] + jt) < strand_hi[:, None]
    assert np.array_equal(np.where(valid, got, -1), np.where(valid, ref, -1))

    bs = np.concatenate([rng.integers(1, L, J // 2),
                         rng.integers(L + 1, 2 * L + 1, J // 2)]
                        ).astype(np.int32)
    ref = np.asarray(fetch_ref_batch(di, jnp.asarray(bs[:, None] - 1 - jt)))
    got = np.asarray(ref_window_left(di, jnp.asarray(bs), T))
    strand_lo = np.where(bs - 1 < L, 0, L)
    valid = (bs[:, None] - 1 - jt) >= strand_lo[:, None]
    assert np.array_equal(np.where(valid, got, -1), np.where(valid, ref, -1))
