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


def test_device_smem1_matches_scalar(idx, rng):
    import jax.numpy as jnp

    from tpubwa.ops.fm import DeviceIndex
    from tpubwa.ops.smem import smem1_batch

    di = DeviceIndex.from_host(idx)
    B, L = 16, 40
    reads = make_reads(idx, rng, B, L, err=0.05)
    lens = np.full(B, L, dtype=np.int32)
    lens[-1] = 25  # one short read
    for x0 in [0, 7, 24]:
        x = np.full(B, x0, dtype=np.int32)
        ret, sm = smem1_batch(
            DeviceIndex.from_host(idx), jnp.asarray(reads, jnp.int32),
            jnp.asarray(lens), jnp.asarray(x),
            jnp.ones(B, jnp.int32), jnp.ones(B, bool), cap=48)
        ret = np.asarray(ret)
        n = np.asarray(sm.n)
        for b in range(B):
            want_ret, want = fm_ref.smem1(idx, reads[b], int(lens[b]), x0, 1)
            if x0 >= lens[b]:
                continue
            assert ret[b] == want_ret, b
            assert n[b] == len(want), (b, n[b], len(want))
            for j, m in enumerate(want):
                got = (int(sm.k[b, j]), int(sm.l[b, j]), int(sm.s[b, j]),
                       int(sm.start[b, j]), int(sm.end[b, j]))
                assert got == (m.k, m.l, m.s, m.start, m.end), (b, j)


def test_device_collect_matches_scalar(idx, rng):
    import jax.numpy as jnp

    from tpubwa.ops.fm import DeviceIndex
    from tpubwa.ops.smem import collect_smems_batch

    di = DeviceIndex.from_host(idx)
    B, L = 12, 50
    reads = make_reads(idx, rng, B, L, err=0.04)
    reads[3, 10:14] = 4  # an N run
    lens = np.full(B, L, dtype=np.int32)
    sm = collect_smems_batch(
        di, jnp.asarray(reads, jnp.int32), jnp.asarray(lens),
        min_seed_len=10, split_len=15, split_width=10, max_mem_intv=20,
        cap=48, out_cap=64)
    n = np.asarray(sm.n)
    assert not np.asarray(sm.overflow).any()
    for b in range(B):
        want = fm_ref.collect_smems(
            idx, reads[b], L, min_seed_len=10, split_len=15,
            split_width=10, max_mem_intv=20)
        assert n[b] == len(want), (b, n[b], len(want))
        for j, m in enumerate(want):
            got = (int(sm.k[b, j]), int(sm.l[b, j]), int(sm.s[b, j]),
                   int(sm.start[b, j]), int(sm.end[b, j]))
            assert got == (m.k, m.l, m.s, m.start, m.end), (b, j)
