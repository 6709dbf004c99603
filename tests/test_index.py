import numpy as np
import pytest

from tpubwa.index.fmindex import CP_BLOCK, FMIndex
from tpubwa.index.sais import (
    _suffix_array_doubling, bwt_and_primary, suffix_array)
from tpubwa.io.fasta import Contig
from tpubwa.utils.dna import encode


def naive_sa(codes):
    n = codes.size
    s = list(codes) + [-1]
    return np.array(sorted(range(n + 1), key=lambda i: s[i:]), dtype=np.int64)


@pytest.mark.parametrize("n", [1, 2, 5, 17, 64, 100, 257])
def test_suffix_array_matches_naive(rng, n):
    codes = rng.integers(0, 4, n).astype(np.uint8)
    expect = naive_sa(codes)
    got_native = suffix_array(codes)
    got_py = _suffix_array_doubling(codes)
    assert np.array_equal(got_native, expect)
    assert np.array_equal(got_py, expect)


def test_suffix_array_repetitive():
    codes = encode("AAAAAAAAAA")
    assert np.array_equal(suffix_array(codes), naive_sa(codes))
    codes = encode("ACACACACAC")
    assert np.array_equal(suffix_array(codes), naive_sa(codes))


def test_sa_large_random(rng):
    codes = rng.integers(0, 4, 50000).astype(np.uint8)
    sa = suffix_array(codes)
    # spot-check sortedness on sampled adjacent pairs
    s = codes.tobytes()
    idx = rng.integers(0, 50000 - 1, 200)
    for i in idx:
        a, b = sa[i], sa[i + 1]
        assert s[a:] < s[b:] or b == 50000
    assert sa[0] == 50000


def _tiny_index(seq="ACGTACGGTACGTTAGC"):
    codes = encode(seq)
    contigs = [Contig("c1", len(seq), 0)]
    return FMIndex.build(contigs, codes)


def test_occ_matches_naive(rng):
    idx = _tiny_index()
    seq = np.concatenate(
        [idx.fetch_ref(0, idx.l_pac),
         idx.fetch_ref(idx.l_pac, idx.seq_len)])
    sa = idx.sa
    n = idx.seq_len
    # reconstruct full bwt naively
    bwt_full = np.array(
        [seq[sa[r] - 1] if sa[r] > 0 else 255 for r in range(n + 1)])
    for c in range(4):
        naive = np.cumsum(bwt_full == c)
        for i in range(n + 2):
            want = 0 if i == 0 else int(naive[i - 1])
            assert idx.occ_full(c, i) == want, (c, i)


def test_fetch_ref_and_depos():
    seq = "ACGTACGGTA"
    idx = _tiny_index(seq)
    assert np.array_equal(idx.fetch_ref(0, 10), encode(seq))
    # reverse strand segment equals revcomp of forward
    rc = idx.fetch_ref(10, 20)
    from tpubwa.utils.dna import revcomp_codes
    assert np.array_equal(rc, revcomp_codes(encode(seq)))
    is_rev, rb, re = idx.depos(10, 14)
    assert is_rev and (rb, re) == (6, 10)
    is_rev, rb, re = idx.depos(2, 6)
    assert not is_rev and (rb, re) == (2, 6)


def test_save_load_roundtrip(tmp_path):
    idx = _tiny_index()
    prefix = str(tmp_path / "ref.fa")
    idx.save(prefix)
    idx2 = FMIndex.load(prefix)
    assert idx2.l_pac == idx.l_pac
    assert idx2.primary == idx.primary
    assert np.array_equal(idx2.cp, idx.cp)
    assert np.array_equal(idx2.sa, idx.sa)
    assert idx2.contigs[0].name == "c1"


def test_checkpoint_block_boundaries(rng):
    # exercise occ at exact CP_BLOCK boundaries
    codes = rng.integers(0, 4, CP_BLOCK * 3 + 7).astype(np.uint8)
    idx = FMIndex.build([Contig("c", codes.size, 0)], codes)
    n = idx.seq_len
    bwt, primary = bwt_and_primary(
        np.concatenate([codes, (3 - codes[::-1]).astype(np.uint8)]),
        suffix_array(
            np.concatenate([codes, (3 - codes[::-1]).astype(np.uint8)])))
    assert primary == idx.primary
    for c in range(4):
        csum = np.cumsum(bwt == c)
        for i in [0, 1, CP_BLOCK - 1, CP_BLOCK, CP_BLOCK + 1,
                  2 * CP_BLOCK, n - 1, n]:
            want = 0 if i == 0 else int(csum[i - 1])
            assert idx.occ_stored(c, i) == want
