import numpy as np

from tpubwa.config import MemOptions
from tpubwa.ops.localsw import BIG, localsw_ref

OPT = MemOptions()
MAT = OPT.score_matrix()


def test_localsw_ref_basics():
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.uint8)
    t = np.concatenate([np.array([3, 3, 3], np.uint8), q,
                        np.array([0, 0], np.uint8)])
    score, te, qe, score2 = localsw_ref(q, t, MAT, 6, 1, 6, 1)
    assert score == 8  # full match embedded
    assert qe == 7 and te == 10
    # mismatch in middle still local-aligns best segment
    t2 = t.copy()
    t2[6] = (t2[6] + 2) % 4
    score, te, qe, _ = localsw_ref(q, t2, MAT, 6, 1, 6, 1)
    assert score in (4, 5)  # best run on either side of the mismatch


def test_localsw_batch_matches_ref(rng):
    import jax.numpy as jnp

    from tpubwa.ops.localsw import localsw_batch

    B, Q, T = 48, 64, 100
    q = np.full((B, Q), 4, np.int32)
    t = np.full((B, T), 4, np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    minsc = rng.integers(0, 20, B).astype(np.int32)
    endsc = np.full(B, BIG, np.int32)
    cases = []
    for b in range(B):
        ql = int(rng.integers(1, Q))
        tl = int(rng.integers(1, T))
        if b % 3 == 0:  # embedded copy with errors
            tt = rng.integers(0, 4, tl).astype(np.uint8)
            start = int(rng.integers(0, max(tl - ql, 1)))
            qq = tt[start : start + ql].copy()
            if len(qq) == 0:
                qq = rng.integers(0, 4, ql).astype(np.uint8)
            for _ in range(int(rng.integers(0, 3))):
                if len(qq):
                    qq[rng.integers(0, len(qq))] = rng.integers(0, 5)
            ql = len(qq)
        else:
            qq = rng.integers(0, 5, ql).astype(np.uint8)
            tt = rng.integers(0, 5, tl).astype(np.uint8)
        q[b, :ql] = qq
        t[b, :tl] = tt
        qlen[b] = ql
        tlen[b] = tl
        cases.append((qq, tt))
    endsc[5] = 6  # exercise early stop on a few lanes
    endsc[6] = 10
    res = localsw_batch(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t), jnp.asarray(tlen),
        jnp.asarray(MAT), jnp.asarray(minsc), jnp.asarray(endsc),
        o_del=6, e_del=1, o_ins=6, e_ins=1)
    for b, (qq, tt) in enumerate(cases):
        want = localsw_ref(qq, tt, MAT, 6, 1, 6, 1, minsc=int(minsc[b]),
                           endsc=int(endsc[b]))
        got = (int(res.score[b]), int(res.te[b]), int(res.qe[b]),
               int(res.score2[b]))
        assert got == want, (b, got, want)
