import numpy as np
import pytest

from tpubwa.config import MemOptions
from tpubwa.ops.extend_ref import ExtendResult, extend_ref


OPT = MemOptions()
MAT = OPT.score_matrix()


def mutate(rng, codes, sub=0.05, ins=0.01, dele=0.01):
    out = []
    for c in codes:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(int(rng.integers(0, 4)))
        if rng.random() < sub:
            out.append(int(rng.integers(0, 4)))
        else:
            out.append(int(c))
    return np.array(out, dtype=np.uint8)


def random_pairs(rng, n, qmax=100, tmax=150):
    pairs = []
    for _ in range(n):
        kind = rng.integers(0, 4)
        if kind == 0:  # related pair (mutated copy)
            t = rng.integers(0, 4, int(rng.integers(10, tmax))).astype(np.uint8)
            qlen = int(rng.integers(5, min(len(t), qmax)))
            q = mutate(rng, t[:qlen])[:qmax]
        elif kind == 1:  # unrelated
            q = rng.integers(0, 4, int(rng.integers(1, qmax))).astype(np.uint8)
            t = rng.integers(0, 4, int(rng.integers(1, tmax))).astype(np.uint8)
        elif kind == 2:  # exact prefix
            t = rng.integers(0, 4, int(rng.integers(5, tmax))).astype(np.uint8)
            q = t[: int(rng.integers(1, min(len(t), qmax)))].copy()
        else:  # with ambiguous bases
            q = rng.integers(0, 5, int(rng.integers(1, qmax))).astype(np.uint8)
            t = rng.integers(0, 5, int(rng.integers(1, tmax))).astype(np.uint8)
        pairs.append((q, t))
    return pairs


def test_extend_ref_basics():
    # exact match extension: score grows by a per matching base
    q = np.array([0, 1, 2, 3, 0, 1], dtype=np.uint8)
    r = extend_ref(q, q, MAT, 6, 1, 6, 1, 100, 5, 100, h0=10)
    assert r.score == 10 + 6 * OPT.a
    assert r.qle == 6 and r.tle == 6
    assert r.gscore == r.score  # reaches the query end
    # one mismatch at the end: local ext stops before it
    t = q.copy()
    t[-1] = (t[-1] + 1) % 4
    r = extend_ref(q, t, MAT, 6, 1, 6, 1, 100, 5, 100, h0=10)
    assert r.score == 10 + 5 * OPT.a
    assert r.qle == 5
    assert r.gscore == 10 + 5 - OPT.b  # to-end with the mismatch


def test_extend_ref_gap():
    # deletion in query relative to target: target has 2 extra bases
    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, 40).astype(np.uint8)
    q = np.concatenate([t[:20], t[22:]]).astype(np.uint8)
    r = extend_ref(q, t, MAT, 6, 1, 6, 1, 100, 5, 100, h0=19)
    # 38 matches + one 2-base deletion
    assert r.score == 19 + 38 * OPT.a - (OPT.o_del + 2 * OPT.e_del)
    assert r.qle == 38 and r.tle == 40


def test_extend_ref_zdrop_terminates():
    # long garbage after a good prefix: score must not keep the garbage
    rng = np.random.default_rng(4)
    good = rng.integers(0, 4, 30).astype(np.uint8)
    q = np.concatenate([good, rng.integers(0, 4, 60).astype(np.uint8)])
    t = np.concatenate([good, (rng.integers(0, 4, 60) % 4).astype(np.uint8)])
    r = extend_ref(q, t, MAT, 6, 1, 6, 1, 100, 5, 100, h0=10)
    assert r.qle <= 45  # stopped around the good prefix


def test_extend_batch_matches_ref(rng):
    import jax.numpy as jnp

    from tpubwa.ops.extend import extend_batch

    pairs = random_pairs(rng, 64)
    Q, T = 100, 160
    B = len(pairs)
    q = np.full((B, Q), 4, np.int32)
    t = np.full((B, T), 4, np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    h0 = rng.integers(1, 40, B).astype(np.int32)
    w = rng.choice([5, 20, 100], B).astype(np.int32)
    bonus = np.full(B, 5, np.int32)
    for b, (qq, tt) in enumerate(pairs):
        q[b, : len(qq)] = qq
        t[b, : len(tt)] = tt
        qlen[b] = len(qq)
        tlen[b] = len(tt)
    # a couple of degenerate lanes
    qlen[0] = 0
    tlen[1] = 0

    for zdrop in (100, 0):
        res = extend_batch(
            jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t),
            jnp.asarray(tlen), jnp.asarray(MAT), jnp.asarray(w),
            jnp.asarray(h0), jnp.asarray(bonus),
            o_del=OPT.o_del, e_del=OPT.e_del, o_ins=OPT.o_ins,
            e_ins=OPT.e_ins, zdrop=zdrop, mat_max=OPT.a)
        for b in range(B):
            want = extend_ref(
                q[b, : qlen[b]].astype(np.uint8),
                t[b, : tlen[b]].astype(np.uint8),
                MAT, OPT.o_del, OPT.e_del, OPT.o_ins, OPT.e_ins,
                int(w[b]), int(bonus[b]), zdrop, int(h0[b]))
            got = ExtendResult(
                int(res.score[b]), int(res.qle[b]), int(res.tle[b]),
                int(res.gtle[b]), int(res.gscore[b]), int(res.max_off[b]))
            assert got == want, (b, zdrop, got, want)
