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


def test_extend_seed_batch_matches_host_logic(rng):
    """Fused whole-seed extension (left + right + band retries on device)
    must equal the original per-side host retry loop over extend_ref."""
    import jax.numpy as jnp

    from tpubwa.ops.extend import extend_seed_batch

    def host_side(qq, tt, w0, h0, bonus, prev):
        res = None
        aw = w0
        for i in range(2):  # MAX_BAND_TRY
            aw = w0 << i
            res = extend_ref(qq, tt, MAT, OPT.o_del, OPT.e_del, OPT.o_ins,
                             OPT.e_ins, aw, bonus, OPT.zdrop, h0)
            if res.score == prev or res.max_off < (aw >> 1) + (aw >> 2):
                break
            prev = res.score
        return res, aw

    pairs_l = random_pairs(rng, 48)
    pairs_r = random_pairs(rng, 48)
    Q, T = 100, 160
    B = len(pairs_l)
    q_l = np.full((B, Q), 4, np.int32)
    t_l = np.full((B, T), 4, np.int32)
    q_r = np.full((B, Q), 4, np.int32)
    t_r = np.full((B, T), 4, np.int32)
    qlen_l = np.zeros(B, np.int32)
    tlen_l = np.zeros(B, np.int32)
    qlen_r = np.zeros(B, np.int32)
    tlen_r = np.zeros(B, np.int32)
    h0 = rng.integers(1, 40, B).astype(np.int32)
    for b in range(B):
        ql, tl = pairs_l[b]
        qr, tr = pairs_r[b]
        q_l[b, : len(ql)] = ql
        t_l[b, : len(tl)] = tl
        q_r[b, : len(qr)] = qr
        t_r[b, : len(tr)] = tr
        qlen_l[b], tlen_l[b] = len(ql), len(tl)
        qlen_r[b], tlen_r[b] = len(qr), len(tr)
    # no-left and no-right lanes
    qlen_l[0] = tlen_l[0] = 0
    qlen_r[1] = tlen_r[1] = 0
    w0 = 12  # small band so retries actually trigger

    out = extend_seed_batch(
        jnp.asarray(q_l), jnp.asarray(qlen_l), jnp.asarray(t_l),
        jnp.asarray(tlen_l), jnp.asarray(q_r), jnp.asarray(qlen_r),
        jnp.asarray(t_r), jnp.asarray(tlen_r), jnp.asarray(MAT),
        jnp.full(B, w0, np.int32), jnp.asarray(h0),
        jnp.full(B, OPT.pen_clip5, np.int32),
        jnp.full(B, OPT.pen_clip3, np.int32),
        o_del=OPT.o_del, e_del=OPT.e_del, o_ins=OPT.o_ins, e_ins=OPT.e_ins,
        zdrop=OPT.zdrop, mat_max=OPT.a)

    for b in range(B):
        if qlen_l[b] > 0:
            want_l, aw0 = host_side(
                q_l[b, : qlen_l[b]].astype(np.uint8),
                t_l[b, : tlen_l[b]].astype(np.uint8), w0, int(h0[b]),
                OPT.pen_clip5, -1)
            got_l = ExtendResult(*(int(np.asarray(f)[b]) for f in out.left))
            assert got_l == want_l, (b, got_l, want_l)
            assert int(out.aw0[b]) == aw0, b
            sc0 = want_l.score
        else:
            sc0 = int(h0[b])
        assert int(out.score0[b]) == sc0, b
        if qlen_r[b] > 0:
            want_r, aw1 = host_side(
                q_r[b, : qlen_r[b]].astype(np.uint8),
                t_r[b, : tlen_r[b]].astype(np.uint8), w0, sc0,
                OPT.pen_clip3, sc0)
            got_r = ExtendResult(*(int(np.asarray(f)[b]) for f in out.right))
            assert got_r == want_r, (b, got_r, want_r)
            assert int(out.aw1[b]) == aw1, b
