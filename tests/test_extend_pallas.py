"""Pallas extension kernel vs the scalar reference (interpret mode on CPU;
the real-TPU equality run happens in the perf harness and production path).
"""
import numpy as np

from tpubwa.config import MemOptions
from tpubwa.ops.extend_ref import ExtendResult, extend_ref

OPT = MemOptions()
MAT = OPT.score_matrix()


def test_pallas_extend_matches_ref_interpret(rng):
    import jax.numpy as jnp

    from tpubwa.ops.extend_pallas import _extend_core_pallas

    B, Q, T = 8, 32, 48
    q = np.full((B, Q), 4, np.int32)
    t = np.full((B, T), 4, np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for b in range(B):
        tl = int(rng.integers(5, T))
        ql = int(rng.integers(1, min(tl, Q)))
        tt = rng.integers(0, 4, tl).astype(np.int32)
        qq = tt[:ql].copy()
        mm = rng.random(ql) < 0.1
        qq[mm] = (qq[mm] + 1) % 4
        q[b, :ql] = qq
        t[b, :tl] = tt
        qlen[b], tlen[b] = ql, tl
    qlen[0] = 0  # degenerate lane
    w = rng.choice([3, 10, 100], B).astype(np.int32)
    h0 = rng.integers(1, 30, B).astype(np.int32)
    bonus = np.full(B, 5, np.int32)

    res = _extend_core_pallas(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t),
        jnp.asarray(tlen), jnp.asarray(MAT), jnp.asarray(w),
        jnp.asarray(h0), jnp.asarray(bonus),
        o_del=OPT.o_del, e_del=OPT.e_del, o_ins=OPT.o_ins,
        e_ins=OPT.e_ins, zdrop=OPT.zdrop, mat_max=OPT.a, interpret=True)
    for b in range(B):
        if qlen[b] == 0:
            continue
        want = extend_ref(
            q[b, : qlen[b]].astype(np.uint8), t[b, : tlen[b]].astype(
                np.uint8), MAT, OPT.o_del, OPT.e_del, OPT.o_ins, OPT.e_ins,
            int(w[b]), int(bonus[b]), OPT.zdrop, int(h0[b]))
        got = ExtendResult(
            int(res.score[b]), int(res.qle[b]), int(res.tle[b]),
            int(res.gtle[b]), int(res.gscore[b]), int(res.max_off[b]))
        assert got == want, (b, got, want)
