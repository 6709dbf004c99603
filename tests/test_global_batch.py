"""global_align_batch (device DP fill + host traceback) must equal the
scalar numpy global_align exactly — scores, CIGARs, and the direction
bytes' tie-breaking (SURVEY.md §7 "DP state layout bugs are the dominant
defect class ... property tests over random lengths/batches before tiling").
"""
import numpy as np
import pytest

from tpubwa.config import MemOptions
from tpubwa.ops.global_align import (global_align, global_align_batch,
                                     global_align_cigar_batch,
                                     steps_to_cigar, traceback_cigar)


def _random_pair(rng, maxlen=96, err=0.08):
    tlen = int(rng.integers(4, maxlen))
    target = rng.integers(0, 4, tlen).astype(np.uint8)
    # query = mutated copy (subs + indels) so CIGARs are non-trivial
    q = []
    for c in target:
        r = rng.random()
        if r < err:          # substitution
            q.append((c + 1 + rng.integers(0, 3)) % 4)
        elif r < err * 1.5:  # deletion (skip)
            continue
        else:
            q.append(c)
            if rng.random() < err / 2:  # insertion
                q.append(rng.integers(0, 4))
    if not q:
        q = [0]
    query = np.array(q, dtype=np.uint8)[:maxlen]
    return query, target


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_matches_scalar(seed):
    import jax.numpy as jnp

    opt = MemOptions()
    mat = opt.score_matrix()
    rng = np.random.default_rng(seed)
    B, Q, T = 24, 96, 96
    q = np.zeros((B, Q), np.int32)
    t = np.zeros((B, T), np.int32)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    w = np.zeros(B, np.int32)
    jobs = []
    for b in range(B):
        query, target = _random_pair(rng)
        ql, tl = len(query), len(target)
        q[b, :ql] = query
        t[b, :tl] = target
        qlen[b] = ql
        tlen[b] = tl
        w[b] = max(abs(ql - tl) + 3, int(rng.integers(3, 40)))
        jobs.append((query, target))
    res = global_align_batch(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t), jnp.asarray(tlen),
        jnp.asarray(mat), jnp.asarray(w), o_del=opt.o_del, e_del=opt.e_del,
        o_ins=opt.o_ins, e_ins=opt.e_ins)
    score = np.asarray(res.score)
    z = np.asarray(res.z)
    # device-side traceback must agree too
    res2 = global_align_cigar_batch(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t), jnp.asarray(tlen),
        jnp.asarray(mat), jnp.asarray(w), o_del=opt.o_del, e_del=opt.e_del,
        o_ins=opt.o_ins, e_ins=opt.e_ins)
    score2 = np.asarray(res2.score)
    steps = np.asarray(res2.steps)
    for b, (query, target) in enumerate(jobs):
        s_ref, cig_ref = global_align(query, target, mat, opt.o_del,
                                      opt.e_del, opt.o_ins, opt.e_ins,
                                      int(w[b]))
        assert int(score[b]) == s_ref, f"lane {b}: score"
        cig = traceback_cigar(z[b], int(tlen[b]), int(qlen[b]), int(w[b]))
        assert cig == cig_ref, f"lane {b}: cigar"
        assert int(score2[b]) == s_ref, f"lane {b}: device score"
        assert steps_to_cigar(steps[b]) == cig_ref, f"lane {b}: device cigar"
