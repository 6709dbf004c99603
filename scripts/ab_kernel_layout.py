"""A/B the transposed [Q,B] Pallas DP kernel vs the round-4 [B,Q] layout
on the real chip: bit-identity on randomized production-shaped lanes, then
scan-REP timing (same methodology as bench.py --kernel)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from tpubwa.cli import _enable_compile_cache
from tpubwa.config import MemOptions
from tpubwa.ops.extend_pallas import (_extend_core_pallas_b,
                                      _extend_core_pallas_t)

_enable_compile_cache()

opt = MemOptions()
kw = dict(o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
          e_ins=opt.e_ins, zdrop=opt.zdrop, mat_max=opt.a)
mat = jnp.asarray(opt.score_matrix())

rng = np.random.default_rng(0)

# --- bit-identity on randomized lanes (mixed lengths, mutations, indels)
B, Q, T = 1024, 192, 256
q = np.full((B, Q), 4, np.int32)
t = np.full((B, T), 4, np.int32)
qlen = np.zeros(B, np.int32)
tlen = np.zeros(B, np.int32)
for b in range(B):
    tl = int(rng.integers(5, T))
    ql = int(rng.integers(1, min(tl + 20, Q)))
    tt = rng.integers(0, 4, tl).astype(np.int32)
    qq = tt[:min(ql, tl)].copy()
    if len(qq) < ql:
        qq = np.concatenate([qq, rng.integers(0, 4, ql - len(qq))])
    mm = rng.random(ql) < 0.08
    qq[mm] = (qq[mm] + 1) % 4
    q[b, :ql] = qq
    t[b, :tl] = tt
    qlen[b], tlen[b] = ql, tl
w = rng.choice([3, 10, 100], B).astype(np.int32)
h0 = rng.integers(1, 120, B).astype(np.int32)
eb = np.full(B, 5, np.int32)
args = [jnp.asarray(x) for x in (q, qlen, t, tlen)] + [mat] + \
    [jnp.asarray(x) for x in (w, h0, eb)]

ra = _extend_core_pallas_b(*args, **kw)
rb = _extend_core_pallas_t(*args, **kw)
for f in ("score", "qle", "tle", "gtle", "gscore", "max_off"):
    a, bv = np.asarray(getattr(ra, f)), np.asarray(getattr(rb, f))
    if not np.array_equal(a, bv):
        bad = np.nonzero(a != bv)[0][:5]
        print(f"MISMATCH {f}: lanes {bad} old={a[bad]} new={bv[bad]}")
        sys.exit(1)
print("bit-identical on 1024 randomized lanes", flush=True)

# --- timing at the bench shape (q == t, no early exit)
B, Q, T = 4096, 256, 256
q = rng.integers(0, 4, (B, Q)).astype(np.int32)
t = q.copy()
qlen = np.full(B, Q, np.int32)
tlen = np.full(B, T, np.int32)
w = np.full(B, opt.w, np.int32)
h0 = np.full(B, 30, np.int32)
eb = np.full(B, 5, np.int32)
args = [jnp.asarray(x) for x in (q, qlen, t, tlen)] + [mat] + \
    [jnp.asarray(x) for x in (w, h0, eb)]
REP = 16


def timeit(fn, name):
    @jax.jit
    def many(q, qlen, t, tlen, mat, w, h0, eb):
        def body(c, _):
            out = fn(q, qlen, t, tlen, mat, w, h0 + (c & 7), eb, **kw)
            return c + out.score[0], out.score[0]
        _, s = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                            length=REP)
        return s

    _ = np.asarray(many(*args))
    dt = 1e9
    for k in range(3):
        a2 = list(args)
        a2[6] = args[6] + (k + 1)
        t0 = time.monotonic()
        _ = np.asarray(many(*a2))
        dt = min(dt, time.monotonic() - t0)
    probe = jnp.arange(REP, dtype=jnp.int32) + args[6][0]
    _ = np.asarray(probe)
    ovh = 1e9
    for k in range(3):
        t0 = time.monotonic()
        _ = np.asarray(probe + (k + 1))
        ovh = min(ovh, time.monotonic() - t0)
    per = max(dt - min(ovh, 0.5 * dt), 1e-9) / REP
    print(f"{name:12s} {per*1e3:7.2f} ms/call  "
          f"{B*T*Q/per/1e9:7.1f} Gcells/s(hw)", flush=True)
    return per


timeit(_extend_core_pallas_b, "layout[B,Q]")
timeit(_extend_core_pallas_t, "layout[Q,B]")
