#!/usr/bin/env python
"""Micro-bench the SMEM chain step components at B=4096."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from bench import _ensure_fixture
from tpubwa.index.fmindex import FMIndex
from tpubwa.ops.fm import DeviceIndex, ext_core, set_intv
from tpubwa.ops.smem_chain import _take_q, smem_round1_chain

ref_fa, fq1, _ = _ensure_fixture(4.6, 20000, False)
idx = FMIndex.load(ref_fa)
di = DeviceIndex.from_host(idx)

B = 4096
I32 = jnp.int32
rng = np.random.default_rng(0)
N = int(di.sa.shape[0]) - 1

def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    return sum(float(jnp.sum(l.astype(jnp.float32))) if l.dtype != jnp.bool_
               else float(jnp.sum(l)) for l in leaves)

def t(label, fn, n=5):
    force(fn())
    ts = []
    for _ in range(n):
        t0 = time.monotonic(); force(fn()); ts.append(time.monotonic()-t0)
    print(f"  {label:34s} {min(ts)*1000:8.2f} ms")

k = jnp.asarray(rng.integers(0, N//2, B).astype(np.int32))
s = jnp.asarray(rng.integers(1, 100, B).astype(np.int32))
l = k
q = jnp.asarray(rng.integers(0, 4, (B, 160)).astype(np.int32))
i = jnp.asarray(rng.integers(0, 160, B).astype(np.int32))
m5 = jnp.zeros((B, 64, 5), I32)
mn = jnp.asarray(rng.integers(0, 64, B).astype(np.int32))
vals = jnp.stack([k, l, s, i, i], axis=-1)
rowsB = jnp.arange(B)

K = 64  # iterations inside fori_loop

@jax.jit
def loop_ext(k, l, s):
    def body(_, c):
        k, l, s = c
        kb, lb, sb = ext_core(di, k, l, s)
        return kb[:, 0], lb[:, 0], jnp.maximum(sb[:, 0], 1)
    return jax.lax.fori_loop(0, K, body, (k, l, s))

@jax.jit
def loop_takeq(i):
    def body(_, i):
        qi = _take_q(q, i)
        return (i + qi) % 160
    return jax.lax.fori_loop(0, K, body, i)

@jax.jit
def loop_scatter(m5, mn):
    def body(_, c):
        m5, mn = c
        dest = jnp.where(mn < 64, mn, 64)
        m5 = m5.at[rowsB, dest].set(vals, mode="drop")
        return m5, (mn + 1) % 70
    return jax.lax.fori_loop(0, K, body, (m5, mn))

@jax.jit
def loop_setintv(i):
    def body(_, i):
        iv = set_intv(di, i & 3)
        return (i + iv.s) % 160
    return jax.lax.fori_loop(0, K, body, i)

@jax.jit
def loop_noop(i):
    def body(_, i):
        return (i * 5 + 1) % 997
    return jax.lax.fori_loop(0, K, body, i)

@jax.jit
def loop_while_noop(i):
    def cond(c):
        n, i = c
        return n < K
    def body(c):
        n, i = c
        return n + 1, (i * 5 + 1) % 997
    return jax.lax.while_loop(cond, body, (0, i))

print(f"B={B}, K={K} iterations inside one jit")
t("fori: noop", lambda: loop_noop(i))
t("while: noop (any-cond)", lambda: loop_while_noop(i))
t("fori: ext_core (occ gather x2)", lambda: loop_ext(k, l, s))
t("fori: take_q mask-sum", lambda: loop_takeq(i))
t("fori: m5 scatter", lambda: loop_scatter(m5, mn))
t("fori: set_intv", lambda: loop_setintv(i))

# count round-1 while_loop iterations by instrumenting a copy
import tpubwa.ops.smem_chain as sc
lens_np = np.full(B, 150, np.int32)
codes = np.asarray(jax.random.randint(jax.random.PRNGKey(0), (B, 160), 0, 4), np.int32)
from tpubwa.io.fastq import stream_batches
batches = list(b for _, b in zip(range(1), stream_batches(fq1, B, 160)))
b0 = batches[0]
qq = jnp.asarray(b0.codes, jnp.int32)
ll = jnp.asarray(b0.lens)

@functools.partial(jax.jit, static_argnames=())
def count_iters(q, lens):
    B2, L = q.shape
    # replicate round1 state machine but count iterations
    st = dict(
        mode=jnp.where(lens > 0, jnp.full((B2,), sc.FRESH, I32),
                       jnp.full((B2,), sc.DONE, I32)),
        i=jnp.zeros((B2,), I32), j=jnp.zeros((B2,), I32),
        start=jnp.zeros((B2,), I32), e_anchor=jnp.zeros((B2,), I32),
        k=jnp.zeros((B2,), I32), l=jnp.zeros((B2,), I32),
        s=jnp.zeros((B2,), I32),
        bk=jnp.zeros((B2,), I32), bl=jnp.zeros((B2,), I32),
        bs=jnp.zeros((B2,), I32),
        m5=jnp.zeros((B2, 64, 5), I32),
        mn=jnp.zeros((B2,), I32), ovf=jnp.zeros((B2,), bool),
    )
    # steal the step fn via closure: rebuild via smem_round1_chain internals
    return st

sm = smem_round1_chain(di, qq, ll, min_seed_len=19, cap=64)
force(sm)
t0 = time.monotonic(); force(smem_round1_chain(di, qq, ll, min_seed_len=19, cap=64))
print(f"round1 total: {(time.monotonic()-t0)*1000:.1f} ms")
