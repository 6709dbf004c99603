"""Local Smith-Waterman (batched) — mate rescue scoring.

Semantics of bwa's ksw_align2 / the reference's kswv batched many-vs-many
scorer used by mem_sam_pe_batch (SURVEY.md §2.1 "kswv", §3.1 HOT LOOP #2:
95% of chr22 SW work is 8-bit mate-rescue scoring).  Standard local DP
(start anywhere, gaps open from H, scores floored at 0):

  E(i,j) = max(0, E(i-1,j) - e_del, H(i-1,j) - oe_del)
  F(i,j) = max(0, F(i,j-1) - e_ins, H(i,j-1) - oe_ins)
  H(i,j) = max(0, H(i-1,j-1) + S(t_i, q_j), E(i,j), F(i,j))

Outputs per lane: score (global max), te (first row achieving it), qe
(first column achieving it within that row), score2 (best row-max at rows
farther than qlen from te, among rows with row-max >= minsc; -1 if none).
A per-lane endsc implements the reverse-pass early stop used to find start
coordinates (ksw's KSW_XSTOP).

The F recurrence vectorizes per row because an F-path through an F-derived
H is always dominated by the direct open (o >= 0) — so F is an exclusive
running max of H-without-F.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
BIG = 1 << 30


class LocalSWResult(NamedTuple):
    score: jax.Array
    te: jax.Array
    qe: jax.Array
    score2: jax.Array


def localsw_ref(query: np.ndarray, target: np.ndarray, mat: np.ndarray,
                o_del: int, e_del: int, o_ins: int, e_ins: int,
                minsc: int = 0, endsc: int = BIG
                ) -> tuple[int, int, int, int]:
    """Scalar reference.  Returns (score, te, qe, score2)."""
    qlen, tlen = len(query), len(target)
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    H_prev = np.zeros(qlen, dtype=np.int64)
    E = np.zeros(qlen, dtype=np.int64)
    rowmax = []
    rowarg = []
    for i in range(tlen):
        s_row = mat[target[i], query].astype(np.int64)
        M = np.concatenate([[0], H_prev[:-1]]) + s_row
        E = np.maximum(0, np.maximum(E - e_del, H_prev - oe_del))
        H = np.zeros(qlen, dtype=np.int64)
        f = 0
        for j in range(qlen):
            h = max(0, M[j], E[j], f)
            H[j] = h
            f = max(0, f - e_ins, h - oe_ins)
        rowmax.append(int(H.max()))
        rowarg.append(int(H.argmax()))
        H_prev = H
        if rowmax[-1] >= endsc:
            break
    if not rowmax:
        return 0, -1, -1, -1
    gmax = max(rowmax)
    if gmax == 0:
        return 0, -1, -1, -1
    te = rowmax.index(gmax)
    qe = rowarg[te]
    score2 = -1
    for t, m in enumerate(rowmax):
        if m >= minsc and (t < te - qlen or t > te + qlen) and m > score2:
            score2 = m
    return gmax, te, qe, score2


@functools.partial(jax.jit, static_argnames=(
    "o_del", "e_del", "o_ins", "e_ins"))
def localsw_batch(query: jax.Array, qlen: jax.Array, target: jax.Array,
                  tlen: jax.Array, mat: jax.Array, minsc: jax.Array,
                  endsc: jax.Array, *, o_del: int, e_del: int,
                  o_ins: int, e_ins: int) -> LocalSWResult:
    """Batched local SW.  query [B,Q], target [B,T] int32 codes (pad=4)."""
    B, Q = query.shape
    _, T = target.shape
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    jb = jnp.arange(Q, dtype=I32)[None, :]
    in_q = jb < qlen[:, None]
    mat_flat = mat.reshape(-1).astype(I32)
    query = query.astype(I32)
    target = target.astype(I32)
    NEG = jnp.int32(-BIG)

    def step(carry, i):
        H_prev, E = carry
        t_i = jnp.take_along_axis(
            target, jnp.broadcast_to(jnp.minimum(i, T - 1), (B, 1)),
            axis=1)[:, 0]
        s_row = mat_flat[t_i[:, None] * 5 + query]
        Hd = jnp.concatenate([jnp.zeros((B, 1), I32), H_prev[:, :-1]], axis=1)
        M = Hd + s_row
        E = jnp.maximum(0, jnp.maximum(E - e_del, H_prev - oe_del))
        Hnf = jnp.maximum(0, jnp.maximum(M, E))
        Hnf = jnp.where(in_q, Hnf, 0)
        g = Hnf - oe_ins + jb * e_ins
        cm = jax.lax.cummax(g, axis=1)
        F = jnp.concatenate(
            [jnp.full((B, 1), NEG), cm[:, :-1]], axis=1) - (jb - 1) * e_ins
        H = jnp.maximum(Hnf, F)
        H = jnp.where(in_q, H, 0)
        active = i < tlen
        H = jnp.where(active[:, None], H, H_prev * 0)
        rmax = jnp.max(H, axis=1)
        rarg = jnp.argmax(H, axis=1).astype(I32)
        rmax = jnp.where(active, rmax, -1)
        return (H, E), (rmax, rarg)

    init = (jnp.zeros((B, Q), I32), jnp.zeros((B, Q), I32))
    _, (R, C) = jax.lax.scan(step, init, jnp.arange(T, dtype=I32))
    R = R.T  # [B, T]
    C = C.T

    trow = jnp.arange(T, dtype=I32)[None, :]
    # endsc stop: rows at or before the first row reaching endsc
    reached = R >= endsc[:, None]
    stop_row = jnp.where(jnp.any(reached, axis=1),
                         jnp.argmax(reached, axis=1).astype(I32), T - 1)
    eff = (trow <= stop_row[:, None]) & (trow < tlen[:, None])
    Reff = jnp.where(eff, R, -1)
    gmax = jnp.max(Reff, axis=1)
    te = jnp.argmax(Reff == gmax[:, None], axis=1).astype(I32)
    qe = C[jnp.arange(B), te]
    none = gmax <= 0
    score2_mask = eff & (Reff >= minsc[:, None]) \
        & ((trow < te[:, None] - qlen[:, None])
           | (trow > te[:, None] + qlen[:, None]))
    score2 = jnp.max(jnp.where(score2_mask, Reff, -1), axis=1)
    return LocalSWResult(
        score=jnp.where(none, 0, gmax),
        te=jnp.where(none, -1, te),
        qe=jnp.where(none, -1, qe),
        score2=jnp.where(none, -1, score2),
    )
