"""Pallas TPU kernel for batched banded affine-gap seed extension.

THE hot DP kernel (SURVEY.md §7 "bandedSWA ... -> one Pallas kernel"): the
reference implements this loop five times (SSE2/AVX2/AVX512/NEON/SVE2 —
[src] bandedSWA*.cpp); here it is one kernel where a VPU lane = one
extension job (inter-task vectorization, SoA), and — unlike the lax.scan
formulation in ops.extend — the whole DP state (H/E/M rows and the best
trackers) lives in VMEM across target rows, so each row costs a handful of
VPU ops instead of an HBM round-trip of the carried state.

Semantics are bit-identical to ops.extend._extend_core / extend_ref
(property-tested): same band, row recurrence via the exclusive running-max
F trick, zdrop, boundary column, and gscore bookkeeping.

Grid: one program per lane tile (TILE_B lanes); the row loop is a
jax.lax.while_loop *inside* the kernel with an any-alive early exit — in
VMEM the per-iteration cost is tiny, and most lanes terminate long before
the padded target length (zero-row break or z-drop).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpubwa.ops.extend import ExtendBatchResult, clamp_band_batch

I32 = jnp.int32
NEG = -(1 << 30)
TILE_B = 128  # 128 beats 256 by ~11% even at uniform depth (fewer vregs
#               in flight), and finer tiles exit earlier on mixed-depth
#               waves (the grid runs tiles sequentially on one TensorCore)


def _cummax_excl(g):
    """Exclusive running max of g along lanes: log-step doubling
    (8 shifted maxes for Q<=256)."""
    B, Q = g.shape
    k = 1
    cm = g
    while k < Q:
        pad = jnp.full((B, k), NEG, I32)
        cm = jnp.maximum(cm, jnp.concatenate([pad, cm[:, :-k]], axis=1))
        k <<= 1
    return jnp.concatenate([jnp.full((B, 1), NEG, I32), cm[:, :-1]], axis=1)


def _kernel(sc_ref, q_ref, t_ref, qlen_ref, tlen_ref, w_ref, h0_ref,
            out_ref, H_ref, E_ref, M_ref, *, o_del: int, e_del: int,
            o_ins: int, e_ins: int, zdrop: int):
    B, Q = q_ref.shape
    T = t_ref.shape[0]            # target arrives transposed: [T, B]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    s_match = sc_ref[0, 0]
    s_mis = sc_ref[0, 1]
    s_n = sc_ref[0, 2]

    query = q_ref[:]
    qlen = qlen_ref[:, 0]
    tlen = tlen_ref[:, 0]
    w = w_ref[:, 0]
    h0 = h0_ref[:, 0]
    jb = jax.lax.broadcasted_iota(I32, (B, Q), 1)
    q_is_n = query >= 4
    # loop-invariant hoists: each of these would otherwise cost a full
    # [B, Q] VPU op per target row
    jbe = jb * e_ins                   # jb * e_ins (F candidate base)
    jbe1 = jbe - e_ins                 # (jb - 1) * e_ins
    qmask = jb < qlen[:, None]         # query-length band limit
    qlast = jb == qlen[:, None] - 1    # gscore extraction column

    # 2-D DP state lives in VMEM scratch refs (while_loop carries of 2-D
    # vectors hit Mosaic layout-inference corner cases; refs also avoid
    # copying the state every iteration)
    # boundary row: H(-1, j) = max(0, h0 - oe_ins - j*e_ins)
    H_ref[:, :] = jnp.maximum(h0[:, None] - oe_ins - jb * e_ins, 0)
    E_ref[:, :] = jnp.zeros((B, Q), I32)
    M_ref[:, :] = jnp.zeros((B, Q), I32)

    st = (jnp.zeros((), I32),                       # i
          h0,                                       # H_prev boundary col
          h0,                                       # best
          jnp.full((B,), -1, I32),                  # best_i
          jnp.full((B,), -1, I32),                  # best_j
          jnp.full((B,), -1, I32),                  # max_ie
          jnp.full((B,), -1, I32),                  # gscore
          jnp.zeros((B,), I32),                     # max_off
          ((qlen > 0) & (tlen > 0)).astype(I32))    # alive (i1 vector
    #       carries fail Mosaic scf.yield legalization -> carry as i32)

    def cond(st):
        i, alive_i = st[0], st[-1]
        # int32 max-reduce, not jnp.any: Mosaic lowers the bool any()
        # through a float mask that becomes float64 under jax x64 (wide
        # indexes) and fails scalar conversion
        return jnp.max(((alive_i > 0) & (i < tlen)).astype(I32)) > 0

    def body(st):
        (i, Hb, best, best_i, best_j, max_ie, gscore, max_off,
         alive_i) = st
        alive = alive_i > 0
        H_tail = H_ref[:, :]
        E_prev = E_ref[:, :]
        M_prev = M_ref[:, :]
        act = alive & (i < tlen)

        in_band = (jb >= i - w[:, None]) & (jb < i + w[:, None] + 1) \
            & qmask
        t_i = t_ref[pl.ds(i, 1), :][0, :]
        t_col = t_i[:, None]                    # int32: minor-dim insert ok
        is_n = q_is_n | (t_col >= 4)
        s_row = jnp.where(is_n, s_n,
                          jnp.where(t_col == query, s_match, s_mis))

        # H(i-1, j-1): boundary column prepended to H_tail shifted right
        hd = jnp.concatenate([Hb[:, None], H_tail[:, :-1]], axis=1)
        M = jnp.where(hd > 0, hd + s_row, 0)
        M = jnp.where(in_band, M, 0)

        # no i==0 gate: M_prev/E_prev start at 0, so the recurrence gives
        # max(-oe_del, -e_del, 0) = 0 = E(0, j) — the blend the gate used
        # to compute (pinned by the extend_ref differential tests)
        E = jnp.maximum(jnp.maximum(M_prev - oe_del, E_prev - e_del), 0)

        g = jnp.maximum(M - oe_ins, 0) + jbe
        F = jnp.maximum(_cummax_excl(g) - jbe1, 0)
        beg = jnp.maximum(i - w, 0)[:, None]
        F = jnp.where(jb > beg, F, 0)

        H = jnp.maximum(jnp.maximum(M, E), F)
        H = jnp.where(in_band, H, 0)

        m = jnp.max(H, axis=1)
        mj = jnp.max(jnp.where(in_band & (H == m[:, None]), jb, -1), axis=1)

        boundary = jnp.where(
            i <= w, jnp.maximum(h0 - o_del - e_del * (i + 1), 0), 0)

        # gscore update when the band touches the query end:
        # H_row[qlen] = H_tail[qlen-1] (qlen >= 1 when act)
        reach_end = act & (i + w + 1 >= qlen)
        # x64 note: jnp.sum promotes int32 -> int64 when jax_enable_x64
        # is on (wide-index serving) — pin the accumulator dtype or the
        # while_loop carry types diverge between trace and body
        h_last = jnp.sum(jnp.where(qlast, H, 0), axis=1, dtype=I32)
        h_last = jnp.where(qlen > 0, h_last, boundary).astype(I32)
        g_upd = reach_end & (h_last >= gscore)
        gscore = jnp.where(g_upd, h_last, gscore)
        max_ie = jnp.where(g_upd, i, max_ie)

        zero_break = act & (m == 0)
        live = act & ~zero_break
        better = live & (m > best)
        best_n = jnp.where(better, m, best)
        best_i_n = jnp.where(better, i, best_i)
        best_j_n = jnp.where(better, mj, best_j)
        max_off_n = jnp.where(
            better, jnp.maximum(max_off, jnp.abs(mj - i)), max_off)
        if zdrop > 0:
            di = i - best_i
            dj = mj - best_j
            del_path = di > dj   # select over bools truncates i8->i1,
            #                      unsupported in Mosaic: use logic ops
            zcond = ((del_path & (best - m - (di - dj) * e_del > zdrop))
                     | (~del_path & (best - m - (dj - di) * e_ins > zdrop)))
            z_break = live & ~better & zcond
        else:
            z_break = jnp.zeros_like(zero_break)
        alive_n = alive & ~zero_break & ~z_break & ((i + 1) < tlen)

        keep = act & ~zero_break & ~z_break
        # dead lanes' DP state is never read again (their trackers are
        # frozen behind `alive`), so the row state writes back
        # UNCONDITIONALLY — the per-lane keep-blend cost ~9 extra
        # full-width VPU ops per row
        H_ref[:, :] = H
        E_ref[:, :] = E
        M_ref[:, :] = M
        return (i + 1,
                jnp.where(keep, boundary, Hb).astype(I32),
                best_n.astype(I32), best_i_n.astype(I32),
                best_j_n.astype(I32), max_ie.astype(I32),
                gscore.astype(I32), max_off_n.astype(I32),
                alive_n.astype(I32))

    st = jax.lax.while_loop(cond, body, st)
    (_, _, best, best_i, best_j, max_ie, gscore, max_off, _) = st
    zeros = jnp.zeros((B,), I32)
    cols = [best, best_j + 1, best_i + 1, max_ie + 1, gscore, max_off]
    out = jnp.stack(cols + [zeros, zeros], axis=1)     # [B, 8]
    out_ref[:, :] = out


def _cummax_excl_rows(g):
    """Exclusive running max of g along axis 0 (sublanes): log-step
    doubling — sublane shifts, cheap in the transposed [Q, B] layout."""
    Q, B = g.shape
    k = 1
    cm = g
    while k < Q:
        pad = jnp.full((k, B), NEG, I32)
        cm = jnp.maximum(cm, jnp.concatenate([pad, cm[:-k, :]], axis=0))
        k <<= 1
    return jnp.concatenate([jnp.full((1, B), NEG, I32), cm[:-1, :]], axis=0)


def _kernel_t(sc_ref, q_ref, t_ref, qlen_ref, tlen_ref, w_ref, h0_ref,
              out_ref, H_ref, E_ref, *, o_del: int, e_del: int,
              o_ins: int, e_ins: int, zdrop: int, unroll: int):
    """Transposed-layout row kernel: DP state is [Q, B] — jobs ride the
    128-lane hardware axis and the DP column axis rides SUBLANES.  The
    round-4 kernel ([B, Q], jobs on sublanes) spent ~85% of its time in
    the two per-row lane-axis reductions (m = max(H), mj = argmax — the
    r5 ablation: full 19.3 ms vs 2.0 ms with the reductions stubbed);
    in this layout the same reductions run along sublanes and cost about
    one elementwise op.  Two further trims vs the round-4 kernel:
    E is computed one row AHEAD (E(i+1) from this row's M and E), which
    removes the third VMEM scratch array (M never persists), and the
    while_loop body processes ``unroll`` target rows per iteration so the
    vector->scalar any-alive sync amortizes (dead lanes' extra rows are
    masked exactly like the old single-row body's — trackers freeze
    behind `alive`).  Semantics identical to the round-4 kernel
    (bit-pinned by tests/test_extend_pallas.py and the production
    differential suite)."""
    Q, B = q_ref.shape
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    s_match = sc_ref[0, 0]
    s_mis = sc_ref[0, 1]
    s_n = sc_ref[0, 2]

    query = q_ref[:]                       # [Q, B]
    qlen = qlen_ref[0, :]                  # [B] lane vectors
    tlen = tlen_ref[0, :]
    w = w_ref[0, :]
    h0 = h0_ref[0, :]
    jb = jax.lax.broadcasted_iota(I32, (Q, B), 0)
    q_is_n = query >= 4
    jbe = jb * e_ins
    jbe1 = jbe - e_ins
    qmask = jb < qlen[None, :]
    qlast = jb == qlen[None, :] - 1

    H_ref[:, :] = jnp.maximum(h0[None, :] - oe_ins - jb * e_ins, 0)
    # E(0): max(M(-1,j) - oe_del, E(-1,j) - e_del, 0) with zero state = 0
    E_ref[:, :] = jnp.zeros((Q, B), I32)

    st = (jnp.zeros((), I32), h0, h0,
          jnp.full((B,), -1, I32), jnp.full((B,), -1, I32),
          jnp.full((B,), -1, I32), jnp.full((B,), -1, I32),
          jnp.zeros((B,), I32),
          ((qlen > 0) & (tlen > 0)).astype(I32))

    def cond(st):
        i, alive_i = st[0], st[-1]
        return jnp.max(((alive_i > 0) & (i < tlen)).astype(I32)) > 0

    def body(st):
        (i0, Hb, best, best_i, best_j, max_ie, gscore, max_off,
         alive_i) = st
        alive = alive_i > 0
        H_tail = H_ref[:, :]
        E_cur = E_ref[:, :]

        for k in range(unroll):
            i = i0 + k
            act = alive & (i < tlen)

            in_band = (jb >= i - w[None, :]) & (jb < i + w[None, :] + 1) \
                & qmask
            t_i = t_ref[pl.ds(i, 1), :]             # [1, B]
            is_n = q_is_n | (t_i >= 4)
            s_row = jnp.where(is_n, s_n,
                              jnp.where(t_i == query, s_match, s_mis))

            # H(i-1, j-1): boundary column prepended, shifted one sublane
            hd = jnp.concatenate([Hb[None, :], H_tail[:-1, :]], axis=0)
            M = jnp.where(hd > 0, hd + s_row, 0)
            M = jnp.where(in_band, M, 0)

            E = E_cur

            g = jnp.maximum(M - oe_ins, 0) + jbe
            F = jnp.maximum(_cummax_excl_rows(g) - jbe1, 0)
            beg = jnp.maximum(i - w, 0)[None, :]
            F = jnp.where(jb > beg, F, 0)

            H = jnp.maximum(jnp.maximum(M, E), F)
            H = jnp.where(in_band, H, 0)

            m = jnp.max(H, axis=0)
            mj = jnp.max(jnp.where(in_band & (H == m[None, :]), jb, -1),
                         axis=0)

            boundary = jnp.where(
                i <= w, jnp.maximum(h0 - o_del - e_del * (i + 1), 0), 0)

            reach_end = act & (i + w + 1 >= qlen)
            h_last = jnp.sum(jnp.where(qlast, H, 0), axis=0, dtype=I32)
            h_last = jnp.where(qlen > 0, h_last, boundary).astype(I32)
            g_upd = reach_end & (h_last >= gscore)
            gscore = jnp.where(g_upd, h_last, gscore)
            max_ie = jnp.where(g_upd, i, max_ie)

            zero_break = act & (m == 0)
            live = act & ~zero_break
            better = live & (m > best)
            best = jnp.where(better, m, best)
            best_i = jnp.where(better, i, best_i)
            max_off = jnp.where(
                better, jnp.maximum(max_off, jnp.abs(mj - i)), max_off)
            best_j = jnp.where(better, mj, best_j)
            # in-place tracker updates are safe before the zdrop block:
            # z_break is masked by ~better, and where ~better the updates
            # above kept the old values the zdrop comparison needs
            if zdrop > 0:
                di = i - best_i
                dj = mj - best_j
                del_path = di > dj
                zcond = ((del_path
                          & (best - m - (di - dj) * e_del > zdrop))
                         | (~del_path
                            & (best - m - (dj - di) * e_ins > zdrop)))
                z_break = live & ~better & zcond
            else:
                z_break = jnp.zeros_like(zero_break)
            alive = alive & ~zero_break & ~z_break & ((i + 1) < tlen)

            keep = act & ~zero_break & ~z_break
            Hb = jnp.where(keep, boundary, Hb)
            # E for the NEXT row, from this row's M and E
            E_cur = jnp.maximum(jnp.maximum(M - oe_del, E - e_del), 0)
            H_tail = H

        H_ref[:, :] = H_tail
        E_ref[:, :] = E_cur
        return (i0 + unroll, Hb.astype(I32),
                best.astype(I32), best_i.astype(I32),
                best_j.astype(I32), max_ie.astype(I32),
                gscore.astype(I32), max_off.astype(I32),
                alive.astype(I32))

    st = jax.lax.while_loop(cond, body, st)
    (_, _, best, best_i, best_j, max_ie, gscore, max_off, _) = st
    zeros = jnp.zeros((B,), I32)
    cols = [best, best_j + 1, best_i + 1, max_ie + 1, gscore, max_off,
            zeros, zeros]
    out_ref[:, :] = jnp.stack(cols, axis=0)        # [8, B]


def _extend_core_pallas_t(query, qlen, target, tlen, mat, w, h0,
                          end_bonus, *, o_del: int, e_del: int, o_ins: int,
                          e_ins: int, zdrop: int, mat_max: int,
                          interpret: bool = False) -> ExtendBatchResult:
    """Transposed-layout Pallas core — same contract as
    ops.extend._extend_core; see _kernel_t."""
    B, Q = query.shape
    if B % TILE_B != 0 and B > TILE_B:
        raise ValueError(f"B={B} must be a multiple of {TILE_B} or smaller")
    tb = min(B, TILE_B)
    mat = mat.astype(I32)
    w = clamp_band_batch(
        w.astype(I32), qlen.astype(I32), mat_max, o_del, e_del, o_ins,
        e_ins, end_bonus.astype(I32))
    row = lambda v: v.astype(I32).reshape(1, B)  # noqa: E731

    sc = jnp.stack([mat[0, 0], mat[0, 1], mat[0, 4]]).reshape(1, 3)
    import os

    T = target.shape[1]
    # 8 rows per any-alive check: bench sweep 2/4/8/16 = 55.3/59.4/60.2/
    # 62.8 Gcells/s — past 8 the gain is within chip noise and the
    # program grows; the <=unroll-1 boundary rows per TILE are negligible
    unroll = int(os.environ.get("TPUBWA_PALLAS_UNROLL", "8"))
    while T % unroll:
        unroll >>= 1
    kern = functools.partial(
        _kernel_t, o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
        zdrop=zdrop, unroll=unroll)
    grid = (B // tb,)
    lane = lambda: pl.BlockSpec((1, tb), lambda i: (0, i),  # noqa: E731
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Q, tb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((target.shape[1], tb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            lane(), lane(), lane(), lane(),
        ],
        out_specs=pl.BlockSpec((8, tb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, B), I32),
        scratch_shapes=[
            pltpu.VMEM((Q, tb), I32),   # H row
            pltpu.VMEM((Q, tb), I32),   # E (one row ahead)
        ],
        interpret=interpret,
    )(sc.astype(I32), query.astype(I32).T, target.astype(I32).T, row(qlen),
      row(tlen), row(w), row(h0))
    return ExtendBatchResult(
        score=out[0], qle=out[1], tle=out[2], gtle=out[3],
        gscore=out[4], max_off=out[5])


def _extend_core_pallas(query, qlen, target, tlen, mat, w, h0, end_bonus, *,
                        o_del: int, e_del: int, o_ins: int, e_ins: int,
                        zdrop: int, mat_max: int,
                        interpret: bool = False) -> ExtendBatchResult:
    """Traceable Pallas core — same contract as ops.extend._extend_core.
    interpret=True runs the kernel in the Pallas interpreter (CPU tests).

    Dispatches to the transposed-layout kernel (_kernel_t) unless
    TPUBWA_PALLAS_LAYOUT=b requests the round-4 [B, Q] layout."""
    import os

    if os.environ.get("TPUBWA_PALLAS_LAYOUT", "t") != "b":
        return _extend_core_pallas_t(
            query, qlen, target, tlen, mat, w, h0, end_bonus, o_del=o_del,
            e_del=e_del, o_ins=o_ins, e_ins=e_ins, zdrop=zdrop,
            mat_max=mat_max, interpret=interpret)
    return _extend_core_pallas_b(
        query, qlen, target, tlen, mat, w, h0, end_bonus, o_del=o_del,
        e_del=e_del, o_ins=o_ins, e_ins=e_ins, zdrop=zdrop,
        mat_max=mat_max, interpret=interpret)


def _extend_core_pallas_b(query, qlen, target, tlen, mat, w, h0,
                          end_bonus, *, o_del: int, e_del: int, o_ins: int,
                          e_ins: int, zdrop: int, mat_max: int,
                          interpret: bool = False) -> ExtendBatchResult:
    """Round-4 [B, Q]-layout core (kept for A/B measurement)."""
    B, Q = query.shape
    if B % TILE_B != 0 and B > TILE_B:
        raise ValueError(f"B={B} must be a multiple of {TILE_B} or smaller")
    tb = min(B, TILE_B)
    mat = mat.astype(I32)
    w = clamp_band_batch(
        w.astype(I32), qlen.astype(I32), mat_max, o_del, e_del, o_ins,
        e_ins, end_bonus.astype(I32))
    col = lambda v: v.astype(I32).reshape(B, 1)  # noqa: E731

    # the scoring matrix is assumed bwa_fill_scmat-structured; its three
    # distinct values ride along as SMEM scalars
    sc = jnp.stack([mat[0, 0], mat[0, 1], mat[0, 4]]).reshape(1, 3)

    kern = functools.partial(
        _kernel, o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
        zdrop=zdrop)
    grid = (B // tb,)
    lane = lambda: pl.BlockSpec((tb, 1), lambda i: (i, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, Q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((target.shape[1], tb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            lane(), lane(), lane(), lane(),
        ],
        out_specs=pl.BlockSpec((tb, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8), I32),
        scratch_shapes=[
            pltpu.VMEM((tb, Q), I32),   # H row
            pltpu.VMEM((tb, Q), I32),   # E
            pltpu.VMEM((tb, Q), I32),   # M_prev
        ],
        interpret=interpret,
    )(sc.astype(I32), query.astype(I32), target.astype(I32).T, col(qlen),
      col(tlen), col(w), col(h0))
    return ExtendBatchResult(
        score=out[:, 0], qle=out[:, 1], tle=out[:, 2], gtle=out[:, 3],
        gscore=out[:, 4], max_off=out[:, 5])


extend_batch_pallas = jax.jit(
    _extend_core_pallas,
    static_argnames=("o_del", "e_del", "o_ins", "e_ins", "zdrop", "mat_max"))


def extend_seed_batch_pallas(*args, **kw):
    """Fused whole-seed extension (ops.extend.extend_seed_batch) running on
    the VMEM-resident Pallas core — the TPU production path."""
    from tpubwa.ops.extend import extend_seed_batch

    return extend_seed_batch(*args, core=_extend_core_pallas, **kw)
