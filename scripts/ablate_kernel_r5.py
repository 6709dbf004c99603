"""Round-5 kernel ablation: which per-row blocks of the production Pallas
DP kernel cost the time?  Variants cut semantic blocks (results wrong —
timing only)."""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpubwa.cli import _enable_compile_cache

_enable_compile_cache()

I32 = jnp.int32
NEG = -(1 << 30)
TILE_B = 256


def _cummax_excl(g):
    B, Q = g.shape
    k = 1
    cm = g
    while k < Q:
        pad = jnp.full((B, k), NEG, I32)
        cm = jnp.maximum(cm, jnp.concatenate([pad, cm[:, :-k]], axis=1))
        k <<= 1
    return jnp.concatenate([jnp.full((B, 1), NEG, I32), cm[:, :-1]], axis=1)


def make_kernel(*, no_cummax=False, no_mj=False, no_m=False, no_hlast=False,
                no_zdrop=False, o_del=6, e_del=1, o_ins=6, e_ins=1,
                zdrop=100):
    def _kernel(sc_ref, q_ref, t_ref, qlen_ref, tlen_ref, w_ref, h0_ref,
                out_ref, H_ref, E_ref, M_ref):
        B, Q = q_ref.shape
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
        H_ref[:, :] = jnp.maximum(h0[:, None] - oe_ins - jb * e_ins, 0)
        E_ref[:, :] = jnp.zeros((B, Q), I32)
        M_ref[:, :] = jnp.zeros((B, Q), I32)
        st = (jnp.zeros((), I32), h0, h0, jnp.full((B,), -1, I32),
              jnp.full((B,), -1, I32), jnp.full((B,), -1, I32),
              jnp.full((B,), -1, I32), jnp.zeros((B,), I32),
              ((qlen > 0) & (tlen > 0)).astype(I32))

        def cond(st):
            i, alive_i = st[0], st[-1]
            return jnp.any((alive_i > 0) & (i < tlen))

        def body(st):
            (i, Hb, best, best_i, best_j, max_ie, gscore, max_off,
             alive_i) = st
            alive = alive_i > 0
            H_tail = H_ref[:, :]
            E_prev = E_ref[:, :]
            M_prev = M_ref[:, :]
            act = alive & (i < tlen)
            in_band = (jb >= i - w[:, None]) & (jb < i + w[:, None] + 1) \
                & (jb < qlen[:, None])
            t_i = t_ref[pl.ds(i, 1), :][0, :]
            t_col = t_i[:, None]
            is_n = q_is_n | (t_col >= 4)
            s_row = jnp.where(is_n, s_n,
                              jnp.where(t_col == query, s_match, s_mis))
            hd = jnp.concatenate([Hb[:, None], H_tail[:, :-1]], axis=1)
            M = jnp.where(hd > 0, hd + s_row, 0)
            M = jnp.where(in_band, M, 0)
            gate = (i > 0).astype(I32)
            E = (jnp.maximum(jnp.maximum(M_prev - oe_del, E_prev - e_del),
                             0) * gate + E_prev * (1 - gate))
            if no_cummax:
                F = M
            else:
                g = jnp.maximum(M - oe_ins, 0) + jb * e_ins
                F = jnp.maximum(_cummax_excl(g) - (jb - 1) * e_ins, 0)
                beg = jnp.maximum(i - w, 0)[:, None]
                F = jnp.where(jb > beg, F, 0)
            H = jnp.maximum(jnp.maximum(M, E), F)
            H = jnp.where(in_band, H, 0)
            if no_m:
                m = jnp.sum(H[:, :8], axis=1)  # cheap stand-in
            else:
                m = jnp.max(H, axis=1)
            if no_mj:
                mj = m
            else:
                mj = jnp.max(
                    jnp.where(in_band & (H == m[:, None]), jb, -1), axis=1)
            boundary = jnp.where(
                i <= w, jnp.maximum(h0 - o_del - e_del * (i + 1), 0), 0)
            if no_hlast:
                gscore2, max_ie2 = gscore, max_ie
            else:
                reach_end = act & (i + w + 1 >= qlen)
                h_last = jnp.sum(
                    jnp.where(jb == qlen[:, None] - 1, H, 0), axis=1)
                h_last = jnp.where(qlen > 0, h_last, boundary)
                g_upd = reach_end & (h_last >= gscore)
                gscore2 = jnp.where(g_upd, h_last, gscore)
                max_ie2 = jnp.where(g_upd, i, max_ie)
            zero_break = act & (m == 0)
            live = act & ~zero_break
            better = live & (m > best)
            best_n = jnp.where(better, m, best)
            best_i_n = jnp.where(better, i, best_i)
            best_j_n = jnp.where(better, mj, best_j)
            max_off_n = jnp.where(
                better, jnp.maximum(max_off, jnp.abs(mj - i)), max_off)
            if not no_zdrop and zdrop > 0:
                di = i - best_i
                dj = mj - best_j
                del_path = di > dj
                zcond = ((del_path & (best - m - (di - dj) * e_del > zdrop))
                         | (~del_path
                            & (best - m - (dj - di) * e_ins > zdrop)))
                z_break = live & ~better & zcond
            else:
                z_break = jnp.zeros_like(zero_break)
            alive_n = alive & ~zero_break & ~z_break & ((i + 1) < tlen)
            keep = act & ~zero_break & ~z_break
            H_ref[:, :] = H
            E_ref[:, :] = E
            M_ref[:, :] = M
            return (i + 1, jnp.where(keep, boundary, Hb), best_n,
                    best_i_n, best_j_n, max_ie2, gscore2, max_off_n,
                    alive_n.astype(I32))

        st = jax.lax.while_loop(cond, body, st)
        (_, _, best, best_i, best_j, max_ie, gscore, max_off, _) = st
        zeros = jnp.zeros((B,), I32)
        cols = [best, best_j + 1, best_i + 1, max_ie + 1, gscore, max_off]
        out_ref[:, :] = jnp.stack(cols + [zeros, zeros], axis=1)
    return _kernel


def run_variant(name, B=4096, Q=192, T=256, **flags):
    kern = make_kernel(**flags)
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, (B, Q)).astype(np.int32)
    t = np.zeros((B, T), np.int32)
    t[:, :min(Q, T)] = q[:, :min(Q, T)]
    tb = TILE_B
    grid = (B // tb,)
    lane = lambda: pl.BlockSpec((tb, 1), lambda i: (i, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, Q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, tb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            lane(), lane(), lane(), lane(),
        ],
        out_specs=pl.BlockSpec((tb, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8), I32),
        scratch_shapes=[pltpu.VMEM((tb, Q), I32)] * 3,
    )
    sc = jnp.asarray(np.array([[1, -4, -1]], np.int32))
    args = (sc, jnp.asarray(q), jnp.asarray(t.T).astype(I32),
            jnp.asarray(np.full((B, 1), Q, np.int32)),
            jnp.asarray(np.full((B, 1), T, np.int32)),
            jnp.asarray(np.full((B, 1), 100, np.int32)),
            jnp.asarray(np.full((B, 1), 1, np.int32)))

    # honest timing on the tunneled backend (see bench.py bench_kernel):
    # REP kernels inside one program with a data-dependent carry (h0 varies
    # per rep so nothing CSEs or content-caches), wall forced by d2h
    # readback, d2h fixed cost probed and subtracted.
    REP = 8

    @jax.jit
    def many(sc, q, tT, qlen, tlen, w, h0):
        def body(c, _):
            out = f(sc, q, tT, qlen, tlen, w, h0 + (c & 7))
            return c + out[0, 0], out[0, 0]
        _, s = jax.lax.scan(body, jnp.zeros((), I32), None, length=REP)
        return s

    _ = np.asarray(many(*args))
    dt = 1e9
    for k in range(3):
        a2 = list(args)
        a2[6] = args[6] + (k + 1)
        t0 = time.monotonic()
        _ = np.asarray(many(*a2))
        dt = min(dt, time.monotonic() - t0)
    probe = jnp.arange(REP, dtype=I32) + args[6][0]
    _ = np.asarray(probe)
    ovh = 1e9
    for k in range(3):
        t0 = time.monotonic()
        _ = np.asarray(probe + (k + 1))
        ovh = min(ovh, time.monotonic() - t0)
    best = max(dt - min(ovh, 0.5 * dt), 1e-9) / REP
    rows = (B // tb) * T
    print(f"{name:16s} {best*1e3:7.1f} ms  {best*1e6/rows:6.2f} us/tile-row"
          f"  {B*T*Q/best/1e9:6.1f} Gcells/s(hw)",
          flush=True)
    return best


base = run_variant("full")
run_variant("no_cummax", no_cummax=True)
run_variant("no_mj", no_mj=True)
run_variant("no_m+mj", no_m=True, no_mj=True)
run_variant("no_hlast", no_hlast=True)
run_variant("no_zdrop", no_zdrop=True)
run_variant("no_all_red", no_cummax=True, no_mj=True, no_m=True,
            no_hlast=True, no_zdrop=True)
