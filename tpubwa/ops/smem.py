"""Batched SMEM seeding on device (JAX).

TPU-native re-expression of the reference's seeding engine (SURVEY.md §3.1:
worker_bwt → mem_collect_intv → bwt_smem1 → backward-search loop, [src]
FMI_search.cpp:599-760): instead of per-read scalar loops with software
prefetch, every read in a (B,)-batch advances in lockstep through masked
``lax.while_loop`` steps, and every interval extension in flight becomes one
row of a batched occ-checkpoint gather (ops.fm.occ4).  Irregular per-read
control flow (variable SMEM counts, early breaks) is handled with validity
masks over fixed-shape buffers — SURVEY.md §7 "irregular control flow on a
SIMD machine".

Semantics are defined by the scalar reference (tpubwa.ops.fm_ref); tests
assert exact equality.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpubwa.ops.fm import BiInterval, DeviceIndex, backward_ext_all, set_intv

I32 = jnp.int32
BIG = jnp.int32(1 << 30)


class Smems(NamedTuple):
    """Fixed-shape SMEM buffers: [B, M] int32 each + count/overflow [B]."""

    k: jax.Array
    l: jax.Array
    s: jax.Array
    start: jax.Array
    end: jax.Array
    n: jax.Array
    overflow: jax.Array


def _take_q(q: jax.Array, i: jax.Array) -> jax.Array:
    """q: [B, L]; i: [B] -> q[b, clip(i)] (out-of-range returns 4)."""
    L = q.shape[1]
    qi = jnp.take_along_axis(q, jnp.clip(i, 0, L - 1)[:, None], axis=1)[:, 0]
    return jnp.where((i >= 0) & (i < L), qi, 4)


def _pick_base(arr4: jax.Array, c: jax.Array) -> jax.Array:
    """arr4: [..., 4]; c: [...] -> arr4[..., c]."""
    return jnp.take_along_axis(arr4, jnp.clip(c, 0, 3)[..., None],
                               axis=-1)[..., 0]


def _append(arrs, n, vals, mask, cap):
    """Write vals at per-row slot n where mask; bump n.  Returns
    (new_arrs, new_n, dropped_mask)."""
    rows = jnp.arange(n.shape[0])
    ok = mask & (n < cap)
    slot = jnp.minimum(n, cap - 1)
    out = []
    for a, v in zip(arrs, vals):
        cur = a[rows, slot]
        out.append(a.at[rows, slot].set(jnp.where(ok, v, cur)))
    return tuple(out), n + ok.astype(I32), mask & (n >= cap)


def smem1_batch(di: DeviceIndex, q: jax.Array, lens: jax.Array,
                x: jax.Array, min_intv: jax.Array, active: jax.Array,
                cap: int):
    """All SMEMs through position x[b], batched over reads.

    Returns (ret_x [B], Smems with buffers [B, cap]).  Inactive lanes return
    ret_x = x+1 and no mems.  Mirrors fm_ref.smem1 exactly (max_intv == 0).
    """
    B, L = q.shape
    rows = jnp.arange(B)
    qx = _take_q(q, x)
    valid = active & (x < lens) & (qx < 4)
    min_intv = jnp.maximum(min_intv, 1)

    ik0 = set_intv(di, jnp.where(valid, qx, 0))
    zero_buf = jnp.zeros((B, cap), dtype=I32)

    # ---------------- forward phase ----------------
    st = dict(
        i=x + 1,
        ik_k=ik0.k, ik_l=ik0.l, ik_s=ik0.s, ik_end=x + 1,
        ck=zero_buf, cl=zero_buf, cs=zero_buf, cend=zero_buf,
        cn=jnp.zeros(B, dtype=I32),
        ret=x + 1,
        running=valid,
        ovf=jnp.zeros(B, dtype=bool),
    )

    def fwd_cond(st):
        return jnp.any(st["running"])

    def fwd_body(st):
        i, run = st["i"], st["running"]
        qi = _take_q(q, i)
        at_end = i >= lens
        amb = (~at_end) & (qi > 3)
        ext_mask = run & ~at_end & ~amb
        c = 3 - jnp.clip(qi, 0, 3)
        ik = BiInterval(st["ik_k"], st["ik_l"], st["ik_s"])
        ext = backward_ext_all(di, ik, is_back=False)
        ok_k = _pick_base(ext.k, c)
        ok_l = _pick_base(ext.l, c)
        ok_s = _pick_base(ext.s, c)
        changed = ok_s != st["ik_s"]

        push = run & (at_end | amb | (ext_mask & changed))
        stop = run & (at_end | amb | (ext_mask & changed
                                      & (ok_s < min_intv)))
        adv = run & ~stop

        (ck, cl, cs, cend), cn, dropped = _append(
            (st["ck"], st["cl"], st["cs"], st["cend"]), st["cn"],
            (st["ik_k"], st["ik_l"], st["ik_s"], st["ik_end"]), push, cap)
        ret = jnp.where(push, st["ik_end"], st["ret"])

        take_ok = adv & ext_mask
        return dict(
            i=jnp.where(adv, i + 1, i),
            ik_k=jnp.where(take_ok, ok_k, st["ik_k"]),
            ik_l=jnp.where(take_ok, ok_l, st["ik_l"]),
            ik_s=jnp.where(take_ok, ok_s, st["ik_s"]),
            ik_end=jnp.where(take_ok, i + 1, st["ik_end"]),
            ck=ck, cl=cl, cs=cs, cend=cend, cn=cn,
            ret=ret,
            running=adv,
            ovf=st["ovf"] | dropped,
        )

    st = jax.lax.while_loop(fwd_cond, fwd_body, st)

    # reverse curr -> prev (longest match / smallest interval first)
    cn = st["cn"]
    rev_idx = jnp.clip(cn[:, None] - 1 - jnp.arange(cap)[None, :], 0, cap - 1)
    pk = jnp.take_along_axis(st["ck"], rev_idx, axis=1)
    pl = jnp.take_along_axis(st["cl"], rev_idx, axis=1)
    ps = jnp.take_along_axis(st["cs"], rev_idx, axis=1)
    pend = jnp.take_along_axis(st["cend"], rev_idx, axis=1)
    ret_x = jnp.where(valid, st["ret"], x + 1)
    fwd_ovf = st["ovf"]

    # ---------------- backward phase ----------------
    bst = dict(
        i=x - 1,
        pk=pk, pl=pl, ps=ps, pend=pend, pn=cn,
        mk=zero_buf, ml=zero_buf, ms=zero_buf,
        mstart=zero_buf, mend=zero_buf,
        mn=jnp.zeros(B, dtype=I32),
        last_start=jnp.full((B,), BIG),
        running=valid & (cn > 0),
        ovf=jnp.zeros(B, dtype=bool),
    )

    def bwd_cond(bst):
        return jnp.any(bst["running"])

    def bwd_body(bst):
        i, run = bst["i"], bst["running"]
        qi = _take_q(q, i)
        c = jnp.where((i < 0) | (qi > 3), -1, qi)
        # batched extension of every live prev interval (one occ gather
        # per (read, slot) lane)
        prev_iv = BiInterval(bst["pk"], bst["pl"], bst["ps"])
        ext = backward_ext_all(di, prev_iv, is_back=True)   # [B, cap, 4]
        okc_k = _pick_base(ext.k, jnp.broadcast_to(c[:, None], (B, cap)))
        okc_l = _pick_base(ext.l, jnp.broadcast_to(c[:, None], (B, cap)))
        okc_s = _pick_base(ext.s, jnp.broadcast_to(c[:, None], (B, cap)))

        # sequential (cheap) scan over prev slots
        def scan_j(carry, j):
            (nk, nl, ns, nend, nn, mk, ml, ms, mstart, mend, mn,
             last_start, last_push_s, ovf) = carry
            aj = run & (j < bst["pn"])
            p_k = bst["pk"][:, j]
            p_l = bst["pl"][:, j]
            p_s = bst["ps"][:, j]
            p_end = bst["pend"][:, j]
            o_s = okc_s[:, j]
            keep = aj & ((c < 0) | (o_s < min_intv))
            emit = keep & (nn == 0) & ((mn == 0) | (i + 1 < last_start))
            (mk, ml, ms, mstart, mend), mn, dropped = _append(
                (mk, ml, ms, mstart, mend), mn,
                (p_k, p_l, p_s, i + 1, p_end), emit, cap)
            last_start = jnp.where(emit, i + 1, last_start)
            push = aj & ~keep & ((nn == 0) | (o_s != last_push_s))
            (nk, nl, ns, nend), nn, dropped2 = _append(
                (nk, nl, ns, nend), nn,
                (okc_k[:, j], okc_l[:, j], o_s, p_end), push, cap)
            last_push_s = jnp.where(push, o_s, last_push_s)
            return (nk, nl, ns, nend, nn, mk, ml, ms, mstart, mend, mn,
                    last_start, last_push_s, ovf | dropped | dropped2), None

        init = (zero_buf, zero_buf, zero_buf, zero_buf,
                jnp.zeros(B, dtype=I32),
                bst["mk"], bst["ml"], bst["ms"], bst["mstart"], bst["mend"],
                bst["mn"], bst["last_start"], jnp.full((B,), -1, dtype=I32),
                bst["ovf"])
        (nk, nl, ns, nend, nn, mk, ml, ms, mstart, mend, mn, last_start,
         _, ovf), _ = jax.lax.scan(scan_j, init, jnp.arange(cap))

        cont = run & (nn > 0)
        return dict(
            i=jnp.where(cont, i - 1, i),
            pk=jnp.where(cont[:, None], nk, bst["pk"]),
            pl=jnp.where(cont[:, None], nl, bst["pl"]),
            ps=jnp.where(cont[:, None], ns, bst["ps"]),
            pend=jnp.where(cont[:, None], nend, bst["pend"]),
            pn=jnp.where(cont, nn, bst["pn"]),
            mk=mk, ml=ml, ms=ms, mstart=mstart, mend=mend, mn=mn,
            last_start=last_start,
            running=cont,
            ovf=ovf,
        )

    bst = jax.lax.while_loop(bwd_cond, bwd_body, bst)

    # reverse mems (ascending start)
    mn = bst["mn"]
    rev_idx = jnp.clip(mn[:, None] - 1 - jnp.arange(cap)[None, :], 0, cap - 1)
    out = Smems(
        k=jnp.take_along_axis(bst["mk"], rev_idx, axis=1),
        l=jnp.take_along_axis(bst["ml"], rev_idx, axis=1),
        s=jnp.take_along_axis(bst["ms"], rev_idx, axis=1),
        start=jnp.take_along_axis(bst["mstart"], rev_idx, axis=1),
        end=jnp.take_along_axis(bst["mend"], rev_idx, axis=1),
        n=mn,
        overflow=fwd_ovf | bst["ovf"],
    )
    return ret_x, out


def seed_strategy1_batch(di: DeviceIndex, q: jax.Array, lens: jax.Array,
                         x: jax.Array, min_len: int, max_intv: int,
                         active: jax.Array):
    """3rd-round forward-only seeding (fm_ref.seed_strategy1), batched.

    Returns (ret_x [B], found_mask [B], (k, l, s, start, end) each [B]).
    """
    B, _ = q.shape
    qx = _take_q(q, x)
    valid = active & (x < lens) & (qx < 4)
    ik0 = set_intv(di, jnp.where(valid, qx, 0))
    zero = jnp.zeros(B, dtype=I32)

    st = dict(
        i=x + 1,
        ik_k=ik0.k, ik_l=ik0.l, ik_s=ik0.s,
        ret=x + 1,
        f_mask=jnp.zeros(B, dtype=bool),
        f_k=zero, f_l=zero, f_s=zero, f_end=zero,
        running=valid,
    )

    def cond(st):
        return jnp.any(st["running"])

    def body(st):
        i, run = st["i"], st["running"]
        qi = _take_q(q, i)
        at_end = i >= lens
        amb = (~at_end) & (qi > 3)
        c = 3 - jnp.clip(qi, 0, 3)
        ext = backward_ext_all(
            di, BiInterval(st["ik_k"], st["ik_l"], st["ik_s"]),
            is_back=False)
        ok_k = _pick_base(ext.k, c)
        ok_l = _pick_base(ext.l, c)
        ok_s = _pick_base(ext.s, c)

        hit = run & ~at_end & ~amb & (ok_s < max_intv) & (i - x >= min_len)
        found = hit & (ok_s > 0)
        stop = run & (at_end | amb | hit)
        adv = run & ~stop

        return dict(
            i=jnp.where(adv, i + 1, i),
            ik_k=jnp.where(adv, ok_k, st["ik_k"]),
            ik_l=jnp.where(adv, ok_l, st["ik_l"]),
            ik_s=jnp.where(adv, ok_s, st["ik_s"]),
            ret=jnp.where(stop, jnp.where(at_end, lens, i + 1), st["ret"]),
            f_mask=st["f_mask"] | found,
            f_k=jnp.where(found, ok_k, st["f_k"]),
            f_l=jnp.where(found, ok_l, st["f_l"]),
            f_s=jnp.where(found, ok_s, st["f_s"]),
            f_end=jnp.where(found, i + 1, st["f_end"]),
            running=adv,
        )

    st = jax.lax.while_loop(cond, body, st)
    ret_x = jnp.where(valid, st["ret"], x + 1)
    return ret_x, st["f_mask"], (st["f_k"], st["f_l"], st["f_s"], x,
                                 st["f_end"])


@functools.partial(jax.jit, static_argnames=(
    "min_seed_len", "split_len", "split_width", "max_mem_intv", "cap",
    "out_cap"))
def collect_smems_batch(di: DeviceIndex, q: jax.Array, lens: jax.Array,
                        min_seed_len: int = 19, split_len: int = 28,
                        split_width: int = 10, max_mem_intv: int = 20,
                        cap: int = 48, out_cap: int = 64) -> Smems:
    """Full 3-round SMEM collection (fm_ref.collect_smems), batched over a
    fixed-shape read batch.  Output sorted by (start, end) per read."""
    B, L = q.shape
    q = q.astype(I32)
    lens = lens.astype(I32)
    zero_out = jnp.zeros((B, out_cap), dtype=I32)

    mems = Smems(k=zero_out, l=zero_out, s=zero_out, start=zero_out,
                 end=zero_out, n=jnp.zeros(B, dtype=I32),
                 overflow=jnp.zeros(B, dtype=bool))

    def append_filtered(mems: Smems, sub: Smems) -> Smems:
        def body(j, mems):
            slen = sub.end[:, j] - sub.start[:, j]
            mask = (j < sub.n) & (slen >= min_seed_len)
            (mk, ml, ms, mstart, mend), mn, dropped = _append(
                (mems.k, mems.l, mems.s, mems.start, mems.end), mems.n,
                (sub.k[:, j], sub.l[:, j], sub.s[:, j], sub.start[:, j],
                 sub.end[:, j]), mask, out_cap)
            return Smems(mk, ml, ms, mstart, mend, mn,
                         mems.overflow | dropped | sub.overflow)
        return jax.lax.fori_loop(0, cap, body, mems)

    # ---- round 1: all SMEMs ----
    def r1_cond(state):
        x, mems = state
        return jnp.any(x < lens)

    def r1_body(state):
        x, mems = state
        active = x < lens
        ret_x, sub = smem1_batch(di, q, lens, x, jnp.ones(B, dtype=I32),
                                 active, cap)
        mems = append_filtered(mems, sub)
        return jnp.where(active, ret_x, x), mems

    x0 = jnp.zeros(B, dtype=I32)
    _, mems = jax.lax.while_loop(r1_cond, r1_body, (x0, mems))

    # ---- round 2: re-seed long low-occ SMEMs from the middle ----
    old_n = mems.n
    is_cand = (jnp.arange(out_cap)[None, :] < old_n[:, None]) \
        & ((mems.end - mems.start) >= split_len) \
        & (mems.s <= split_width)
    # dense[b, t] = slot index of the t-th candidate (ascending slot order)
    dense = jnp.argsort(
        jnp.where(is_cand, jnp.arange(out_cap, dtype=I32), BIG), axis=1,
        stable=True).astype(I32)
    cand_n = jnp.sum(is_cand.astype(I32), axis=1)

    def r2_cond(state):
        t, mems = state
        return t < jnp.max(cand_n)

    def r2_body(state):
        t, mems = state
        active = t < cand_n
        rows1 = jnp.arange(B)
        slot = dense[rows1, jnp.minimum(t, out_cap - 1)]
        p_start = mems.start[rows1, slot]
        p_end = mems.end[rows1, slot]
        p_s = mems.s[rows1, slot]
        mid = (p_start + p_end) >> 1
        ret_x, sub = smem1_batch(di, q, lens, mid, p_s + 1, active, cap)
        mems = append_filtered(mems, sub)
        return t + 1, mems

    _, mems = jax.lax.while_loop(
        r2_cond, r2_body, (jnp.zeros((), dtype=I32), mems))

    # ---- round 3: LAST-like forward-only seeding ----
    if max_mem_intv > 0:
        def r3_cond(state):
            x, mems = state
            return jnp.any(x < lens)

        def r3_body(state):
            x, mems = state
            active = x < lens
            ret_x, f_mask, (fk, fl, fs, fstart, fend) = seed_strategy1_batch(
                di, q, lens, x, min_seed_len, max_mem_intv, active)
            (mk, ml, ms, mstart, mend), mn, dropped = _append(
                (mems.k, mems.l, mems.s, mems.start, mems.end), mems.n,
                (fk, fl, fs, fstart, fend), f_mask & active, out_cap)
            mems = Smems(mk, ml, ms, mstart, mend, mn,
                         mems.overflow | dropped)
            return jnp.where(active, ret_x, x), mems

        _, mems = jax.lax.while_loop(r3_cond, r3_body, (x0, mems))

    # ---- sort by (start, end) ----
    in_use = jnp.arange(out_cap)[None, :] < mems.n[:, None]
    key = jnp.where(in_use, mems.start * (L + 2) + mems.end, BIG)
    order = jnp.argsort(key, axis=1, stable=True)
    return Smems(
        k=jnp.take_along_axis(mems.k, order, axis=1),
        l=jnp.take_along_axis(mems.l, order, axis=1),
        s=jnp.take_along_axis(mems.s, order, axis=1),
        start=jnp.take_along_axis(mems.start, order, axis=1),
        end=jnp.take_along_axis(mems.end, order, axis=1),
        n=mems.n,
        overflow=mems.overflow,
    )
