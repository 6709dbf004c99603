"""Device seed expansion: SMEMs -> (rbeg, qbeg, len) seed hits via batched
suffix-array gathers.

Reference analog: the SA-lookup loop in mem_chain ([src] bwamem.cpp, via
get_sa_entry — SURVEY.md §3.1 "SAL" phase) with bwa's occurrence sampling:
intervals with more than max_occ hits are subsampled with stride occ/max_occ.
A per-read seed cap (the reference's MAX_SEED_HITS idea, SURVEY.md §2.1
shouldKeepSeed) bounds the fixed output shape; overflow is reported.

Also computes l_rep (bases covered by repetitive SMEMs, occ > max_occ) for
the frac_rep MAPQ correction.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpubwa.ops.fm import DeviceIndex
from tpubwa.ops.smem import Smems

I32 = jnp.int32


class SeedBatch(NamedTuple):
    rbeg: jax.Array   # [B, S] int32 position in 2*l_pac space
    qbeg: jax.Array   # [B, S] int32
    len: jax.Array    # [B, S] int32
    valid: jax.Array  # [B, S] bool
    n: jax.Array      # [B] int32
    overflow: jax.Array  # [B] bool (seed cap hit)
    l_rep: jax.Array  # [B] int32 repetitive-coverage length


@functools.partial(jax.jit, static_argnames=("max_occ", "out_seeds"))
def smems_to_seeds(di: DeviceIndex, sm: Smems, *, max_occ: int = 500,
                   out_seeds: int = 128) -> SeedBatch:
    B, M = sm.k.shape
    S = out_seeds
    in_use = jnp.arange(M)[None, :] < sm.n[:, None]
    occ = jnp.where(in_use, sm.s, 0)
    step = jnp.where(occ > max_occ, occ // max_occ, 1)
    cnt = jnp.minimum(occ, max_occ)

    # prefix layout: seed slot t belongs to smem m with off[m] <= t < off[m+1]
    off_end = jnp.cumsum(cnt, axis=1)                       # inclusive
    off_beg = off_end - cnt
    total = jnp.minimum(off_end[:, -1], S)

    t = jnp.arange(S, dtype=I32)[None, :]                   # [1, S]
    # m_idx[b, t] = index of smem owning slot t
    m_idx = jnp.sum((off_end[:, :, None] <= t[:, None, :]).astype(I32),
                    axis=1)                                 # [B, S]
    m_idx = jnp.clip(m_idx, 0, M - 1)
    valid = t < total[:, None]

    rows = jnp.arange(B)[:, None]
    j = t - off_beg[rows, m_idx]
    sa_row = sm.k[rows, m_idx] + j * step[rows, m_idx]
    rbeg = di.sa[jnp.clip(sa_row, 0, di.sa.shape[0] - 1)]
    qbeg = sm.start[rows, m_idx]
    slen = sm.end[rows, m_idx] - qbeg

    # drop seeds that bridge the forward/reverse boundary (contig-boundary
    # filtering happens on host where contig offsets live)
    bridge = (rbeg < di.l_pac) & (rbeg + slen > di.l_pac)
    valid = valid & ~bridge

    # l_rep: union length of query intervals of repetitive smems
    rep = in_use & (sm.s > max_occ)
    def body(carry, m):
        b_cur, e_cur, l_rep = carry
        sb = sm.start[:, m]
        se = sm.end[:, m]
        is_rep = rep[:, m]
        new_seg = is_rep & (sb > e_cur)
        l_rep = jnp.where(new_seg, l_rep + (e_cur - b_cur), l_rep)
        b_cur = jnp.where(new_seg, sb, b_cur)
        e_cur = jnp.where(is_rep, jnp.maximum(e_cur, se), e_cur)
        return (b_cur, e_cur, l_rep), None

    (b_cur, e_cur, l_rep), _ = jax.lax.scan(
        body, (jnp.zeros(B, I32), jnp.zeros(B, I32), jnp.zeros(B, I32)),
        jnp.arange(M))
    l_rep = l_rep + (e_cur - b_cur)

    return SeedBatch(
        rbeg=jnp.where(valid, rbeg, 0),
        qbeg=jnp.where(valid, qbeg, 0),
        len=jnp.where(valid, slen, 0),
        valid=valid,
        n=jnp.sum(valid.astype(I32), axis=1),
        overflow=off_end[:, -1] > S,
        l_rep=l_rep,
    )


class CompactSeeds(NamedTuple):
    packed: jax.Array   # [CAP, 4] int32 rows (read_id, rbeg, qbeg, len),
    #                     in (read, slot) order; rows >= n are zero
    n: jax.Array        # [] int32 number of valid rows
    l_rep: jax.Array    # [B] int32


@jax.jit
def compact_seeds(sb: SeedBatch) -> CompactSeeds:
    """Flatten the padded [B, S] seed batch into a dense [n, 4] row block.

    Download-size optimization: padded seed tensors are ~95% padding (most
    reads have <10 seeds), and device->host bandwidth is the pipeline
    bottleneck on tunneled TPUs — the host only ever reads the valid rows,
    so scatter them to a dense prefix on device and ship just that.
    """
    import jax.numpy as jnp

    B, S = sb.rbeg.shape
    I32 = jnp.int32
    valid = sb.valid.reshape(-1)
    pos = jnp.cumsum(valid.astype(I32)) - 1
    dst = jnp.where(valid, pos, B * S)         # OOB rows -> dropped
    read_id = jnp.broadcast_to(
        jnp.arange(B, dtype=I32)[:, None], (B, S)).reshape(-1)
    rows = jnp.stack(
        [read_id, sb.rbeg.reshape(-1), sb.qbeg.reshape(-1),
         sb.len.reshape(-1)], axis=1)
    packed = jnp.zeros((B * S, 4), I32).at[dst].set(rows, mode="drop")
    return CompactSeeds(packed=packed, n=pos[-1] + 1, l_rep=sb.l_rep)
