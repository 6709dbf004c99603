"""Banded global (Needleman-Wunsch, affine gap) alignment with traceback —
CIGAR generation for surviving alignments (host side).

Semantics of bwa's ksw_global2 (reference: [src] src/ksw.{h,cpp}, SURVEY.md
§2.1 "ksw"): gaps open from the match-path score M (no adjacent I/D), ties
prefer M over E(del) over F(ins), gap-extension continuation flags are set
on strict inequality, and the traceback state machine reads 2 bits per state
from the direction byte.  Rows are vectorized (the F recurrence is M-based,
so it is an exclusive running max along the row).

CIGAR op codes: 0=M 1=I 2=D 3=S 4=H (tpubwa.io.sam.CIGAR_OPS).
"""
from __future__ import annotations

import numpy as np

MINUS_INF = -0x40000000


def global_align(query: np.ndarray, target: np.ndarray, mat: np.ndarray,
                 o_del: int, e_del: int, o_ins: int, e_ins: int,
                 w: int) -> tuple[int, list[tuple[int, int]]]:
    """Global alignment of full query (codes) vs full target (codes).

    Returns (score, cigar) where cigar is [(op, len), ...] in
    query/target-forward order.  Callers must ensure w >= |qlen - tlen| (as
    bwa_gen_cigar2 does), else the band may not reach the corner.

    Direction byte per cell: bits0-1 = H source (0=M, 1=E/del, 2=F/ins),
    bits2-3 = 1 if E(i+1,j) extends E (else reopens from M), bits4-5 = 2 if
    F(i,j+1) extends F.
    """
    qlen, tlen = len(query), len(target)
    assert qlen > 0 and tlen > 0
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    H_prev = np.full(qlen + 1, MINUS_INF, dtype=np.int64)  # H_prev[j+1]=H(i-1,j)
    H_prev[0] = 0
    fill = min(qlen, w)
    H_prev[1 : fill + 1] = -(o_ins + e_ins * np.arange(1, fill + 1, dtype=np.int64))
    E = np.full(qlen, MINUS_INF, dtype=np.int64)
    M_prev = np.full(qlen, MINUS_INF, dtype=np.int64)

    z = np.zeros((tlen, qlen), dtype=np.uint8)
    mat = mat.astype(np.int64)

    for i in range(tlen):
        beg = max(0, i - w)
        end = min(qlen, i + w + 1)
        n = end - beg
        jrel = np.arange(n, dtype=np.int64)

        M = H_prev[beg:end] + mat[target[i], query[beg:end]]
        if i > 0:
            E = np.maximum(M_prev - oe_del, E - e_del)
        e = E[beg:end]

        # incoming F per column: f[0] = -inf; f[j] = max_{j'<j}(M[j']-oe_ins
        #                                               - (j-1-j')*e_ins)
        g = M - oe_ins + jrel * e_ins
        run = np.maximum.accumulate(g)
        f_in = np.full(n, MINUS_INF, dtype=np.int64)
        if n > 1:
            f_in[1:] = run[:-1] - (jrel[1:] - 1) * e_ins

        d = np.where(M >= e, 0, 1).astype(np.uint8)
        h = np.maximum(M, e)
        d = np.where(h >= f_in, d, 2).astype(np.uint8)
        h = np.maximum(h, f_in)

        # E(i+1, j): extend flag on strict >
        t = M - oe_del
        e2 = e - e_del
        d |= (e2 > t).astype(np.uint8) << 2
        E[beg:end] = np.maximum(e2, t)

        # F(i, j+1): extend flag on strict > (stored in this cell)
        t = M - oe_ins
        f2 = f_in - e_ins
        d |= (f2 > t).astype(np.uint8) << 5  # value 2 in bits 4-5
        z[i, beg:end] = d

        H_row = np.full(qlen + 1, MINUS_INF, dtype=np.int64)
        if beg == 0:
            H_row[0] = -(o_del + e_del * (i + 1))
        H_row[beg + 1 : end + 1] = h
        M_full = np.full(qlen, MINUS_INF, dtype=np.int64)
        M_full[beg:end] = M
        H_prev = H_row
        M_prev = M_full

    score = int(H_prev[qlen])

    cigar: list[tuple[int, int]] = []

    def push(op, ln):
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + ln)
        else:
            cigar.append((op, ln))

    i = tlen - 1
    k = min(i + w + 1, qlen) - 1
    which = 0
    while i >= 0 and k >= 0:
        which = (int(z[i, k]) >> (which << 1)) & 3
        if which == 0:
            push(0, 1)
            i -= 1
            k -= 1
        elif which == 1:
            push(2, 1)  # deletion: consumes target
            i -= 1
        else:
            push(1, 1)  # insertion: consumes query
            k -= 1
    if i >= 0:
        push(2, i + 1)
    if k >= 0:
        push(1, k + 1)
    cigar.reverse()
    return score, cigar


def cigar_nm_md(query: np.ndarray, target: np.ndarray,
                cigar: list[tuple[int, int]]) -> tuple[int, str]:
    """NM edit distance + MD tag from an M/I/D cigar over code sequences
    (query/target in the same orientation the cigar was computed in)."""
    from tpubwa.utils.dna import CODE_TO_CHAR

    qi = ti = 0
    nm = 0
    md = []
    match_run = 0
    for op, ln in cigar:
        if op == 0:  # M
            for _ in range(ln):
                if query[qi] == target[ti] and query[qi] < 4:
                    match_run += 1
                else:
                    md.append(str(match_run))
                    match_run = 0
                    md.append(chr(CODE_TO_CHAR[min(int(target[ti]), 4)]))
                    nm += 1
                qi += 1
                ti += 1
        elif op == 1:  # I
            qi += ln
            nm += ln
        elif op == 2:  # D
            md.append(str(match_run))
            match_run = 0
            md.append("^" + "".join(
                chr(CODE_TO_CHAR[min(int(c), 4)]) for c in target[ti:ti + ln]))
            nm += ln
            ti += ln
        elif op in (3, 4):  # clips: query only (not part of NM/MD)
            qi += ln if op == 3 else 0
    md.append(str(match_run))
    return nm, "".join(md)
