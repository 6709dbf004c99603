"""Lazy build + load of the native host library (libtpubwa.so).

All C++ sources in this directory compile into one shared library, loaded
via ctypes.  Reference analog: the bwa-mem2 Makefile's native build
(SURVEY.md §2.1 "Build system"); here the native pieces are the host-side
runtime helpers (SA-IS index construction, seed chaining, SAM assembly)
around the JAX/Pallas device compute path.
"""
from __future__ import annotations

import ctypes
import glob
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_DIR, "libtpubwa.so")
_lib = None
_lib_failed = False


def _sources() -> list[str]:
    return sorted(glob.glob(os.path.join(_DIR, "*.cpp")))


def load_native():
    """Build (if stale) and load libtpubwa.so; returns None on failure so
    callers can fall back to their NumPy paths."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        srcs = _sources()
        stale = not os.path.exists(_SO_PATH) or any(
            os.path.getmtime(_SO_PATH) < os.path.getmtime(s) for s in srcs)
        if stale:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _SO_PATH] + srcs,
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO_PATH)
        _declare(lib)
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def _declare(lib) -> None:
    c = ctypes
    u8p = c.POINTER(c.c_uint8)
    i32p = c.POINTER(c.c_int32)
    i64p = c.POINTER(c.c_int64)

    lib.sais_u8.restype = c.c_int
    lib.sais_u8.argtypes = [u8p, i64p, c.c_int64, c.c_int64]

    lib.bwt_from_sa.restype = c.c_int
    lib.bwt_from_sa.argtypes = [u8p, i64p, c.c_int64, u8p, i64p]

    lib.chain_filter_batch.restype = c.c_int
    lib.chain_filter_batch.argtypes = [
        i64p, c.c_int64,          # seed_rows, n_seeds
        i64p, c.c_int64,          # read_bounds, n_reads
        u8p,                      # skip_read
        i64p, c.c_int64, c.c_int64,   # contig_offsets, n_contigs, l_pac
        c.c_int32, c.c_int32, c.c_int32, c.c_int64,  # w, gap, minw, maxext
        c.c_double, c.c_double, c.c_int32,  # mask_level, drop_ratio, minseed
        i32p, i32p, i32p, i64p, i64p, c.c_int64,  # outputs + cap
        i64p,                     # out_counts
    ]

    f64p = c.POINTER(c.c_double)
    lib.ext_prepare.restype = c.c_void_p
    lib.ext_prepare.argtypes = [
        i64p, c.c_int64,          # seed_rows, n_seeds
        i64p, c.c_int64,          # read_bounds, n_reads
        u8p,                      # skip_read
        i64p, c.c_int64, c.c_int64,   # contig_offsets, n_contigs, l_pac
        i32p, i32p,               # lens, l_rep
        c.c_int32, c.c_int32, c.c_int32, c.c_int64,  # w, gap, minw, maxext
        c.c_double, c.c_double, c.c_int32,  # mask_level, drop_ratio, minseed
        c.c_int32, c.c_int32, c.c_int32, c.c_int32, c.c_int32,  # a, gaps
        c.c_int32, c.c_int32,     # pen_clip5, pen_clip3
        i32p, i32p, i32p, i64p, i64p, i64p, i32p,  # job outputs
        c.c_int64, i64p,          # cap, out_counts
    ]
    lib.ext_finalize.restype = c.c_int
    lib.ext_finalize.argtypes = [
        c.c_void_p, i32p,         # handle, results [n_jobs, 14]
        i64p, i64p,               # reg_rb, reg_re
        i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p,  # int32 reg fields
        f64p,                     # reg_frac_rep
        i64p, c.c_int64, i64p,    # reg_bounds, cap, out_counts
    ]
    lib.ext_free.restype = None
    lib.ext_free.argtypes = [c.c_void_p]

    lib.ext_phase1.restype = c.c_int64
    lib.ext_phase1.argtypes = [c.c_void_p, i64p]

    lib.ext_missing.restype = c.c_int64
    lib.ext_missing.argtypes = [c.c_void_p, i32p, u8p, i64p, c.c_int64]

    i8p = c.POINTER(c.c_int8)
    lib.sam_emit_se.restype = c.c_int64
    lib.sam_emit_se.argtypes = [
        c.c_int64,                      # B
        u8p, i64p,                      # other, other_off
        u8p, i64p, u8p, i64p, u8p, i64p,  # name/seq/qual bufs+offs
        u8p, i64p,                      # cname buf+off
        c.c_int64,                      # NL lanes
        u8p, i32p, i64p,                # rev, rid, pos1
        i32p, i32p,                     # clip5, clip3
        i32p, i32p, c.c_int64,          # cig_ns, cig_pack, ga_k
        i32p, i32p,                     # lead_d, trail_d
        i32p, u8p, u8p, c.c_int64,      # nm_in, mm_pos, mm_let, mm_k
        i32p, i32p,                     # lq, rlen
        i32p, i8p, i8p, c.c_int64, c.c_int64,  # win_row, qwin, twin, dims
        c.c_int64,                      # NR records
        i32p, i32p,                     # rec_b, rec_lane
        i32p, i32p, i32p, i32p,         # flag, mapq, score, xs
        i32p, i64p, i64p,               # rnext_rid, pnext, tlen
        i32p, i32p,                     # alt_lo, alt_hi
        u8p, c.c_int64,                 # out, out_cap
    ]
