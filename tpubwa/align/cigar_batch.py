"""Batched CIGAR generation executor.

Executes the global-alignment jobs yielded by the finalize generators
(finalize.gen_cigar_g) as bucketed fixed-shape device batches of
ops.global_align.global_align_batch, then runs the cheap O(T+Q) traceback
per job on host.  Reference analog: the SAM half of worker_sam ran bwa's
scalar ksw_global2 per alignment (SURVEY.md §3.1); here the DP fill is one
device call per (Q, T) size bucket per round.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from tpubwa.config import MemOptions
from tpubwa.ops.global_align import (global_align, global_align_cigar_batch,
                                     steps_to_cigar)


@dataclasses.dataclass
class GAJob:
    """One global-alignment request: full query vs full target, band w."""

    query: np.ndarray   # int codes, forward orientation of the DP
    target: np.ndarray
    w: int


# (Q_pad, T_pad) buckets, smallest fitting bucket wins; jobs beyond the
# largest bucket fall back to the scalar host path (rare: only patch jobs
# spanning unusually long windows).
BUCKETS = ((64, 128), (192, 256), (192, 512), (320, 1024))


class GABatchExecutor:
    """execute(jobs: list[GAJob]) -> list[(score, cigar)] via device batches."""

    def __init__(self, opt: MemOptions, put=None):
        self.opt = opt
        self.mat = opt.score_matrix()
        self._mat_j = None
        self._put = put
        self._mat_dev()  # eager: lazy init would race under -t workers

    def _mat_dev(self):
        import jax.numpy as jnp

        if self._mat_j is None:
            if self._put is not None:
                self._mat_j = self._put(self.mat, batch=False)
            else:
                self._mat_j = jnp.asarray(self.mat)
        return self._mat_j

    def __call__(self, jobs: list[GAJob]) -> list:
        import jax.numpy as jnp

        put = self._put or jnp.asarray
        opt = self.opt
        out: list = [None] * len(jobs)
        by_bucket: dict[tuple[int, int], list[int]] = {}
        for i, job in enumerate(jobs):
            ql, tl = len(job.query), len(job.target)
            for bq, bt in BUCKETS:
                if ql <= bq and tl <= bt:
                    by_bucket.setdefault((bq, bt), []).append(i)
                    break
            else:  # scalar fallback for oversized jobs
                out[i] = global_align(
                    np.asarray(job.query), np.asarray(job.target), self.mat,
                    opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, job.w)

        for (bq, bt), idxs in by_bucket.items():
            # pad the lane count to a power of two so each (B, Q, T) shape
            # compiles exactly once
            B = 64
            while B < len(idxs):
                B <<= 1
            q = np.zeros((B, bq), np.int32)
            t = np.zeros((B, bt), np.int32)
            qlen = np.zeros(B, np.int32)
            tlen = np.zeros(B, np.int32)
            w = np.zeros(B, np.int32)
            for r, i in enumerate(idxs):
                job = jobs[i]
                ql, tl = len(job.query), len(job.target)
                q[r, :ql] = job.query
                t[r, :tl] = job.target
                qlen[r] = ql
                tlen[r] = tl
                w[r] = job.w
            res = global_align_cigar_batch(
                put(q), put(qlen), put(t),
                put(tlen), self._mat_dev(), put(w),
                o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                e_ins=opt.e_ins)
            score = np.asarray(res.score)
            steps = np.asarray(res.steps)
            for r, i in enumerate(idxs):
                out[i] = (int(score[r]), steps_to_cigar(steps[r]))
        return out


class GAScalarExecutor:
    """Same interface, host numpy DP — the correctness reference."""

    def __init__(self, opt: MemOptions):
        self.opt = opt
        self.mat = opt.score_matrix()

    def __call__(self, jobs: list[GAJob]) -> list:
        opt = self.opt
        return [
            global_align(np.asarray(j.query), np.asarray(j.target),
                         self.mat, opt.o_del, opt.e_del, opt.o_ins,
                         opt.e_ins, j.w)
            for j in jobs
        ]
