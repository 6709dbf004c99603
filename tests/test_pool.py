"""run_ordered_pool error/ordering behavior.

ADVICE r2 (high): a raising work() used to deadlock the pool — the erroring
worker stopped consuming in_q, the reader blocked forever in a bounded put,
and join() never returned.  These tests run the pool on plain text work
(no device) and must complete quickly.
"""
import io

import pytest

from tpubwa.align.pipeline import run_ordered_pool


def test_worker_error_propagates_quickly():
    def items():
        for i in range(100):
            yield i, 1

    def work(payload):
        if payload == 3:
            raise RuntimeError("boom")
        return f"item{payload}\n"

    for workers in (1, 2, 4):
        with pytest.raises(RuntimeError, match="boom"):
            run_ordered_pool(items(), work, io.StringIO(), workers)


def test_reader_error_propagates():
    def items():
        yield 0, 1
        raise ValueError("reader boom")

    with pytest.raises(ValueError, match="reader boom"):
        run_ordered_pool(items(), work=lambda p: "x\n", out=io.StringIO(),
                         workers=2)


def test_ordered_output_many_workers():
    def items():
        for i in range(50):
            yield i, 1

    out = io.StringIO()
    n = run_ordered_pool(items(), lambda p: f"{p}\n", out, workers=16)
    assert n == 50
    assert out.getvalue() == "".join(f"{i}\n" for i in range(50))
