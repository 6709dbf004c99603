"""Profile one PE chr21 batch: where does the PAIR phase go?"""
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _ensure_fixture  # noqa: E402
from tpubwa.align.pair import align_pe_batch  # noqa: E402
from tpubwa.align.pipeline import Aligner  # noqa: E402
from tpubwa.cli import _enable_compile_cache  # noqa: E402
from tpubwa.config import MemOptions  # noqa: E402
from tpubwa.index.fmindex import FMIndex  # noqa: E402
from tpubwa.io.fastq import stream_batches  # noqa: E402

_enable_compile_cache()

ref_fa, fq1, fq2 = _ensure_fixture(46, 20000, True, style="chr21")
idx = FMIndex.load(ref_fa)
opt = MemOptions.preset("v5e-1")
al = Aligner(idx, opt)
b1 = next(stream_batches(fq1, opt.batch_reads, opt.max_read_len))
b2 = next(stream_batches(fq2, opt.batch_reads, opt.max_read_len))

# warm
align_pe_batch(al, b1, b2, 0)
t0 = time.monotonic()
align_pe_batch(al, b1, b2, 0)
print(f"warm batch: {time.monotonic()-t0:.2f}s", flush=True)

pr = cProfile.Profile()
pr.enable()
align_pe_batch(al, b1, b2, 0)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(35)
