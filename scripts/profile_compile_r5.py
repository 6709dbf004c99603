"""Round-5: time the cold compile of every seeding-stage program at the
production batch shape (B=8192, L=160) against a FRESH compile cache, to
find what exploded 12s -> 1098s in BENCH_r04 (VERDICT r4 weak #2)."""
import os
import sys
import tempfile
import time

cache = tempfile.mkdtemp(prefix="jc_prof_")
import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpubwa.index.fmindex import FMIndex
from tpubwa.ops.fm import DeviceIndex
from tpubwa.ops import smem_chain as sc
from tpubwa.ops.seeds import seed_rows

B = int(os.environ.get("B", "8192"))
L = 160

ref = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench", "ref_4600000.fa")
idx = FMIndex.load(ref)
di = DeviceIndex.from_host(idx)
rng = np.random.default_rng(0)
q = jax.device_put(rng.integers(0, 4, (B, L)).astype(np.int32))
lens = jax.device_put(np.full(B, 150, np.int32))

t0 = time.monotonic()
mems, src_tab, r1_start, r1_end, r1_s, total = sc._smem_r1_prep(
    di, q, lens, min_seed_len=19, split_len=28, split_width=10, out_cap=64)
jax.block_until_ready(mems.k)
print(f"[r1_prep] {time.monotonic()-t0:.1f}s", flush=True)

t0 = time.monotonic()
mems2 = sc._smem_r2_loop(di, q, lens, mems, src_tab, r1_start, r1_end,
                         r1_s, total, min_seed_len=19, r2_cap=32,
                         out_cap=64, G=2 * B)
jax.block_until_ready(mems2.k)
print(f"[r2_loop] {time.monotonic()-t0:.1f}s", flush=True)

t0 = time.monotonic()
sm = sc._smem_r3_sort(di, q, lens, mems2, min_seed_len=19,
                      max_mem_intv=20, out_cap=64)
jax.block_until_ready(sm.k)
print(f"[r3_sort] {time.monotonic()-t0:.1f}s", flush=True)

t0 = time.monotonic()
cs = seed_rows(di, sm, max_occ=500, per_read_cap=128)
jax.block_until_ready(cs.packed)
print(f"[seed_rows] {time.monotonic()-t0:.1f}s", flush=True)
print(f"[cache] {len(os.listdir(cache))} programs", flush=True)
