"""Topology auto-detection (reference analog: the runsimd_arm dispatcher's
probe + G4->G3->G2 fallback chain, /root/reference/PHASE1_IMPLEMENTATION.md
:85-131 — here: jax.devices() -> preset chain, walked on failure)."""
import io

import numpy as np

from tpubwa.config import MemOptions


def test_auto_chain_tiers():
    assert MemOptions.auto_chain("cpu", 8) == ["cpu-dev"]
    assert MemOptions.auto_chain("tpu", 1) == ["v5e-1"]
    assert MemOptions.auto_chain("tpu", 4) == ["v5e-4", "v5e-1"]
    assert MemOptions.auto_chain("tpu", 16) == [
        "v5e-16", "v5e-4", "v5e-1"]


def test_align_fastq_no_preset_auto(tmp_path):
    """`tpu-bwa mem` with no --preset picks a preset from the visible
    devices and completes (CPU platform here -> cpu-dev)."""
    from tpubwa.align.pipeline import align_fastq
    from tpubwa.index.fmindex import FMIndex
    from tpubwa.io.fasta import Contig
    from tpubwa.utils import sim
    from tpubwa.utils.dna import decode

    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, 8000).astype(np.uint8)
    ref = str(tmp_path / "ref.fa")
    with open(ref, "w") as f:
        f.write(">c1\n" + decode(codes) + "\n")
    FMIndex.build([Contig("c1", 8000, 0)], codes).save(ref)
    reads = sim.simulate_reads(codes, [Contig("c1", 8000, 0)], 8,
                               length=100, err=0.01, seed=4)
    fq = str(tmp_path / "r.fq")
    sim.write_fastq(fq, reads)
    out = io.StringIO()
    rc = align_fastq(ref, fq, None, out)
    assert rc == 0
    lines = [ln for ln in out.getvalue().splitlines()
             if not ln.startswith("@")]
    assert len(lines) == 8
