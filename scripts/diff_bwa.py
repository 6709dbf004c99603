#!/usr/bin/env python
"""Differential harness vs a real bwa-mem2 binary.

The north-star correctness gate is bitwise-matching primary SAM records
vs bwa-mem2 (BASELINE.md).  No binary ships in this environment, so this
script makes the claim one command away wherever one exists:

    TPUBWA_BWA_MEM2=/path/to/bwa-mem2 python scripts/diff_bwa.py \
        ref.fa reads_1.fq [reads_2.fq]

It runs BOTH aligners on the same inputs (building each side's index if
missing) and compares primary records in tiers, mirroring the reference
project's own field-subset methodology
(/root/reference/test_arm_optimizations.sh:199-214 compares QNAME/RNAME/
POS after samtools -F 4; MINIMAP2_BENCHMARK_RESULTS.md:96-109 uses sorted
cols 1-11):

  tier 1: QNAME / FLAG&0x9F1 / RNAME / POS     (placement identity)
  tier 2: + CIGAR                              (alignment identity)
  tier 3: + MAPQ                               (score-model identity)
  tier 4: + NM/MD/AS tags                      (annotation identity)

Exit code 0 iff tier 1 matches on every primary record.
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

FLAG_MASK = 0x9F1  # strand/pair/segment bits; ignores dup/QC-fail bits


def parse_sam(text: str):
    """{qname/segment: (flag, rname, pos, cigar, mapq, tags)} for primary
    records (drops secondary 0x100 / supplementary 0x800 / unmapped 4)."""
    out = {}
    for line in text.splitlines():
        if not line or line.startswith("@"):
            continue
        f = line.split("\t")
        flag = int(f[1])
        if flag & 0x904:
            continue
        seg = "/2" if flag & 0x80 else "/1"
        tags = {t.split(":", 1)[0]: t for t in f[11:]
                if t[:2] in ("NM", "MD", "AS")}
        out[f[0] + seg] = (flag & FLAG_MASK, f[2], int(f[3]), f[5],
                           int(f[4]), tuple(sorted(tags.values())))
    return out


def run_bwa(bwa: str, ref: str, fq1: str, fq2: str | None) -> str:
    if not os.path.exists(ref + ".bwt.2bit.64"):
        subprocess.run([bwa, "index", ref], check=True)
    cmd = [bwa, "mem", "-t", "4", ref, fq1] + ([fq2] if fq2 else [])
    return subprocess.run(cmd, check=True, capture_output=True,
                          text=True).stdout


def run_tpubwa(ref: str, fq1: str, fq2: str | None) -> str:
    import io

    from tpubwa.align.pipeline import align_fastq
    from tpubwa.index.fmindex import FMIndex

    if not FMIndex.exists(ref):
        FMIndex.from_fasta(ref).save(ref)
    out = io.StringIO()
    rc = align_fastq(ref, fq1, fq2, out)
    if rc != 0:
        raise RuntimeError("tpu-bwa mem failed")
    return out.getvalue()


def compare(a: dict, b: dict):
    keys = sorted(set(a) | set(b))
    tiers = {1: 0, 2: 0, 3: 0, 4: 0}
    missing = 0
    examples: list[str] = []
    for k in keys:
        if k not in a or k not in b:
            missing += 1
            if len(examples) < 5:
                examples.append(f"only-one-side: {k}")
            continue
        ra, rb = a[k], b[k]
        if ra[:3] == rb[:3]:
            tiers[1] += 1
        elif len(examples) < 5:
            examples.append(f"tier1 {k}: {ra[:3]} vs {rb[:3]}")
        if ra[:4] == rb[:4]:
            tiers[2] += 1
        if ra[:5] == rb[:5]:
            tiers[3] += 1
        if ra == rb:
            tiers[4] += 1
    n = len(keys)
    print(f"primary records: {len(a)} (bwa-mem2) vs {len(b)} (tpu-bwa); "
          f"{missing} on one side only")
    for t, label in ((1, "QNAME/FLAG/RNAME/POS"), (2, "+CIGAR"),
                     (3, "+MAPQ"), (4, "+NM/MD/AS")):
        print(f"  tier {t} ({label}): {tiers[t]}/{n} "
              f"({100.0 * tiers[t] / max(n, 1):.2f}%)")
    for e in examples:
        print("  " + e)
    return tiers[1] == n and missing == 0


def main() -> int:
    bwa = os.environ.get("TPUBWA_BWA_MEM2")
    if not bwa:
        print("set TPUBWA_BWA_MEM2=/path/to/bwa-mem2", file=sys.stderr)
        return 2
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    ref, fq1 = sys.argv[1], sys.argv[2]
    fq2 = sys.argv[3] if len(sys.argv) > 3 else None
    sam_a = run_bwa(bwa, ref, fq1, fq2)
    sam_b = run_tpubwa(ref, fq1, fq2)
    ok = compare(parse_sam(sam_a), parse_sam(sam_b))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
