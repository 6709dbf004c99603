"""wgsim-like read simulator (host) — test fixtures + benchmarks.

The reference learned the hard way that only error-injected reads exercise
the DP kernel (SURVEY.md §4.5 "test-data design pitfall"); this simulator
injects substitutions and indels and encodes ground truth in read names:

  sim_<serial>_<rid>_<pos0>_<strand>[_<mate>]   (pos0 = 0-based leftmost
  forward coordinate of the originating fragment/segment)
"""
from __future__ import annotations

import argparse

import numpy as np

from tpubwa.io.fasta import read_fasta
from tpubwa.utils.dna import decode, revcomp_codes


def simulate_reads(codes: np.ndarray, contigs, n: int, length: int = 150,
                   err: float = 0.01, indel: float = 0.0005,
                   seed: int = 7) -> list[tuple[str, str, str]]:
    """Single-end reads: returns [(name, seq, qual)]."""
    rng = np.random.default_rng(seed)
    out = []
    l_tot = codes.size
    offs = np.array([c.offset for c in contigs])
    for i in range(n):
        pos = int(rng.integers(0, l_tot - length))
        frag = codes[pos : pos + length].copy()
        strand = int(rng.integers(0, 2))
        rid = int(np.searchsorted(offs, pos, side="right") - 1)
        seq = _mutate(rng, frag, err, indel, length)
        if strand:
            seq = revcomp_codes(seq)
        name = f"sim_{i}_{rid}_{pos}_{strand}"
        out.append((name, decode(seq), "I" * len(seq)))
    return out


def simulate_pairs(codes: np.ndarray, contigs, n: int, length: int = 150,
                   isize_mean: int = 400, isize_std: int = 50,
                   err: float = 0.01, indel: float = 0.0005,
                   seed: int = 7):
    """Paired-end (FR orientation): returns ([(name,seq,qual)] r1, r2)."""
    rng = np.random.default_rng(seed)
    r1, r2 = [], []
    l_tot = codes.size
    offs = np.array([c.offset for c in contigs])
    for i in range(n):
        isize = max(int(rng.normal(isize_mean, isize_std)), length + 10)
        pos = int(rng.integers(0, max(l_tot - isize, 1)))
        rid = int(np.searchsorted(offs, pos, side="right") - 1)
        left = codes[pos : pos + length].copy()
        right = codes[pos + isize - length : pos + isize].copy()
        s1 = _mutate(rng, left, err, indel, length)
        s2 = revcomp_codes(_mutate(rng, right, err, indel, length))
        name = f"sim_{i}_{rid}_{pos}_{pos + isize - length}"
        r1.append((name, decode(s1), "I" * len(s1)))
        r2.append((name, decode(s2), "I" * len(s2)))
    return r1, r2


def _mutate(rng, frag: np.ndarray, err: float, indel: float,
            length: int) -> np.ndarray:
    seq = list(frag)
    # substitutions
    for j in range(len(seq)):
        if rng.random() < err:
            seq[j] = (seq[j] + 1 + int(rng.integers(0, 3))) % 4
    # indels
    j = 0
    while j < len(seq):
        r = rng.random()
        if r < indel / 2 and len(seq) > length // 2:
            del seq[j]
        elif r < indel:
            seq.insert(j, int(rng.integers(0, 4)))
            j += 2
        else:
            j += 1
    return np.array(seq[:length], dtype=np.uint8)


def write_fastq(path: str, reads) -> None:
    with open(path, "w") as f:
        for name, seq, qual in reads:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")


def main() -> None:
    ap = argparse.ArgumentParser(description="simulate reads from a FASTA")
    ap.add_argument("ref")
    ap.add_argument("out_fq")
    ap.add_argument("--out-fq2", default=None, help="write pairs")
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--len", type=int, default=150, dest="length")
    ap.add_argument("--err", type=float, default=0.01)
    ap.add_argument("--indel", type=float, default=0.0005)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    contigs, codes, _ = read_fasta(args.ref)
    if args.out_fq2:
        r1, r2 = simulate_pairs(codes, contigs, args.n, args.length,
                                err=args.err, indel=args.indel,
                                seed=args.seed)
        write_fastq(args.out_fq, r1)
        write_fastq(args.out_fq2, r2)
    else:
        reads = simulate_reads(codes, contigs, args.n, args.length,
                               err=args.err, indel=args.indel,
                               seed=args.seed)
        write_fastq(args.out_fq, reads)


if __name__ == "__main__":
    main()
