import gzip

import numpy as np

from tpubwa.io.fasta import read_fasta
from tpubwa.io.fastq import batch_reads, read_fastq
from tpubwa.utils.dna import (
    decode, encode, pack_2bit, revcomp_codes, revcomp_str, unpack_2bit)


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn"
    codes = encode(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert decode(codes) == "ACGTNACGTN"


def test_revcomp():
    assert revcomp_str("ACGTN") == "NACGT"
    c = encode("AACGT")
    assert decode(revcomp_codes(c)) == "ACGTT"


def test_pack_unpack_roundtrip(rng):
    for n in [1, 15, 16, 17, 64, 100, 1000]:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(unpack_2bit(pack_2bit(codes), n), codes)


def test_fasta_parse(tmp_path):
    p = tmp_path / "r.fa"
    p.write_text(">chr1 desc\nACGT\nACNN\n>chr2\nGGGG\n")
    contigs, codes, holes = read_fasta(str(p))
    assert [c.name for c in contigs] == ["chr1", "chr2"]
    assert [c.length for c in contigs] == [8, 4]
    assert [c.offset for c in contigs] == [0, 8]
    assert codes.size == 12
    assert np.array_equal(holes, [[6, 8]])
    assert (codes < 4).all()  # Ns substituted
    assert decode(codes[:6]) == "ACGTAC"
    assert decode(codes[8:]) == "GGGG"


def test_fastq_parse_and_batch(tmp_path):
    p = tmp_path / "r.fq.gz"
    lines = []
    for i in range(5):
        lines += [f"@read{i} extra", "ACGTA", "+", "IIIII"]
    with gzip.open(p, "wt") as f:
        f.write("\n".join(lines) + "\n")
    reads = list(read_fastq(str(p)))
    assert len(reads) == 5
    assert reads[0].name == "read0"
    assert reads[0].comment == "extra"
    batches = list(batch_reads(reads, batch_size=4, max_len=8))
    assert len(batches) == 2
    b = batches[0]
    assert b.codes.shape == (4, 8)
    assert b.lens.tolist() == [5, 5, 5, 5]
    assert (b.codes[0, 5:] == 4).all()
    b2 = batches[1]
    assert b2.n == 1 and b2.codes.shape == (4, 8)
    assert b2.lens.tolist() == [5, 0, 0, 0]
