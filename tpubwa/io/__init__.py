from tpubwa.io.fasta import read_fasta, Contig  # noqa: F401
from tpubwa.io.fastq import read_fastq, ReadBatch, batch_reads  # noqa: F401
from tpubwa.io.sam import sam_header, SamRecord  # noqa: F401
