"""Host-side sequence I/O."""

from .fasta import for_each_seq_in_file, read_all_seqs  # noqa: F401
