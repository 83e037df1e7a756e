"""Native C++ FASTA/FASTQ reader vs the pure-Python parser."""

import gzip
import os

import numpy as np
import pytest

from mashmap_tpu import native
from mashmap_tpu.io.fasta import for_each_seq_in_file
from mashmap_tpu.kernels.kmers import sanitize


def _python_read(path):
    """Force the pure-Python path (env gate) and sanitize for parity."""
    os.environ["MASHMAP_TPU_NO_NATIVE"] = "1"
    try:
        native._lib = None
        out = [(n, sanitize(s.encode()).tobytes().decode() if s else "")
               for n, s in for_each_seq_in_file(path)]
    finally:
        del os.environ["MASHMAP_TPU_NO_NATIVE"]
        native._lib = None
    return out


@pytest.fixture(scope="module")
def have_native():
    if not native.native_available():
        pytest.skip("no C++ toolchain for the native reader")


def test_fasta_parity(tmp_path, have_native):
    p = str(tmp_path / "t.fa")
    with open(p, "w") as fh:
        fh.write(">one desc here\nACGTacgtNNxy\nACGT\n"
                 ">two\n\n>three\nTTTT\n")
    nat = list(native.read_records(p))
    assert nat == [("one", "ACGTACGTNNNN" + "ACGT"),
                   ("two", ""), ("three", "TTTT")]
    assert _python_read(p) == nat


def test_fastq_and_gzip_parity(tmp_path, have_native):
    p = str(tmp_path / "t.fq.gz")
    body = ("@r1 extra\nACGTN\n+\n!!!!!\n"
            "@r2\nttgg\n+r2\n####\n")
    with gzip.open(p, "wt") as fh:
        fh.write(body)
    nat = list(native.read_records(p))
    assert nat == [("r1", "ACGTN"), ("r2", "TTGG")]
    assert _python_read(p) == nat


def test_multiline_quality_fastq(tmp_path, have_native):
    p = str(tmp_path / "m.fq")
    with open(p, "w") as fh:
        fh.write("@a\nACGTACGT\n+\n!!!!\n!!!!\n@b\nGG\n+\n!!\n")
    assert list(native.read_records(p)) == [("a", "ACGTACGT"), ("b", "GG")]


def test_mapping_pipeline_uses_native(tmp_path, have_native):
    """End-to-end sanity: map_files over the native reader."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from genomes import random_genome, write_fasta, mutate
    from mashmap_tpu.params import Parameters
    from mashmap_tpu.api import map_files
    base = random_genome(8000, seed=3)
    write_fasta(str(tmp_path / "r.fa"), [("r", base)])
    write_fasta(str(tmp_path / "q.fa"), [("q", mutate(base, 0.03, seed=4))])
    params = Parameters(
        ref_sequences=[str(tmp_path / "r.fa")],
        query_sequences=[str(tmp_path / "q.fa")],
        out_file_name=str(tmp_path / "o.paf"),
        kmer_size=11, seg_length=500, sketch_size=30,
        percentage_identity=0.8)
    map_files(params)
    assert os.path.getsize(tmp_path / "o.paf") > 0
