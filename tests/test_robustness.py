"""Degenerate-input robustness: empty files, all-N contigs, short refs."""

import pytest

from mashmap_tpu.params import Parameters
from mashmap_tpu.api import map_files
from mashmap_tpu.index.builder import build_index
from tests.genomes import random_genome, write_fasta


def test_empty_reference_raises(tmp_path):
    ref = tmp_path / "empty.fa"
    ref.write_text("")
    params = Parameters(
        ref_sequences=[str(ref)], kmer_size=11, seg_length=500,
        sketch_size=16, out_file_name=str(tmp_path / "o.paf"))
    with pytest.raises(ValueError, match="No sequences indexed"):
        map_files(params)


def test_all_n_contig_indexes_empty(tmp_path):
    """A contig of Ns contributes no minmers but stays in metadata."""
    idx = build_index(
        [("nn", "N" * 2000), ("ok", random_genome(2000, seed=1))],
        kmer_size=11, window_size=500, sketch_size=16)
    assert idx.n_contigs == 2
    assert (idx.mi_seqid == 0).sum() == 0      # nothing from the N contig
    assert (idx.mi_seqid == 1).sum() > 0


def test_reference_shorter_than_window(tmp_path):
    """Contigs shorter than segLength are recorded but not indexed
    (addMinmers never fills a window, commonFunc.hpp:455)."""
    idx = build_index(
        [("tiny", random_genome(100, seed=2)),
         ("big", random_genome(3000, seed=3))],
        kmer_size=11, window_size=500, sketch_size=16)
    assert idx.n_contigs == 2
    assert (idx.mi_seqid == 0).sum() == 0


def test_query_all_n_maps_nothing(tmp_path):
    ref = tmp_path / "r.fa"
    qf = tmp_path / "q.fa"
    write_fasta(str(ref), [("r", random_genome(3000, seed=4))])
    write_fasta(str(qf), [("q", "N" * 1000)])
    params = Parameters(
        ref_sequences=[str(ref)], query_sequences=[str(qf)],
        kmer_size=11, seg_length=500, sketch_size=16,
        out_file_name=str(tmp_path / "o.paf"))
    map_files(params)
    assert open(tmp_path / "o.paf").read() == ""


def test_mixed_case_and_ambiguity_codes(tmp_path):
    """Lowercase and IUPAC codes sanitize like the reference
    (commonFunc.hpp:75-107: anything not ACGT becomes N)."""
    base = random_genome(4000, seed=5)
    messy = base[:1000].lower() + base[1000:2000] + \
        "RYKMSWBDHV" + base[2000:]
    ref = tmp_path / "r.fa"
    qf = tmp_path / "q.fa"
    write_fasta(str(ref), [("r", base)])
    write_fasta(str(qf), [("q", messy)])
    params = Parameters(
        ref_sequences=[str(ref)], query_sequences=[str(qf)],
        kmer_size=11, seg_length=500, sketch_size=16,
        percentage_identity=0.8,
        out_file_name=str(tmp_path / "o.paf"))
    map_files(params)
    lines = open(tmp_path / "o.paf").read().splitlines()
    assert lines, "messy-but-mostly-identical query must still map"
