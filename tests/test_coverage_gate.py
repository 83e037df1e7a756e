"""The reference's CI acceptance gate, wired in.

Mirrors .github/workflows/build-and-test.yml:66-74 + scripts/test.sh:
all-vs-all pangenome self-mapping with --pi 95 -n 1 -Y '#' must reach
>= 0.92 merged mapped coverage on EVERY sequence (the yeast fixture is
a stripped blob in this image, so the workload is a synthetic
8-haplotype pangenome of the same shape: PanSN names, ~5kb-scale
divergence structure).
"""

import os
import sys

import pytest

HERE = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(os.path.dirname(HERE), "scripts"))

from check_coverage import coverage_by_sequence  # noqa: E402


@pytest.mark.slow
def test_pangenome_selfmap_coverage_gate(tmp_path):
    from genomes import pangenome, write_fasta
    from mashmap_tpu.params import Parameters
    from mashmap_tpu.api import map_files

    recs = pangenome(8, 150_000, divergence=0.04, seed=92)
    fa = str(tmp_path / "pan8.fa")
    write_fasta(fa, recs)
    out = str(tmp_path / "pan8.paf")
    map_files(Parameters(
        ref_sequences=[fa],
        out_file_name=out,
        percentage_identity=0.95,
        num_mappings_for_segment=1,
        skip_prefix=True, prefix_delim="#",
        no_progress=True,
    ))
    lengths = {name: len(seq) for name, seq in recs}
    with open(out) as fh:
        cov = coverage_by_sequence(lengths, fh)
    low = {n: c for n, c in cov.items() if c < 0.92}
    assert not low, f"coverage gate (>=0.92) failed: {low}"
