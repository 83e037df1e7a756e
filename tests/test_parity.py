"""Golden-output parity vs. the REFERENCE C++ mashmap binary.

Builds the reference from /root/reference (with local GSL shims, see
tests/oracle/) and diffs PAF outputs line by line on synthetic genomes.
This is the strongest available correctness check: both mappers see the
same FASTA and the same parameters.

Known, documented divergence sources (kept small by construction):
- reference winnowing emits rare spurious/split intervals its authors
  flag as bugs (commonFunc.hpp:522-528,560-568) — we compute exact
  bottom-s set semantics;
- merged-chain representative rows (PAF col 10) depend on the reference's
  unstable std::sort for chains > 16 rows.
The split-fragment path has NO known divergence: every split-path test
requires 100% exactly-matching rows. The windowed (--noSplit) path is
the one itemized exception (few-bp placement, bounded at 16bp below).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from mashmap_tpu.params import Parameters
from mashmap_tpu.api import map_files
from tests.genomes import pangenome, write_fasta, mutate, random_genome

ORACLE = "/tmp/mashmap_ref/mashmap"
HERE = os.path.dirname(__file__)


@pytest.fixture(scope="module")
def oracle_bin():
    r = subprocess.run([os.path.join(HERE, "oracle", "build_ref.sh")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"reference oracle build failed: {r.stderr}")
    return r.stdout.strip().splitlines()[-1]


def run_reference(oracle_bin, ref, query, out, extra):
    cmd = [oracle_bin, "-r", ref, "-o", out] + extra
    if query:
        cmd += ["-q", query]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out) as fh:
        return [line.rstrip("\n") for line in fh]


def run_ours(tmp_path, ref, query, **kw):
    params = Parameters(ref_sequences=[ref], **kw)
    if query:
        params.query_sequences = [query]
    params.out_file_name = str(tmp_path / "ours.paf")
    map_files(params)
    with open(params.out_file_name) as fh:
        return [line.rstrip("\n") for line in fh]


def paf_core(line):
    """Every PAF column except kc:f/jc:f tags: qname qlen qstart qend
    strand tname tlen tstart tend conserved blockLen mapq id-tag.
    Col 10 (conserved sketches of the merged-chain head) is included:
    the libstdc++ introsort replay (map/cxxsort.py) makes it exact."""
    f = line.split("\t")
    return (f[0], int(f[1]), int(f[2]), int(f[3]), f[4], f[5], int(f[6]),
            int(f[7]), int(f[8]), int(f[9]), int(f[10]), int(f[11]),
            f[12] if len(f) > 12 else "")


def compare(ref_lines, our_lines, min_exact=1.0):
    """Fraction of exactly matching core rows must be >= min_exact
    (default: EVERY row matches — the split-fragment path has no known
    divergence from the reference binary)."""
    a = set(map(paf_core, ref_lines))
    b = set(map(paf_core, our_lines))
    inter = len(a & b)
    denom = max(len(a), len(b), 1)
    frac = inter / denom
    if frac < min_exact:
        only_ref = sorted(a - b)[:8]
        only_ours = sorted(b - a)[:8]
        raise AssertionError(
            f"parity {frac:.3f} < {min_exact} "
            f"(ref {len(a)} rows, ours {len(b)} rows)\n"
            f"ref-only: {only_ref}\nours-only: {only_ours}")
    return frac


def test_parity_query_vs_ref(tmp_path, oracle_bin):
    base = random_genome(60_000, seed=21)
    q = mutate(base, 0.05, seed=22)
    ref = str(tmp_path / "ref.fa")
    qf = str(tmp_path / "q.fa")
    write_fasta(ref, [("chr1", base)])
    write_fasta(qf, [("q1", q)])
    ref_lines = run_reference(
        oracle_bin, ref, qf, str(tmp_path / "ref.paf"),
        ["-k", "15", "-s", "1000", "-J", "60", "--pi", "80"])
    our_lines = run_ours(
        tmp_path, ref, qf,
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80)
    assert len(ref_lines) > 0
    compare(ref_lines, our_lines)


def test_parity_selfmap_pangenome(tmp_path, oracle_bin):
    recs = pangenome(4, 30_000, divergence=0.05, seed=31)
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, recs)
    ref_lines = run_reference(
        oracle_bin, ref, None, str(tmp_path / "ref.paf"),
        ["-k", "15", "-s", "1000", "-J", "60", "--pi", "80",
         "-Y", "#", "-n", "1"])
    our_lines = run_ours(
        tmp_path, ref, None,
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80,
        skip_prefix=True, prefix_delim="#",
        num_mappings_for_segment=1)
    assert len(ref_lines) > 0
    compare(ref_lines, our_lines)


def test_parity_unmerged_multimapping(tmp_path, oracle_bin):
    """-M (no merge) exposes every per-fragment row; -n 2 secondaries."""
    base = random_genome(60_000, seed=21)
    q = mutate(base, 0.05, seed=22)
    ref = str(tmp_path / "ref.fa")
    qf = str(tmp_path / "q.fa")
    write_fasta(ref, [("chr1", base), ("chr2", mutate(base, 0.08, seed=55))])
    write_fasta(qf, [("q1", q)])
    ref_lines = run_reference(
        oracle_bin, ref, qf, str(tmp_path / "ref.paf"),
        ["-k", "15", "-s", "1000", "-J", "60", "--pi", "80", "-M",
         "-n", "2"])
    our_lines = run_ours(
        tmp_path, ref, qf,
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80, merge_mappings=False,
        num_mappings_for_segment=2)
    assert len(ref_lines) >= 50
    # full-line comparison (every column incl. jc:f:)
    a, b = set(ref_lines), set(our_lines)
    assert len(a & b) / max(len(a), len(b)) >= 1.0, (
        sorted(a - b)[:5], sorted(b - a)[:5])


def test_parity_tandem_repeats(tmp_path, oracle_bin):
    """Multi-mapping over tandem repeats (plateaus + secondary filter)."""
    from tests.genomes import random_genome as rg
    unit = rg(6000, seed=70)
    rep = rg(8000, seed=71) + unit * 4 + rg(8000, seed=72)
    ref = str(tmp_path / "ref.fa")
    qf = str(tmp_path / "q.fa")
    write_fasta(ref, [("chr1", rep)])
    write_fasta(qf, [("q1", mutate(rep, 0.04, seed=73))])
    ref_lines = run_reference(
        oracle_bin, ref, qf, str(tmp_path / "ref.paf"),
        ["-k", "15", "-s", "1000", "-J", "60", "--pi", "80", "-M",
         "-n", "3"])
    our_lines = run_ours(
        tmp_path, ref, qf,
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80, merge_mappings=False,
        num_mappings_for_segment=3)
    a, b = set(ref_lines), set(our_lines)
    assert len(a & b) / max(len(a), len(b)) >= 1.0, (
        sorted(a - b)[:5], sorted(b - a)[:5])


def test_parity_nosplit_windowed(tmp_path, oracle_bin):
    """--noSplit long query (windowLen > 0 L1/L2 path).

    The reference's windowed path has internal bookkeeping bugs we don't
    replicate (see map/l2.py docstring), so placement may differ by a few
    bp; identity and counts must match.
    """
    base = random_genome(60_000, seed=21)
    q = mutate(base, 0.05, seed=22)[:3500]
    ref = str(tmp_path / "ref.fa")
    qf = str(tmp_path / "q.fa")
    write_fasta(ref, [("chr1", base)])
    write_fasta(qf, [("q1", q)])
    ref_lines = run_reference(
        oracle_bin, ref, qf, str(tmp_path / "ref.paf"),
        ["-k", "15", "-s", "1000", "-J", "60", "--pi", "80", "--noSplit"])
    our_lines = run_ours(
        tmp_path, ref, qf,
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80, split=False)
    assert len(ref_lines) == len(our_lines)
    for rl, ol in zip(sorted(ref_lines), sorted(our_lines)):
        rf, of = rl.split("\t"), ol.split("\t")
        assert rf[0] == of[0] and rf[4] == of[4] and rf[5] == of[5]
        assert rf[9] == of[9], "conserved sketches differ"
        assert rf[12] == of[12], "ANI differs"
        # the ONLY residual divergence class: the reference's windowed
        # (--noSplit) path carries its authors' own bookkeeping bugs
        # (commonFunc.hpp:522-528,560-568; see map/l2.py docstring), so
        # placement may differ by a few bp — observed 6bp on this
        # fixture; identity, counts and spans match exactly (PARITY.md)
        assert abs(int(rf[7]) - int(of[7])) <= 16, (rl, ol)
        assert (int(rf[8]) - int(rf[7])) == (int(of[8]) - int(of[7]))


def test_parity_legacy_output(tmp_path, oracle_bin):
    base = random_genome(60_000, seed=21)
    q = mutate(base, 0.05, seed=22)[:8000]
    ref = str(tmp_path / "ref.fa")
    qf = str(tmp_path / "q.fa")
    write_fasta(ref, [("chr1", base)])
    write_fasta(qf, [("q1", q)])
    ref_lines = run_reference(
        oracle_bin, ref, qf, str(tmp_path / "ref.paf"),
        ["-k", "15", "-s", "1000", "-J", "60", "--pi", "80", "--legacy"])
    our_lines = run_ours(
        tmp_path, ref, qf,
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80, legacy_output=True)
    assert ref_lines == our_lines


def test_parity_revcomp_and_short(tmp_path, oracle_bin):
    base = random_genome(25_000, seed=41)
    comp = str.maketrans("ACGT", "TGCA")
    rc = base.translate(comp)[::-1]
    queries = [("rc", rc), ("short", base[5000:5600]),
               ("mut", mutate(base[2000:15000], 0.03, seed=42))]
    ref = str(tmp_path / "ref.fa")
    qf = str(tmp_path / "q.fa")
    write_fasta(ref, [("chr1", base)])
    write_fasta(qf, queries)
    ref_lines = run_reference(
        oracle_bin, ref, qf, str(tmp_path / "ref.paf"),
        ["-k", "15", "-s", "1000", "-J", "60", "--pi", "80"])
    our_lines = run_ours(
        tmp_path, ref, qf,
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80)
    assert len(ref_lines) > 0
    compare(ref_lines, our_lines)
