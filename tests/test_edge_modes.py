"""Edge modes against the reference binary: -X skip-self, multi-file
references, FASTQ queries, -f none, sparsification, repeat script."""

import gzip
import os
import subprocess
import sys

import pytest

from mashmap_tpu.params import Parameters, FILTER_NONE
from mashmap_tpu.api import map_files
from tests.genomes import random_genome, mutate, write_fasta

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
ORACLE = "/tmp/mashmap_ref/mashmap"


@pytest.fixture(scope="module")
def oracle_bin():
    r = subprocess.run([os.path.join(HERE, "oracle", "build_ref.sh")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr}")
    return ORACLE


def core(line):
    """Core columns; ANI rounded to 4 decimals — merged-chain rows
    average in the reference's (unstable-sort) chain order, which can
    flip the 6th decimal (see tests/test_parity.py docstring)."""
    f = line.split("\t")
    ani = round(float(f[12].split(":")[-1]), 4) if len(f) > 12 else ""
    return (f[0], f[2], f[3], f[4], f[5], f[7], f[8], ani)


def run_ref(oracle_bin, args, out):
    r = subprocess.run([oracle_bin] + args + ["-o", out],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    return {core(l) for l in open(out)}


def test_skip_self_matches_reference(tmp_path, oracle_bin):
    """-X: all-vs-all with exact-name self-mappings excluded."""
    base = random_genome(20000, seed=50)
    recs = [("s1", base), ("s2", mutate(base, 0.04, seed=51))]
    ref = str(tmp_path / "r.fa")
    write_fasta(ref, recs)
    want = run_ref(oracle_bin,
                   ["-r", ref, "-q", ref, "-X", "-k", "15", "-s", "1000",
                    "-J", "60", "--pi", "80"], str(tmp_path / "ref.paf"))
    params = Parameters(
        ref_sequences=[ref], query_sequences=[ref], skip_self=True,
        out_file_name=str(tmp_path / "ours.paf"),
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80)
    map_files(params)
    got = {core(l) for l in open(tmp_path / "ours.paf")}
    assert want and got == want
    assert all(r[0] != r[4] for r in got)    # no self rows


def test_noquery_selfmap_keeps_self_rows(tmp_path, oracle_bin):
    """No -q and no -X: the reference does NOT skip self mappings
    (parseCmdArgs.hpp:340-344 overrides the :328 assignment)."""
    base = random_genome(20000, seed=50)
    recs = [("s1", base), ("s2", mutate(base, 0.04, seed=51))]
    ref = str(tmp_path / "r.fa")
    write_fasta(ref, recs)
    want = run_ref(oracle_bin,
                   ["-r", ref, "-k", "15", "-s", "1000", "-J", "60",
                    "--pi", "80"], str(tmp_path / "ref.paf"))
    params = Parameters(
        ref_sequences=[ref], out_file_name=str(tmp_path / "ours.paf"),
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80)
    map_files(params)
    got = {core(l) for l in open(tmp_path / "ours.paf")}
    assert want and got == want
    assert any(r[0] == r[4] for r in got)    # self rows present


def test_multi_ref_files_and_fastq_query(tmp_path, oracle_bin):
    base = random_genome(15000, seed=52)
    other = random_genome(15000, seed=53)
    r1, r2 = str(tmp_path / "r1.fa"), str(tmp_path / "r2.fa")
    write_fasta(r1, [("c1", base)])
    write_fasta(r2, [("c2", other)])
    qf = str(tmp_path / "q.fq.gz")
    qseq = mutate(base, 0.04, seed=54)
    with gzip.open(qf, "wt") as fh:
        fh.write(f"@q1\n{qseq}\n+\n{'I' * len(qseq)}\n")
    params = Parameters(
        ref_sequences=[r1, r2], query_sequences=[qf],
        out_file_name=str(tmp_path / "ours.paf"),
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80)
    map_files(params)
    got = {core(l) for l in open(tmp_path / "ours.paf")}
    assert got, "no mappings"
    assert all(r[4] == "c1" for r in got)    # maps to the first ref file
    # reference with the same multi-file list (via a list file)
    lst = str(tmp_path / "refs.txt")
    with open(lst, "w") as fh:
        fh.write(f"{r1}\n{r2}\n")
    want = run_ref(oracle_bin,
                   ["--rl", lst, "-q", qf, "-k", "15", "-s", "1000",
                    "-J", "60", "--pi", "80"], str(tmp_path / "ref.paf"))
    assert got == want


def test_filter_none_and_sparsify(tmp_path, oracle_bin):
    base = random_genome(30000, seed=55)
    ref = str(tmp_path / "r.fa")
    qf = str(tmp_path / "q.fa")
    write_fasta(ref, [("c", base)])
    write_fasta(qf, [("q", mutate(base, 0.05, seed=56))])
    want = run_ref(oracle_bin,
                   ["-r", ref, "-q", qf, "-k", "15", "-s", "1000",
                    "-J", "60", "--pi", "80", "-f", "none", "-M"],
                   str(tmp_path / "ref.paf"))
    params = Parameters(
        ref_sequences=[ref], query_sequences=[qf],
        out_file_name=str(tmp_path / "ours.paf"),
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80, filter_mode=FILTER_NONE,
        merge_mappings=False)
    map_files(params)
    got = {core(l) for l in open(tmp_path / "ours.paf")}
    assert want and got == want


def test_repeat_annotation_script(tmp_path):
    unit = random_genome(6000, seed=57)
    genome = random_genome(5000, seed=58) + unit + \
        random_genome(5000, seed=59) + unit
    ref = str(tmp_path / "g.fa")
    write_fasta(ref, [("chr", genome)])
    params = Parameters(
        ref_sequences=[ref], query_sequences=[ref],
        out_file_name=str(tmp_path / "self.out"),
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80, filter_mode=FILTER_NONE,
        legacy_output=True)
    map_files(params)
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "denovo_repeat_annotation.py"),
         str(tmp_path / "self.out"), "1000", "80", "--merge"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    beds = [l.split("\t") for l in r.stdout.splitlines()]
    assert beds, "no repeats found"
    # the repeat unit copies must be flagged
    spans = [(int(a), int(b)) for _, a, b in beds]
    assert any(a < 11000 and b > 5000 for a, b in spans)
