"""Golden parity for additional reference flag combinations."""

import os
import subprocess

import pytest

from mashmap_tpu.params import Parameters
from mashmap_tpu.api import map_files
from tests.genomes import random_genome, mutate, write_fasta

HERE = os.path.dirname(__file__)
ORACLE = "/tmp/mashmap_ref/mashmap"


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("flags")
    base = random_genome(50000, seed=60)
    ref = str(d / "r.fa")
    qf = str(d / "q.fa")
    write_fasta(ref, [("chr1", base)])
    write_fasta(qf, [("q1", mutate(base, 0.05, seed=61)),
                     ("q2", mutate(base[10000:30000], 0.08, seed=62))])
    r = subprocess.run([os.path.join(HERE, "oracle", "build_ref.sh")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip("oracle build failed")
    return d, ref, qf


def run_pair(data, ref_args, our_kwargs, min_match=1.0):
    d, ref, qf = data
    out_r = str(d / "ref.paf")
    r = subprocess.run(
        [ORACLE, "-r", ref, "-q", qf, "-o", out_r] + ref_args,
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    params = Parameters(
        ref_sequences=[ref], query_sequences=[qf],
        out_file_name=str(d / "ours.paf"), **our_kwargs)
    map_files(params)

    def core(line):
        f = line.split("\t")
        ani = round(float(f[12].split(":")[-1]), 4) if len(f) > 12 else ""
        return (f[0], f[2], f[3], f[4], f[5], f[7], f[8], ani)

    a = {core(l) for l in open(out_r)}
    b = {core(l) for l in open(d / "ours.paf")}
    assert a, "oracle produced no rows"
    frac = len(a & b) / max(len(a), len(b))
    assert frac >= min_match, (
        f"parity {frac:.3f}", sorted(a - b)[:4], sorted(b - a)[:4])


def test_dense_sketching(data):
    run_pair(data,
             ["-k", "17", "-s", "1000", "--dense", "--pi", "85"],
             dict(kmer_size=17, seg_length=1000, dense=True,
                  percentage_identity=0.85))


def test_drop_low_map_id(data):
    run_pair(data,
             ["-k", "15", "-s", "1000", "-J", "60", "--pi", "90", "-K"],
             dict(kmer_size=15, seg_length=1000, sketch_size=60,
                  percentage_identity=0.90, keep_low_pct_id=False))


def test_kmer_complexity_threshold(data):
    run_pair(data,
             ["-k", "15", "-s", "1000", "-J", "60", "--pi", "80",
              "--kmerComplexity", "0.5"],
             dict(kmer_size=15, seg_length=1000, sketch_size=60,
                  percentage_identity=0.80,
                  kmer_complexity_threshold=0.5))


def test_no_hg_filter(data):
    run_pair(data,
             ["-k", "15", "-s", "1000", "-J", "60", "--pi", "80",
              "--noHgFilter", "-M", "-n", "2"],
             dict(kmer_size=15, seg_length=1000, sketch_size=60,
                  percentage_identity=0.80, stage1_topANI_filter=False,
                  merge_mappings=False, num_mappings_for_segment=2))


def test_sparsify(data):
    # keep ~50% of mappings: hash-threshold subsample must match exactly
    # (same mapping hash function on both sides)
    run_pair(data,
             ["-k", "15", "-s", "1000", "-J", "60", "--pi", "80",
              "-x", "0.5", "-M"],
             dict(kmer_size=15, seg_length=1000, sketch_size=60,
                  percentage_identity=0.80, merge_mappings=False,
                  sparsity_hash_threshold=int(0.5 * ((1 << 64) - 1))))


def test_report_percentage(data):
    d, ref, qf = data
    params = Parameters(
        ref_sequences=[ref], query_sequences=[qf],
        out_file_name=str(d / "pct.paf"),
        kmer_size=15, seg_length=1000, sketch_size=60,
        percentage_identity=0.80, report_ANI_percentage=True)
    map_files(params)
    for line in open(d / "pct.paf"):
        ani = float(line.split("id:f:")[1].split("\t")[0])
        assert 50.0 <= ani <= 100.0     # percentage scale, not [0,1]


def test_freq_threshold_decisions(tmp_path):
    """computeFreqHist parity at boundary percentages on a repeat-heavy
    input: the descending accumulate-vs-to_ignore walk must pick the
    SAME ignore threshold as the reference (winSketch.hpp:410-453), and
    the mapping output must agree on every core column."""
    import re

    import numpy as np

    from mashmap_tpu.api import build_or_load_index

    units = [random_genome(300, seed=200 + i) for i in range(6)]
    g = random_genome(20_000, seed=210)
    for i, u in enumerate(units):
        g += u * (4 + 6 * i) + random_genome(5_000, seed=220 + i)
    ref = str(tmp_path / "ref.fa")
    qf = str(tmp_path / "q.fa")
    write_fasta(ref, [("chr1", g)])
    write_fasta(qf, [("q1", mutate(g, 0.03, seed=230))])
    r = subprocess.run([os.path.join(HERE, "oracle", "build_ref.sh")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip("oracle build failed")

    for pct in (10.0, 5.0, 2.0, 1.0, 0.001):
        out_r = str(tmp_path / "r.paf")
        r = subprocess.run(
            [ORACLE, "-r", ref, "-q", qf, "-o", out_r, "-k", "15",
             "-s", "500", "-J", "60", "--pi", "80",
             "--kmerThreshold", str(pct)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-1000:]
        m = re.search(r"ignore minmers occurring >= (\d+) times",
                      r.stderr)
        ref_thr = int(m.group(1)) if m else None
        p = Parameters(
            ref_sequences=[ref], query_sequences=[qf],
            out_file_name=str(tmp_path / "o.paf"), kmer_size=15,
            seg_length=500, sketch_size=60, percentage_identity=0.80,
            kmer_pct_threshold=pct, no_progress=True)
        idx = build_or_load_index(p.finalize())
        ours_thr = (None if idx.freq_threshold >= np.iinfo(np.int64).max
                    else int(idx.freq_threshold))
        assert ours_thr == ref_thr, (pct, ours_thr, ref_thr)
        map_files(p, idx)

        def core(line):
            # all columns except col 10 (merged-chain representative,
            # PARITY.md) with the id:f tag rounded to 4 decimals (the
            # merged-row ANI mean is float-summation-order sensitive in
            # its 6th significant digit)
            f = line.rstrip("\n").split("\t")
            f[12] = str(round(float(f[12].split(":")[-1]), 4))
            return tuple(f[:9] + f[10:])

        a = [core(l) for l in open(out_r)]
        b = [core(l) for l in open(tmp_path / "o.paf")]
        assert a and a == b, f"rows differ beyond col 10 at pct={pct}"
