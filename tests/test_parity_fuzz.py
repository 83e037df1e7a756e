"""Randomized end-to-end parity vs the reference binary.

Repeat-heavy random genomes x random flag combinations; every row must
match the oracle exactly on all columns except the documented col-10
class (PARITY.md), with the merged-row id:f tag compared at 4 decimals.
A 24-case sweep of this generator passed 24/24 when it was added; the
seeds below keep suite runtime bounded while preserving the coverage
shape (repeats, multi-contig, -M, -n 1..3).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
ORACLE = "/tmp/mashmap_ref/mashmap"

from tests.genomes import random_genome, mutate, write_fasta  # noqa: E402
from mashmap_tpu.params import Parameters  # noqa: E402
from mashmap_tpu.api import map_files  # noqa: E402


def _core(line):
    f = line.rstrip("\n").split("\t")
    if len(f) > 12:
        f[12] = str(round(float(f[12].split(":")[-1]), 4))
    return tuple(f[:9] + f[10:])


@pytest.mark.slow
@pytest.mark.parametrize("seed", [5003, 5007, 5011, 5018])
def test_randomized_flag_parity(tmp_path, seed):
    r = subprocess.run([os.path.join(HERE, "oracle", "build_ref.sh")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip("oracle build failed")

    rng = np.random.default_rng(seed)
    g = random_genome(int(rng.integers(40_000, 90_000)), seed=seed)
    for ui in range(int(rng.integers(0, 3))):
        u = random_genome(int(rng.integers(150, 4000)), seed=seed * 7 + ui)
        g += u * int(rng.integers(2, 10)) + random_genome(
            int(rng.integers(2000, 9000)), seed=seed * 7 + ui + 3)
    q = mutate(g, float(rng.uniform(0.01, 0.08)), seed=seed + 1)
    ref = str(tmp_path / "r.fa")
    qf = str(tmp_path / "q.fa")
    write_fasta(ref, [("chr1", g),
                      ("chr2", mutate(g[: len(g) // 2], 0.1,
                                      seed=seed + 2))])
    write_fasta(qf, [("q1", q), ("q2", q[5000:30_000])])
    k = int(rng.choice([13, 15, 17]))
    w = int(rng.choice([1000, 2000, 3000]))
    s = int(rng.choice([40, 60, 110]))
    pi = int(rng.choice([75, 80, 85]))
    n = int(rng.choice([1, 2, 3]))
    merge = bool(rng.integers(0, 2))

    out_r = str(tmp_path / "ref.paf")
    rr = subprocess.run(
        [ORACLE, "-r", ref, "-q", qf, "-o", out_r, "-k", str(k),
         "-s", str(w), "-J", str(s), "--pi", str(pi), "-n", str(n)]
        + ([] if merge else ["-M"]),
        capture_output=True, text=True, timeout=600)
    assert rr.returncode == 0, rr.stderr[-500:]

    p = Parameters(ref_sequences=[ref], query_sequences=[qf],
                   out_file_name=str(tmp_path / "o.paf"),
                   kmer_size=k, seg_length=w, sketch_size=s,
                   percentage_identity=pi / 100.0, merge_mappings=merge,
                   num_mappings_for_segment=n, no_progress=True)
    map_files(p)
    a = sorted(_core(l) for l in open(out_r))
    b = sorted(_core(l) for l in open(p.out_file_name))
    assert a, "oracle produced no rows"
    assert a == b, (
        f"k={k} w={w} s={s} pi={pi} n={n} merge={merge}: "
        f"ref={len(a)} ours={len(b)}")
