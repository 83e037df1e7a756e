#!/usr/bin/env python
"""Secondary benchmarks: the non-headline BASELINE.json configs.

Prints one JSON line per config (bench.py stays the single headline
metric). Workloads are deterministic synthetics of the same shape as
the reference's (real fixtures are stripped blobs in this image):

  one_to_one   scerevisiae8-shaped pangenome, --pi 95 -f one-to-one
  ont_reads    long reads (10-30kb, ~5% divergence) vs one reference,
               -f map best-mapping per read
  dense_ani    --dense + -J sketch-size sweep: max |reported ANI - true|
  multiref_rl  multi-reference --rl list mapping
  coverage     the CI acceptance gate (>=0.92 per-sequence coverage,
               scripts/test.sh semantics) on the one_to_one workload

vs_baseline is ours/reference throughput on this host where the
reference binary applies (accuracy rows report vs_baseline = -1).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "scripts"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data", "generated")


def oracle():
    r = subprocess.run([os.path.join(HERE, "tests", "oracle",
                                     "build_ref.sh")],
                       capture_output=True, text=True)
    return (r.stdout.strip().splitlines()[-1] if r.returncode == 0
            else None)


def time_ours(params_fn, warm=1, runs=2):
    from mashmap_tpu.api import map_files
    for _ in range(warm):
        map_files(params_fn())
    best = None
    for _ in range(runs):
        t0 = time.time()
        map_files(params_fn())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def time_ref(ref_bin, args, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        r = subprocess.run([ref_bin] + args, capture_output=True,
                           text=True, timeout=3600)
        if r.returncode != 0:
            return None
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def emit(name, value, unit, vs):
    print(json.dumps({"metric": name, "value": round(value, 3),
                      "unit": unit, "vs_baseline": round(vs, 3)}),
          flush=True)


def main():
    os.makedirs(DATA, exist_ok=True)
    from genomes import pangenome, write_fasta, random_genome, mutate
    import numpy as np
    from mashmap_tpu.params import Parameters
    ref_bin = oracle()

    # ---- shared pangenome (scerevisiae8 shape)
    pan = os.path.join(DATA, "extra_pan4.fa")
    if not os.path.exists(pan):
        write_fasta(pan, pangenome(4, 1_000_000, 0.04, seed=77))
    pan_mbp = 4 * 1.0

    # ---- config: --pi 95 -f one-to-one
    out = os.path.join(DATA, "extra_oto.paf")

    def p_oto():
        return Parameters(ref_sequences=[pan], out_file_name=out,
                          percentage_identity=0.95, filter_mode=2,
                          skip_prefix=True, prefix_delim="#",
                          num_mappings_for_segment=1,
                          batch_fragments=2048, no_progress=True)

    ours = time_ours(p_oto)
    refs = (time_ref(ref_bin, ["-r", pan, "--pi", "95", "-f",
                               "one-to-one", "-Y", "#", "-n", "1", "-t",
                               "8", "-o", out + ".ref"])
            if ref_bin else None)
    emit("one-to-one --pi 95 (pangenome self-map)", pan_mbp / ours,
         "Mbp/s", (pan_mbp / ours) / (pan_mbp / refs) if refs else -1.0)

    # ---- coverage gate on the same run (scripts/test.sh semantics)
    from check_coverage import coverage_by_sequence
    from mashmap_tpu.io.fasta import read_all_seqs
    lengths = {n: len(s) for n, s in read_all_seqs(pan)}
    with open(out) as fh:
        cov = coverage_by_sequence(lengths, fh)
    emit("per-sequence coverage gate (min, >=0.92 required)",
         min(cov.values()), "fraction", min(cov.values()) / 0.92)
    assert min(cov.values()) >= 0.92, f"coverage gate FAILED: {cov}"

    # ---- config: ONT-shaped long reads vs one reference, -f map
    refg = os.path.join(DATA, "extra_ref5m.fa")
    reads = os.path.join(DATA, "extra_ont.fa")
    if not os.path.exists(reads):
        base = random_genome(5_000_000, seed=88)
        write_fasta(refg, [("chr1", base)])
        rng = np.random.default_rng(89)
        rs = []
        for i in range(200):
            L = int(rng.integers(10_000, 30_000))
            lo = int(rng.integers(0, len(base) - L))
            rs.append((f"read{i}", mutate(base[lo:lo + L], 0.05,
                                          seed=1000 + i)))
        write_fasta(reads, rs)
    read_mbp = sum(len(s) for _, s in read_all_seqs(reads)) / 1e6
    out2 = os.path.join(DATA, "extra_ont.paf")

    def p_ont():
        return Parameters(ref_sequences=[refg], query_sequences=[reads],
                          out_file_name=out2, percentage_identity=0.85,
                          filter_mode=1, batch_fragments=2048,
                          no_progress=True)

    ours = time_ours(p_ont)
    refs = (time_ref(ref_bin, ["-r", refg, "-q", reads, "--pi", "85",
                               "-f", "map", "-t", "8", "-o",
                               out2 + ".ref"]) if ref_bin else None)
    mapped = len({ln.split("\t")[0] for ln in open(out2)})
    emit("ONT long reads -f map", read_mbp / ours, "Mbp/s",
         (read_mbp / ours) / (read_mbp / refs) if refs else -1.0)
    emit("ONT reads mapped", mapped / 200.0, "fraction",
         mapped / 200.0)

    # ---- config: --dense + -J sweep ANI accuracy (true ANI = 97%)
    da = os.path.join(DATA, "extra_da.fa")
    db = os.path.join(DATA, "extra_db.fa")
    if not os.path.exists(db):
        g = random_genome(2_000_000, seed=90)
        write_fasta(da, [("gA", g)])
        write_fasta(db, [("gB", mutate(g, 0.03, seed=91,
                                       indel_frac=0.0))])
    errs = []
    for ss in (None, 60, 120, 200):   # None => --dense auto density
        out3 = os.path.join(DATA, "extra_dense.paf")
        from mashmap_tpu.api import map_files
        map_files(Parameters(
            ref_sequences=[da], query_sequences=[db],
            out_file_name=out3, percentage_identity=0.9,
            dense=ss is None, sketch_size=ss,
            batch_fragments=2048, no_progress=True))
        anis = [float(f.split(":")[-1]) for ln in open(out3)
                for f in [ln.split("\t")[12]]]
        med = sorted(anis)[len(anis) // 2] * 100
        errs.append(abs(med - 97.0))
    emit("--dense/-J sweep max |ANI error| (true 97%)", max(errs),
         "percentage points", 1.0 if max(errs) <= 1.0 else -1.0)

    # ---- config: multi-reference --rl list
    r1 = os.path.join(DATA, "extra_r1.fa")
    r2 = os.path.join(DATA, "extra_r2.fa")
    rl = os.path.join(DATA, "extra_rl.txt")
    if not os.path.exists(rl):
        write_fasta(r1, [("refA", random_genome(1_500_000, seed=95))])
        write_fasta(r2, [("refB", random_genome(1_500_000, seed=96))])
        with open(rl, "w") as fh:
            fh.write(r1 + "\n" + r2 + "\n")
    q4 = os.path.join(DATA, "extra_q4.fa")
    if not os.path.exists(q4):
        a = read_all_seqs(r1)[0][1]
        b = read_all_seqs(r2)[0][1]
        write_fasta(q4, [("qA", mutate(a, 0.04, seed=97)),
                         ("qB", mutate(b, 0.04, seed=98))])
    out4 = os.path.join(DATA, "extra_rl.paf")

    def p_rl():
        return Parameters(ref_sequences=[r1, r2],
                          query_sequences=[q4], out_file_name=out4,
                          percentage_identity=0.85,
                          batch_fragments=2048, no_progress=True)

    ours = time_ours(p_rl)
    refs = (time_ref(ref_bin, ["--rl", rl, "-q", q4, "--pi", "85",
                               "-t", "8", "-o", out4 + ".ref"])
            if ref_bin else None)
    emit("multi-reference --rl mapping", 3.0 / ours, "Mbp/s",
         (3.0 / ours) / (3.0 / refs) if refs else -1.0)


if __name__ == "__main__":
    main()
