#!/usr/bin/env python
"""Aligner benchmark: mashmap_tpu.align vs the reference mashmap-align.

Prints one JSON line {"metric", "value" (aligned Mbp/s), "unit",
"vs_baseline" (ours / reference binary on this host)}.

Workload: a mutated-pangenome mapping set produced by the reference
mapper with --legacy (the flow mashmap-align supports,
computeAlignments.hpp:236-241); both aligners consume the SAME mapping
file and FASTAs. The reference aligner is single-threaded edlib
(computeAlignments.hpp:109-184).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data", "generated")


def main():
    os.makedirs(DATA, exist_ok=True)
    from genomes import pangenome, write_fasta, mutate, random_genome

    build = subprocess.run(
        [os.path.join(HERE, "tests", "oracle", "build_ref.sh")],
        capture_output=True, text=True)
    assert build.returncode == 0, build.stderr[-500:]
    map_bin = "/tmp/mashmap_ref/mashmap"
    aln_bin = "/tmp/mashmap_ref/mashmap-align"

    ref = os.path.join(DATA, "aln_ref.fa")
    qf = os.path.join(DATA, "aln_q.fa")
    if not os.path.exists(qf):
        base = random_genome(3_000_000, seed=61)
        write_fasta(ref, [("chr1", base)])
        qs = [(f"q{i}", mutate(base[i * 500_000:(i + 1) * 500_000 + 20_000],
                               0.04, seed=62 + i)) for i in range(5)]
        write_fasta(qf, qs)
    mp = os.path.join(DATA, "aln_map.out")
    r = subprocess.run(
        [map_bin, "-r", ref, "-q", qf, "-o", mp, "--pi", "85",
         "--legacy", "-t", "8"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-500:]
    # aligned bp = sum of query spans in the mapping file
    spans = [ln.split() for ln in open(mp)]
    mbp = sum(int(f[3]) - int(f[2]) + 1 for f in spans) / 1e6

    from mashmap_tpu.align.driver import align_files
    out = os.path.join(DATA, "aln_ours.aln")
    align_files([ref], [qf], mp, 85.0, out)      # warm compiles
    t0 = time.time()
    align_files([ref], [qf], mp, 85.0, out)
    ours = time.time() - t0
    n_ours = sum(1 for _ in open(out))

    t0 = time.time()
    r = subprocess.run(
        [aln_bin, "-s", ref, "-q", qf, "--mappingFile", mp, "--pi",
         "85", "-o", out + ".ref"], capture_output=True, text=True)
    refs = time.time() - t0 if r.returncode == 0 else None
    n_ref = sum(1 for _ in open(out + ".ref")) if refs else -1

    print(f"[bench_align] {mbp:.1f} Mbp mapped, ours {ours:.1f}s "
          f"({n_ours} rows), reference {refs and round(refs, 1)}s "
          f"({n_ref} rows)", file=sys.stderr)
    print(json.dumps({
        "metric": "base-level alignment throughput",
        "value": round(mbp / ours, 3),
        "unit": "Mbp/s",
        "vs_baseline": round((mbp / ours) / (mbp / refs), 3)
        if refs else -1.0,
    }))


if __name__ == "__main__":
    main()
