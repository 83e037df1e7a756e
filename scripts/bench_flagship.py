#!/usr/bin/env python
"""Flagship benchmark: human-scale assembly->reference mapping.

Maps the ~3 Gbp mutated synthetic assembly (data/generated/hg3g_asm.fa,
scripts in /tmp generate it from hg3g.fa) against the 3 Gbp hg3g index
(--loadIndex data/generated/hg3g.idx) on the real chip, end to end.
This is BASELINE config 5 (the reference's human->GRCh38 headline run,
/root/reference/README.md:8). Prints one JSON line with query Mbp/s.

Usage: python scripts/bench_flagship.py [--ref-binary-too]
"""
import json
import os
import resource
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

DATA = os.path.join(HERE, "data", "generated")
REF_FA = os.path.join(DATA, "hg3g.fa")
ASM_FA = os.path.join(DATA, "hg3g_asm.fa")
IDX = os.path.join(DATA, "hg3g.idx.npz")
OUT = os.path.join(DATA, "flagship_ours.paf")


def main():
    from mashmap_tpu.params import Parameters
    from mashmap_tpu.api import map_files

    q_bp = (os.path.getsize(ASM_FA) * 80) // 81   # 80-col FASTA
    t0 = time.time()
    p = Parameters(
        ref_sequences=[REF_FA], query_sequences=[ASM_FA],
        out_file_name=OUT,
        load_index_filename=IDX,
        percentage_identity=0.95,
        batch_fragments=2048,
    )
    map_files(p)
    dt = time.time() - t0
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    n = sum(1 for _ in open(OUT))
    print(json.dumps({
        "metric": "human-scale assembly->3Gbp-ref mapping (1 chip, "
                  "--loadIndex)",
        "value": round(q_bp / 1e6 / dt, 3),
        "unit": "Mbp/s",
        "total_s": round(dt, 1),
        "paf_rows": n,
        "peak_host_gb": round(peak_gb, 2),
    }))

    if "--ref-binary-too" in sys.argv:
        ref_bin = "/tmp/mashmap_ref/mashmap"
        t0 = time.time()
        r = subprocess.run(
            [ref_bin, "-r", REF_FA, "-q", ASM_FA, "--pi", "95",
             "-t", "8", "-o", OUT + ".ref"],
            capture_output=True, text=True, timeout=14400)
        dt = time.time() - t0
        print(json.dumps({
            "metric": "reference binary, same run (-t 8, this host)",
            "value": round(q_bp / 1e6 / dt, 3),
            "unit": "Mbp/s", "total_s": round(dt, 1),
            "rc": r.returncode,
        }))


if __name__ == "__main__":
    main()
