#!/usr/bin/env python
"""Flagship benchmark: human-scale assembly->reference mapping.

BASELINE config 5 (the reference's human->GRCh38 headline run,
/root/reference/README.md:8), in two phases:

1. BUILD: index the 3 Gbp synthetic reference (data/generated/hg3g.fa)
   with --saveIndex semantics, verified loadable afterwards. (The
   round-2 save was truncated; this re-times the round-3 overlapped
   build — VERDICT item 3.)
2. MAP: map the ~3 Gbp mutated assembly (data/generated/hg3g_asm.fa)
   against it on the real chip, end to end.

Prints one JSON line per phase. Usage:
    python scripts/bench_flagship.py [--build-only|--map-only]
        [--ref-binary-too]
"""
import json
import logging
import os
import resource
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# per-phase build/map timings (builder/engine _mark debug logs) on
# stderr — the evidence trail for the build-time work
logging.basicConfig(format="%(asctime)s %(name)s %(message)s")
logging.getLogger("mashmap_tpu").setLevel(logging.DEBUG)

DATA = os.path.join(HERE, "data", "generated")
# env overrides: smoke-test the exact script at reduced scale
REF_FA = os.environ.get("MASHMAP_TPU_FLAGSHIP_REF",
                        os.path.join(DATA, "hg3g.fa"))
ASM_FA = os.environ.get("MASHMAP_TPU_FLAGSHIP_ASM",
                        os.path.join(DATA, "hg3g_asm.fa"))
IDX = os.environ.get("MASHMAP_TPU_FLAGSHIP_IDX",
                     os.path.join(DATA, "hg3g.idx.npz"))
OUT = os.environ.get("MASHMAP_TPU_FLAGSHIP_OUT",
                     os.path.join(DATA, "flagship_ours.paf"))


def idx_ok() -> bool:
    import zipfile
    try:
        zipfile.ZipFile(IDX).namelist()
        return True
    except Exception:
        return False


def build_phase():
    from mashmap_tpu.params import Parameters
    from mashmap_tpu.api import build_or_load_index

    p = Parameters(ref_sequences=[REF_FA],
                   percentage_identity=0.95).finalize()
    t0 = time.time()
    idx = build_or_load_index(p)
    dt = time.time() - t0
    idx.save(IDX[:-4])          # np.savez appends .npz
    assert idx_ok(), "saved index failed the zip integrity check"
    print(json.dumps({
        "metric": "3 Gbp reference index BUILD (1 chip)",
        "value": round(dt, 1), "unit": "s",
        "minmers": int(len(idx.uniq_hashes)),
        "interval_rows": int(len(idx.mi_rank)),
        "k": idx.kmer_size, "w": idx.window_size,
        "s": idx.sketch_size,
    }), flush=True)


def map_phase(twice: bool = False):
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
    idx = map_files(p)
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
    }), flush=True)
    if twice:
        # resident-index number: ONE Mapper instance, second run —
        # index tables already in HBM, kernels warm. What a running
        # mapping service pays per query set, and the apples comparison
        # to the reference binary's map phase (whose index structures
        # are already in its RAM when its map timer starts).
        from mashmap_tpu.map.engine import Mapper
        p2 = Parameters(
            ref_sequences=[REF_FA], query_sequences=[ASM_FA],
            out_file_name=OUT,
            kmer_size=idx.kmer_size, seg_length=idx.window_size,
            sketch_size=idx.sketch_size,
            percentage_identity=0.95,
            batch_fragments=2048,
        ).finalize()
        m = Mapper(p2, idx)
        with open(OUT, "w") as out:
            m.run([ASM_FA], out)      # pays the HBM upload once
        t0 = time.time()
        with open(OUT, "w") as out:
            m.run([ASM_FA], out)
        dt2 = time.time() - t0
        print(json.dumps({
            "metric": "same mapping, index resident in HBM "
                      "(service steady state)",
            "value": round(q_bp / 1e6 / dt2, 3),
            "unit": "Mbp/s",
            "total_s": round(dt2, 1),
        }), flush=True)


def reference_run():
    ref_bin = "/tmp/mashmap_ref/mashmap"
    q_bp = (os.path.getsize(ASM_FA) * 80) // 81
    t0 = time.time()
    r = subprocess.run(
        [ref_bin, "-r", REF_FA, "-q", ASM_FA, "--pi", "95",
         "-t", "8", "-o", OUT + ".ref"],
        capture_output=True, text=True, timeout=28800)
    dt = time.time() - t0
    print(json.dumps({
        "metric": "reference binary, same run (-t 8, this host)",
        "value": round(q_bp / 1e6 / dt, 3),
        "unit": "Mbp/s", "total_s": round(dt, 1),
        "rc": r.returncode,
    }), flush=True)


if __name__ == "__main__":
    if "--map-only" not in sys.argv and (
            "--build-only" in sys.argv or not idx_ok()):
        build_phase()
    if "--build-only" not in sys.argv:
        map_phase(twice="--map-twice" in sys.argv)
    if "--ref-binary-too" in sys.argv:
        reference_run()
