#!/usr/bin/env python
"""Benchmark: query Mbp/s on an all-vs-all pangenome self-mapping.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- Workload: deterministic synthetic pangenome (the reference's own CI
  workload shape: all-vs-all self-mapping with PanSN names and prefix
  skipping; its yeast fixture is a stripped blob in this image).
- value: query Mbp/s end-to-end (index build + mapping) on this chip.
- vs_baseline: ratio vs. the reference C++ mashmap (built from
  /root/reference, 8 threads) running the SAME workload on this host.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# bench runs on the real chip; keep the persistent compile cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data", "generated")
N_HAP = 4
HAP_LEN = 1_500_000
DIVERGENCE = 0.05
PI = 85


def ensure_dataset() -> str:
    os.makedirs(DATA, exist_ok=True)
    path = os.path.join(DATA, f"bench_pan{N_HAP}x{HAP_LEN}.fa")
    if not os.path.exists(path):
        sys.path.insert(0, os.path.join(HERE, "tests"))
        from genomes import pangenome, write_fasta
        write_fasta(path, pangenome(N_HAP, HAP_LEN, DIVERGENCE, seed=2024))
    return path


def run_ours(fasta: str) -> float:
    from mashmap_tpu.params import Parameters
    from mashmap_tpu.api import map_files

    out = os.path.join(DATA, "bench_ours.paf")

    def make_params():
        return Parameters(
            ref_sequences=[fasta],
            out_file_name=out,
            percentage_identity=PI / 100.0,
            skip_prefix=True, prefix_delim="#",
            num_mappings_for_segment=1,
            batch_fragments=int(
                os.environ.get("MASHMAP_TPU_BENCH_BATCH", "1024")),
        )

    # Steady-state measurement: run once to warm the persistent XLA
    # compile cache AND this process's executable/transfer paths (on
    # tunneled TPU backends the first dispatch of each executable pays
    # seconds of loading latency that a long-running mapping service
    # pays exactly once), then report the best of two timed runs —
    # tunnel bandwidth fluctuates several-fold between runs, and
    # best-of-N measures the pipeline rather than the link's mood.
    t0 = time.time()
    map_files(make_params())
    cold = time.time() - t0
    runs = []
    for _ in range(2):
        t0 = time.time()
        map_files(make_params())
        runs.append(time.time() - t0)
    dt = min(runs)
    print(f"[bench] cold end-to-end: {cold:.1f}s, steady-state runs: "
          f"{[round(r, 1) for r in runs]} -> {dt:.1f}s", file=sys.stderr)
    n = sum(1 for _ in open(out))
    assert n > 0, "bench produced no mappings"
    return dt


def run_reference(fasta: str) -> float:
    build = subprocess.run(
        [os.path.join(HERE, "tests", "oracle", "build_ref.sh")],
        capture_output=True, text=True)
    if build.returncode != 0:
        return -1.0
    ref_bin = build.stdout.strip().splitlines()[-1]
    out = os.path.join(DATA, "bench_ref.paf")
    best = -1.0
    for _ in range(2):          # best-of-2, like our own measurement
        t0 = time.time()
        r = subprocess.run(
            [ref_bin, "-r", fasta, "--pi", str(PI), "-Y", "#", "-n", "1",
             "-t", "8", "-o", out],
            capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            return -1.0
        dt = time.time() - t0
        best = dt if best < 0 else min(best, dt)
    return best


def probe_backend(timeout_s: float = 300.0) -> None:
    """Fail loudly (not hang) if the TPU backend is unreachable.

    The tunneled axon client retries backend init forever; during an
    outage `jax.devices()` never returns and the whole bench would hang
    past any driver timeout with no diagnostic. Probe in a subprocess
    with a deadline and exit non-zero with a JSON error line instead.
    """
    code = ("import jax, jax.numpy as jnp; jax.devices(); "
            "x = jnp.ones((4,4)); (x@x).block_until_ready(); print('ok')")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        if r.returncode == 0:
            return
        err = (r.stderr or "").strip().splitlines()[-1:] or ["?"]
        reason = f"backend init failed: {err[0]}"
    except subprocess.TimeoutExpired:
        reason = f"backend init unreachable after {timeout_s:.0f}s"
    print(json.dumps({
        "metric": "pangenome self-map query throughput (1 chip)",
        "value": 0.0, "unit": "Mbp/s", "vs_baseline": 0.0,
        "error": reason,
    }))
    sys.exit(2)


def main():
    fasta = ensure_dataset()
    query_mbp = N_HAP * HAP_LEN / 1e6

    probe_backend()
    ours_s = run_ours(fasta)
    ours_mbps = query_mbp / ours_s

    ref_s = run_reference(fasta)
    if ref_s > 0:
        vs = ours_mbps / (query_mbp / ref_s)
    else:
        # fall back to the published envelope: human assembly -> GRCh38 in
        # ~1 minute on 8 threads (~1.6 query-Gbp/min, BASELINE.md)
        vs = ours_mbps / (3200.0 / 60.0)

    print(json.dumps({
        "metric": "pangenome self-map query throughput (1 chip)",
        "value": round(ours_mbps, 3),
        "unit": "Mbp/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
