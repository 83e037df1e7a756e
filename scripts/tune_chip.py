#!/usr/bin/env python
"""On-chip knob sweep for the headline bench workload.

Every tunable is read at module-import time from the environment, so
each configuration runs in a fresh subprocess. The parent prints one
table (and a JSON line per config) ranking configurations by
steady-state end-to-end wall time on the bench pangenome; the winner's
env block is what bench.py should adopt.

Knobs swept (headline-relevant only — EVENTS_CHUNK and SORT_LOOKUP_MAX
only matter at chromosome scale and are exercised by the flagship run):
  MASHMAP_TPU_BENCH_BATCH   fragment batch size (pipeline granularity:
                            smaller batches overlap more rounds but pay
                            more fixed ~300ms tunnel latencies)
  MASHMAP_TPU_THETA_UNROLL  theta scan unroll factor
Usage:
  python scripts/tune_chip.py            # full sweep (parent)
  python scripts/tune_chip.py --child    # one config (internal)
"""

import itertools
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

N_RUNS = 2          # steady-state runs per config (after 1 warm run)


def child() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import bench

    fasta = bench.ensure_dataset()
    from mashmap_tpu.params import Parameters
    from mashmap_tpu.api import map_files

    out = os.path.join(bench.DATA, "tune_ours.paf")

    def make_params():
        return Parameters(
            ref_sequences=[fasta],
            out_file_name=out,
            percentage_identity=bench.PI / 100.0,
            skip_prefix=True, prefix_delim="#",
            num_mappings_for_segment=1,
            batch_fragments=int(
                os.environ.get("MASHMAP_TPU_BENCH_BATCH", "1024")),
        )

    map_files(make_params())            # warm compiles + executables
    times = []
    for _ in range(N_RUNS):
        t0 = time.time()
        map_files(make_params())
        times.append(round(time.time() - t0, 2))
    n_rows = sum(1 for _ in open(out))
    print(json.dumps({"times": times, "rows": n_rows}))


def parent() -> None:
    grid = {
        "MASHMAP_TPU_BENCH_BATCH": ["256", "512", "1024"],
        "MASHMAP_TPU_THETA_UNROLL": ["4", "8", "16"],
        # group splitting: smaller rank limits cut the 6 Mbp build into
        # 2 / 4 groups so group N+1's device phases overlap group N's
        # host classify (bit-identical either way, test_index.py)
        "MASHMAP_TPU_DEVICE_RANK_LIMIT": [
            str(256 * 1024 * 1024), str(4 * 1024 * 1024),
            str(2 * 1024 * 1024)],
    }
    keys = sorted(grid)
    results = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        env = dict(os.environ)
        env.update(dict(zip(keys, combo)))
        label = " ".join(f"{k.rsplit('_', 1)[-1]}={v}"
                         for k, v in zip(keys, combo))
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, capture_output=True, text=True, timeout=3600)
        wall = time.time() - t0
        line = (r.stdout.strip().splitlines() or [""])[-1]
        try:
            d = json.loads(line)
            best = min(d["times"])
            results.append((best, label, d))
            print(f"[tune] {label:<28} steady={best:>6.2f}s "
                  f"runs={d['times']} rows={d['rows']} "
                  f"(subprocess {wall:.0f}s)", flush=True)
        except (json.JSONDecodeError, KeyError):
            print(f"[tune] {label:<28} FAILED rc={r.returncode}\n"
                  f"{r.stderr[-2000:]}", flush=True)
    if not results:
        print("[tune] no successful configs")
        return
    results.sort()
    print("\n[tune] ranking (best first):")
    for best, label, d in results:
        print(f"  {best:>6.2f}s  {label}  runs={d['times']}")
    best, label, _ = results[0]
    print(f"\n[tune] WINNER: {label} at {best:.2f}s steady-state")


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        parent()
