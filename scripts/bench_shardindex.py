#!/usr/bin/env python
"""Prove --shardIndex on the real TPU backend (VERDICT r2 item 5).

The sharded-index path (shard_map + psum/all_gather over a device
mesh, parallel/sharded_index.py) is correctness-tested on the forced
CPU 8-device mesh; this script compiles and runs it on the real chip
(a 1-device mesh — the sharding machinery, collectives included, is
exercised with shard count 1) and reports the overhead vs the
replicated path on the same workload.

Prints one JSON line per path. Usage:
    python scripts/bench_shardindex.py
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

FA = os.path.join(HERE, "data", "generated", "bench_pan4x1500000.fa")


def run(shard: bool) -> float:
    from mashmap_tpu.params import Parameters
    from mashmap_tpu.api import map_files

    out = f"/tmp/shardbench_{'s' if shard else 'r'}.paf"
    p = Parameters(
        ref_sequences=[FA], out_file_name=out,
        percentage_identity=0.85, skip_prefix=True, prefix_delim="#",
        num_mappings_for_segment=1, batch_fragments=1024,
        shard_index=shard)
    # warm (compiles), then best of 2
    map_files(p)
    runs = []
    for _ in range(2):
        t0 = time.time()
        map_files(p)
        runs.append(time.time() - t0)
    return min(runs), out


if __name__ == "__main__":
    dt_r, out_r = run(False)
    dt_s, out_s = run(True)
    same = open(out_r, "rb").read() == open(out_s, "rb").read()
    q_bp = 6.0  # 4 x 1.5 Mbp
    for name, dt in (("replicated", dt_r), ("shardIndex", dt_s)):
        print(json.dumps({
            "metric": f"self-map 6 Mbp, {name} index (real chip)",
            "value": round(q_bp / dt, 3), "unit": "Mbp/s",
            "seconds": round(dt, 2),
        }), flush=True)
    print(json.dumps({
        "metric": "sharded==replicated PAF byte-identical",
        "value": bool(same), "unit": "bool",
        "overhead_pct": round((dt_s / dt_r - 1) * 100, 1),
    }), flush=True)
    assert same, "sharded PAF differs from replicated"
