"""Multi-host launch path: N CPU processes == 1 process, byte-identical.

Simulates a multi-host pod with separate OS processes coordinated by
jax.distributed (SURVEY.md §5 "Distributed communication backend"); the
reference has no analog (single-process pthreads, ThreadPool.hpp).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _write_genomes(tmp_path):
    sys.path.insert(0, HERE)
    from genomes import pangenome, write_fasta, mutate
    ref = pangenome(3, 60_000, 0.04, seed=31)
    ref_fa = str(tmp_path / "ref.fa")
    write_fasta(ref_fa, ref)
    # queries: several per process so the stride actually interleaves
    rng = np.random.default_rng(9)
    qs = []
    for i, (_, seq) in enumerate(ref * 2):
        lo = int(rng.integers(0, len(seq) // 2))
        qs.append((f"q{i}", mutate(seq[lo:lo + 30_000], 0.03, seed=50 + i)))
    q_fa = str(tmp_path / "q.fa")
    write_fasta(q_fa, qs)
    return ref_fa, q_fa


def _run_cli(args, env_extra, timeout=600):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update({
        "MASHMAP_TPU_PLATFORM": "cpu",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    })
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-m", "mashmap_tpu.cli"] + args,
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


@pytest.mark.slow
@pytest.mark.parametrize("mode_args,shard", [
    ([], False),                      # default map filter
    (["-f", "one-to-one"], False),    # global ref-axis pass on process 0
    ([], True),                       # multi-host x --shardIndex: each
                                      # process shards the index over its
                                      # own 4-device local mesh (the
                                      # north-star deployment: DCN across
                                      # processes, ICI sharding within)
])
def test_two_process_run_matches_single(tmp_path, mode_args, shard):
    ref_fa, q_fa = _write_genomes(tmp_path)
    base = ["-r", ref_fa, "-q", q_fa, "--pi", "90", "-s", "10000",
            "-k", "17"] + mode_args

    single = str(tmp_path / "single.paf")
    proc = _run_cli(base + ["-o", single], {})
    out, err = proc.communicate(timeout=600)
    assert proc.returncode == 0, err

    multi = str(tmp_path / "multi.paf")
    port = _free_port()
    shard_env = (
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
        if shard else {})
    shard_args = ["--shardIndex"] if shard else []
    procs = []
    for pid in range(2):
        procs.append(_run_cli(
            base + shard_args + ["-o", multi],
            {"MASHMAP_TPU_COORDINATOR": f"127.0.0.1:{port}",
             "MASHMAP_TPU_NUM_PROCS": "2",
             "MASHMAP_TPU_PROC_ID": str(pid), **shard_env}))
    for pr in procs:
        out, err = pr.communicate(timeout=600)
        assert pr.returncode == 0, err

    with open(single) as fh:
        want = fh.read()
    with open(multi) as fh:
        got = fh.read()
    assert got == want, "2-process PAF differs from single-process"
    assert want.strip(), "no mappings produced"
    # no stray part files
    assert not [f for f in os.listdir(tmp_path) if ".part" in f]
