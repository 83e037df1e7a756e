"""Multi-device data-parallel mapping: 8-device mesh == 1-device output.

The engine shards the fragment batch (and L2 work items) over a 1-D
``('data',)`` mesh with the index replicated — the TPU-native recast of
the reference's pthread pool (ThreadPool.hpp; SURVEY.md section 2.3).
Device count is fixed at process start, so each configuration runs in a
subprocess on the forced-CPU platform.
"""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
import jax
jax.config.update("jax_platforms", "cpu")
from genomes import pangenome, write_fasta
from mashmap_tpu.params import Parameters
from mashmap_tpu.api import map_files

print("DEVICES", len(jax.devices()))
write_fasta({fa!r}, pangenome(3, 15000, divergence=0.04, seed=17))
params = Parameters(
    ref_sequences=[{fa!r}], out_file_name={out!r},
    kmer_size=11, seg_length=500, sketch_size=30,
    percentage_identity=0.8, skip_prefix=True, prefix_delim="#",
    num_mappings_for_segment=1, batch_fragments=64,
    shard_index={shard!r})
map_files(params)
"""


def _run(tmp_path, n_devices: int, shard: bool = False) -> str:
    fa = str(tmp_path / f"pan{n_devices}{int(shard)}.fa")
    out = str(tmp_path / f"out{n_devices}{int(shard)}.paf")
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}")
    env["JAX_PLATFORMS"] = "cpu"
    code = SCRIPT.format(repo=REPO, tests=HERE, fa=fa, out=out,
                         shard=shard)
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, env=env,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    assert f"DEVICES {n_devices}" in r.stdout, r.stdout
    with open(out) as fh:
        return fh.read()


@pytest.mark.slow
def test_mesh8_matches_single_device(tmp_path):
    single = _run(tmp_path, 1)
    mesh8 = _run(tmp_path, 8)
    assert single, "no mappings produced"
    assert mesh8 == single


@pytest.mark.slow
def test_mesh8_sharded_index_matches(tmp_path):
    """--shardIndex (hash-range-sharded postings) == replicated output."""
    single = _run(tmp_path, 1)
    sharded = _run(tmp_path, 8, shard=True)
    assert sharded == single
