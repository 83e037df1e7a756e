"""Hash-range-sharded index lookup == replicated-index l1_step.

Runs in a subprocess with 8 virtual CPU devices (device count is fixed
at process start)."""

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
import numpy as np
import jax.numpy as jnp
from genomes import pangenome
from mashmap_tpu.index.builder import build_index
from mashmap_tpu.kernels.mapdev import L1Config, l1_step, unpack_l1_meta
from mashmap_tpu.parallel.mesh import make_mesh
from mashmap_tpu.parallel.sharded_index import (
    build_sharded_index, l1_step_sharded)
from mashmap_tpu import stats
from mashmap_tpu.params import FIXED

assert len(jax.devices()) == 8, jax.devices()
k, w, s = 11, 500, 24
recs = pangenome(3, 12000, divergence=0.05, seed=23)
idx = build_index(recs, kmer_size=k, window_size=w, sketch_size=s)

B = 16
rng = np.random.default_rng(5)
frags = np.zeros((B, w), np.uint8)
cat = "".join(sq for _, sq in recs).encode()
for i in range(B):
    o = int(rng.integers(0, len(cat) - w))
    frags[i] = np.frombuffer(cat[o:o + w], np.uint8)

mh = np.ones(s + 1, np.int32)
for sq in range(1, s + 1):
    mh[sq] = max(1, stats.estimate_minimum_hits_relaxed(
        sq, k, 0.8, FIXED.confidence_interval))
ct = stats.sketch_cutoffs(s, k, 0.0, 0.999).astype(np.int32)
cfg = L1Config(k=k, s=s, seg_length=w, p_cap=512, c_cap=8, t_cap=128,
               table_scale=1.0, n_groups=8)
allowed = np.ones((B, idx.n_contigs), bool)
groups = np.zeros(idx.n_contigs, np.int32)
mi_key = jnp.asarray((idx.mi_seqid.astype(np.int64) << 32)
                     | idx.mi_wpos.astype(np.int64))

rep = l1_step(
    jnp.asarray(frags), jnp.asarray(idx.uniq_hashes),
    jnp.asarray(idx.post_offsets.astype(np.int32)),
    jnp.asarray(idx.post_seqid), jnp.asarray(idx.post_wpos),
    jnp.asarray(idx.post_wend), jnp.asarray(idx.is_frequent),
    jnp.asarray(mh), jnp.asarray(ct), jnp.asarray(allowed),
    jnp.asarray(groups), mi_key, cfg)

mesh = make_mesh(8)
sidx = build_sharded_index(idx, mesh)
shd = l1_step_sharded(
    jnp.asarray(frags), sidx.uniq, sidx.offsets, sidx.seqid,
    sidx.wpos, sidx.wend, sidx.frequent, jnp.asarray(mh),
    jnp.asarray(ct), jnp.asarray(allowed), jnp.asarray(groups),
    mi_key, cfg, mesh, sidx.p_shard)

a = unpack_l1_meta(np.asarray(rep), cfg.c_cap, s)
b = unpack_l1_meta(np.asarray(shd), cfg.c_cap, s)
for key in ("s_q", "n_cand", "overflow", "cand_seq", "cand_start",
            "cand_end", "cand_inter", "cand_lo", "cand_mid", "cand_hi",
            "q_hash", "q_strand"):
    np.testing.assert_array_equal(a[key], b[key], err_msg=key)
assert a["n_cand"].sum() > 0, "no candidates produced"
print("SHARDED OK", int(a["n_cand"].sum()))
"""


@pytest.mark.slow
def test_sharded_equals_replicated(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    code = SCRIPT.format(repo=REPO, tests=HERE)
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, env=env,
                       timeout=900)
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-3000:])
    assert "SHARDED OK" in r.stdout
