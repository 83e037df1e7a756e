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
mi_seqid_t = jnp.asarray(idx.mi_seqid)
mi_wpos_t = jnp.asarray(idx.mi_wpos)

rep, rep_qh, rep_qs = l1_step(
    jnp.asarray(frags), jnp.asarray(idx.uniq_hashes),
    jnp.asarray(idx.post_offsets.astype(np.int32)),
    jnp.asarray(idx.post_seqid), jnp.asarray(idx.post_wpos),
    jnp.asarray(idx.post_wend), jnp.asarray(idx.is_frequent),
    jnp.asarray(mh), jnp.asarray(ct), jnp.asarray(allowed),
    jnp.asarray(groups), mi_seqid_t, mi_wpos_t, cfg)

mesh = make_mesh(8)
sidx = build_sharded_index(idx, mesh)
shd, shd_qh, shd_qs = l1_step_sharded(
    jnp.asarray(frags), sidx.uniq, sidx.offsets, sidx.seqid,
    sidx.wpos, sidx.wend, sidx.frequent, jnp.asarray(mh),
    jnp.asarray(ct), jnp.asarray(allowed), jnp.asarray(groups),
    sidx.mi_key, sidx.mi_row0, sidx.key_bounds, cfg, mesh,
    sidx.p_shard)

a = unpack_l1_meta(np.asarray(rep), cfg.c_cap)
b = unpack_l1_meta(np.asarray(shd), cfg.c_cap)
for key in ("s_q", "n_cand", "overflow", "cand_seq", "cand_start",
            "cand_end", "cand_inter", "cand_lo", "cand_mid", "cand_hi"):
    np.testing.assert_array_equal(a[key], b[key], err_msg=key)
np.testing.assert_array_equal(np.asarray(rep_qh), np.asarray(shd_qh))
np.testing.assert_array_equal(np.asarray(rep_qs), np.asarray(shd_qs))
a["q_hash"] = np.asarray(rep_qh)
a["q_strand"] = np.asarray(rep_qs)
assert a["n_cand"].sum() > 0, "no candidates produced"

# ---- l2_step on the contig-range mi slabs == replicated l2_step
from mashmap_tpu.kernels.mapdev import l2_step, unpack_l2_runs
from mashmap_tpu.parallel.sharded_index import l2_step_sharded
from jax.sharding import NamedSharding, PartitionSpec

T = 128
n_sh = sidx.n_shards
work = []
for i in range(B):
    for j in range(int(a["n_cand"][i])):
        lo, mid, hi = (int(a["cand_lo"][i, j]), int(a["cand_mid"][i, j]),
                       int(a["cand_hi"][i, j]))
        if hi - lo <= T:
            work.append((i, j, lo, mid, hi))
assert work, "no L2 work items"
W = len(work)
w_lo = np.array([w_[2] for w_ in work], np.int32)
w_mid = np.array([w_[3] for w_ in work], np.int32)
w_hi = np.array([w_[4] for w_ in work], np.int32)
w_seq = np.array([int(a["cand_seq"][i, j]) for i, j, *_ in work], np.int32)
qh = np.stack([a["q_hash"][i] for i, *_ in work])
qs = np.stack([a["q_strand"][i] for i, *_ in work]).astype(np.int8)
sqv = np.array([int(a["s_q"][i]) for i, *_ in work], np.int32)

Mpad = 1 << (len(idx.mi_rank) - 1).bit_length()
def pad1(x, fill):
    out = np.full(Mpad, fill, x.dtype); out[:len(x)] = x; return out
ref_buf = l2_step(
    jnp.asarray(w_lo), jnp.asarray(w_mid), jnp.asarray(w_hi),
    jnp.asarray(w_seq), jnp.asarray(qh), jnp.asarray(qs),
    jnp.asarray(sqv),
    jnp.asarray(pad1(idx.mi_rank, np.int32(0))),
    jnp.asarray(pad1(idx.mi_wpos, np.int32(0))),
    jnp.asarray(pad1(idx.mi_wend, np.int32(0))),
    jnp.asarray(pad1(idx.mi_strand, np.int8(0))),
    jnp.asarray(pad1(idx.mi_seqid, np.int32(-1))),
    T, s)

bnds = sidx.mi_bounds
Wp = W
s_lo = np.zeros((n_sh, Wp), np.int32); s_mid = np.zeros((n_sh, Wp), np.int32)
s_hi = np.zeros((n_sh, Wp), np.int32); s_seq = np.zeros((n_sh, Wp), np.int32)
s_qh = np.full((n_sh, Wp, s), np.int32(2**31 - 1), np.int32)
s_qs = np.zeros((n_sh, Wp, s), np.int8); s_sq = np.ones((n_sh, Wp), np.int32)
slot_of = dict()
fill = [0] * n_sh
for r, (i, j, lo, mid, hi) in enumerate(work):
    d = min(max(int(np.searchsorted(bnds, lo, side="right")) - 1, 0), n_sh - 1)
    rr = fill[d]; fill[d] += 1
    row0 = int(bnds[d])
    s_lo[d, rr] = lo - row0; s_mid[d, rr] = mid - row0; s_hi[d, rr] = hi - row0
    s_seq[d, rr] = w_seq[r]; s_qh[d, rr] = qh[r]; s_qs[d, rr] = qs[r]
    s_sq[d, rr] = sqv[r]
    slot_of[r] = d * Wp + rr
shp = NamedSharding(mesh, PartitionSpec("data"))
sh_buf = l2_step_sharded(
    *(jax.device_put(x, shp) for x in
      (s_lo, s_mid, s_hi, s_seq, s_qh, s_qs, s_sq)),
    sidx.mi_rank, sidx.mi_wpos, sidx.mi_wend, sidx.mi_strand,
    sidx.mi_seqid, T, s, mesh)
sh_flat = np.asarray(sh_buf).reshape(n_sh * Wp, -1)
ref_np = np.asarray(ref_buf)
for r in range(W):
    np.testing.assert_array_equal(ref_np[r], sh_flat[slot_of[r]],
                                  err_msg="l2 row %d" % r)

# ---- --shardIndex Mapper replicates NO O(index) device arrays
from mashmap_tpu.params import Parameters
from mashmap_tpu.map.engine import Mapper
import tempfile, os as _os
fa = _os.path.join(tempfile.mkdtemp(), "r.fa")
from genomes import write_fasta
write_fasta(fa, recs)
prm = Parameters(ref_sequences=[fa], out_file_name="/dev/null",
                 kmer_size=k, seg_length=w, sketch_size=s,
                 shard_index=True).finalize()
mapper = Mapper(prm, idx)
dev = mapper._device_tables()
assert mapper._sharded_idx is not None
big = set(["uniq_hashes", "post_offsets", "post_seqid", "post_wpos",
           "post_wend", "is_frequent", "mi_rank", "mi_wpos", "mi_wend",
           "mi_strand", "mi_seqid", "mi_key"])
assert not (big & set(dev)), sorted(big & set(dev))

print("SHARDED OK", int(a["n_cand"].sum()), "l2rows", W)
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
