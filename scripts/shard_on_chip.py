# --shardIndex machinery on the REAL axon TPU chip (VERDICT item 5):
# builds a 1-device Mesh, runs l1_step_sharded + l2_step_sharded (the
# shard_map + psum + all_gather path) against the replicated kernels on
# a real workload and asserts identical outputs + prices the overhead.
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices())
assert jax.devices()[0].platform == "tpu"

from genomes import pangenome, write_fasta
from mashmap_tpu.params import Parameters
from mashmap_tpu.api import build_or_load_index
from mashmap_tpu.kernels.mapdev import (l1_step, l2_step, L1Config,
                                        unpack_l1_meta)
from mashmap_tpu.parallel.mesh import make_mesh
from mashmap_tpu.parallel.sharded_index import (
    build_sharded_index, l1_step_sharded, l2_step_sharded)
from mashmap_tpu.kernels import kmers
from mashmap_tpu import stats
from mashmap_tpu.params import FIXED
from mashmap_tpu.io import for_each_seq_in_file

fa = "/tmp/shard_chip_ref.fa"
if not os.path.exists(fa):
    write_fasta(fa, pangenome(2, 400_000, 0.04, seed=5))
p = Parameters(ref_sequences=[fa], out_file_name="/tmp/x.paf",
               percentage_identity=0.85).finalize()
idx = build_or_load_index(p)
k, s = p.kmer_size, p.sketch_size

B = 256
frags = np.full((B, p.seg_length), ord("N"), np.uint8)
i = 0
for name, seq in for_each_seq_in_file(fa):
    u8 = kmers.sanitize(seq.encode("ascii"))
    for st in range(0, len(seq) - p.seg_length + 1, p.seg_length):
        if i < B:
            frags[i] = u8[st:st + p.seg_length]; i += 1
print("fragments:", i)

mh = np.ones(s + 1, np.int32)
for sq in range(1, s + 1):
    mh[sq] = max(1, stats.estimate_minimum_hits_relaxed(
        sq, k, 0.85, FIXED.confidence_interval))
ct = stats.sketch_cutoffs(min(s, 1000), k, 0.0, 0.999).astype(np.int32)
cfg = L1Config(k=k, s=s, seg_length=p.seg_length, p_cap=1024, c_cap=16,
               t_cap=2048, table_scale=1.0, n_groups=1)
NC = idx.n_contigs
allowed = np.ones((B, NC), bool)
groups = np.zeros(NC, np.int32)

def pad1(x, n, fill):
    out = np.full(n, fill, x.dtype); out[:len(x)] = x; return out

Mp = 1 << (len(idx.mi_rank) - 1).bit_length()
Up = 1 << (len(idx.uniq_hashes) - 1).bit_length()
Pp = 1 << (len(idx.post_seqid) - 1).bit_length()
uniq = jnp.asarray(pad1(idx.uniq_hashes, Up, np.uint64(2**64 - 1)))
po = jnp.asarray(pad1(idx.post_offsets.astype(np.int32), Up + 1,
                      np.int32(len(idx.post_seqid))))
pseq = jnp.asarray(pad1(idx.post_seqid, Pp, np.int32(0)))
pwp = jnp.asarray(pad1(idx.post_wpos, Pp, np.int32(0)))
pwe = jnp.asarray(pad1(idx.post_wend, Pp, np.int32(0)))
isf = jnp.asarray(pad1(idx.is_frequent, Up, False))
mi_seqid = jnp.asarray(pad1(idx.mi_seqid, Mp, np.int32(2**31 - 1)))
mi_wpos = jnp.asarray(pad1(idx.mi_wpos, Mp, np.int32(0)))
mi_rank = jnp.asarray(pad1(idx.mi_rank, Mp, np.int32(0)))
mi_wend = jnp.asarray(pad1(idx.mi_wend, Mp, np.int32(0)))
mi_strand = jnp.asarray(pad1(idx.mi_strand, Mp, np.int8(0)))

t0 = time.time()
rep, rep_qh, rep_qs = l1_step(
    jnp.asarray(frags), uniq, po, pseq, pwp, pwe, isf,
    jnp.asarray(mh), jnp.asarray(ct), jnp.asarray(allowed),
    jnp.asarray(groups), mi_seqid, mi_wpos, cfg)
rep = np.asarray(rep)
print(f"replicated l1 (incl compile): {time.time()-t0:.1f}s")

mesh = make_mesh(1)
sidx = build_sharded_index(idx, mesh)
t0 = time.time()
shd, shd_qh, shd_qs = l1_step_sharded(
    jnp.asarray(frags), sidx.uniq, sidx.offsets, sidx.seqid,
    sidx.wpos, sidx.wend, sidx.frequent, jnp.asarray(mh),
    jnp.asarray(ct), jnp.asarray(allowed), jnp.asarray(groups),
    sidx.mi_key, sidx.mi_row0, sidx.key_bounds, cfg, mesh, sidx.p_shard)
shd = np.asarray(shd)
t_compile = time.time() - t0
print(f"SHARDED l1 via shard_map+psum+all_gather on axon "
      f"(incl compile): {t_compile:.1f}s")

a = unpack_l1_meta(rep, cfg.c_cap)
b = unpack_l1_meta(shd, cfg.c_cap)
for key in ("s_q", "n_cand", "overflow", "cand_seq", "cand_start",
            "cand_end", "cand_inter", "cand_lo", "cand_mid", "cand_hi"):
    np.testing.assert_array_equal(a[key], b[key], err_msg=key)
np.testing.assert_array_equal(np.asarray(rep_qh), np.asarray(shd_qh))
np.testing.assert_array_equal(np.asarray(rep_qs), np.asarray(shd_qs))
print("l1 sharded == replicated: IDENTICAL")

# steady-state timing
def sync(x): jax.device_get(x.ravel()[:1])
for label, fn in (
    ("replicated l1 steady", lambda: l1_step(
        jnp.asarray(frags), uniq, po, pseq, pwp, pwe, isf,
        jnp.asarray(mh), jnp.asarray(ct), jnp.asarray(allowed),
        jnp.asarray(groups), mi_seqid, mi_wpos, cfg)[0]),
    ("sharded    l1 steady", lambda: l1_step_sharded(
        jnp.asarray(frags), sidx.uniq, sidx.offsets, sidx.seqid,
        sidx.wpos, sidx.wend, sidx.frequent, jnp.asarray(mh),
        jnp.asarray(ct), jnp.asarray(allowed), jnp.asarray(groups),
        sidx.mi_key, sidx.mi_row0, sidx.key_bounds, cfg, mesh,
        sidx.p_shard)[0])):
    r = fn(); sync(r)
    t0 = time.time()
    for _ in range(5): r = fn()
    sync(r)
    print(f"{label}: {(time.time()-t0)/5*1000:.1f} ms")

# l2 sharded vs replicated on real L1 work items
work = []
T = 2048
for i in range(B):
    for j in range(int(a["n_cand"][i])):
        lo, mid, hi = (int(a["cand_lo"][i, j]), int(a["cand_mid"][i, j]),
                       int(a["cand_hi"][i, j]))
        if hi - lo <= T and hi > lo:
            work.append((i, j, lo, mid, hi))
W = len(work)
print("l2 work items:", W)
w_lo = np.array([w[2] for w in work], np.int32)
w_mid = np.array([w[3] for w in work], np.int32)
w_hi = np.array([w[4] for w in work], np.int32)
w_seq = np.array([int(a["cand_seq"][i, j]) for i, j, *_ in work], np.int32)
qh = np.asarray(rep_qh)[[i for i, *_ in work]]
qs = np.asarray(rep_qs)[[i for i, *_ in work]].astype(np.int8)
sqv = np.asarray(a["s_q"])[[i for i, *_ in work]].astype(np.int32)
ref_buf = np.asarray(l2_step(
    jnp.asarray(w_lo), jnp.asarray(w_mid), jnp.asarray(w_hi),
    jnp.asarray(w_seq), jnp.asarray(qh), jnp.asarray(qs),
    jnp.asarray(sqv), mi_rank, mi_wpos, mi_wend, mi_strand,
    jnp.asarray(pad1(idx.mi_seqid, Mp, np.int32(-1))), T, s))
bnds = sidx.mi_bounds
row0 = int(bnds[0])   # 1 shard
buf = np.asarray(l2_step_sharded(
    jnp.asarray((w_lo - row0)[None]), jnp.asarray((w_mid - row0)[None]),
    jnp.asarray((w_hi - row0)[None]), jnp.asarray(w_seq[None]),
    jnp.asarray(qh[None]), jnp.asarray(qs[None]), jnp.asarray(sqv[None]),
    sidx.mi_rank, sidx.mi_wpos, sidx.mi_wend, sidx.mi_strand,
    sidx.mi_seqid, T, s, mesh)).reshape(W, -1)
np.testing.assert_array_equal(ref_buf, buf)
print("l2 sharded == replicated: IDENTICAL")
print("SHARD-ON-CHIP: PASS")
