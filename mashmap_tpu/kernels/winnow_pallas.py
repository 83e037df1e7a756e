"""Pallas TPU kernel for the sliding bottom-s threshold (theta) scan.

The XLA lax.scan formulation (winnow.py) is HBM-bandwidth-bound: every
scan step round-trips the (C, s) sketch states and the (C, s, s)
rank-count cube through HBM, and the (S_B, C, s) suffix-sketch stack is
materialized. This kernel keeps everything in VMEM:

- grid over tiles of C_T block rows; cur/nxt tiles stream HBM -> VMEM
  once;
- backward pass stores suffix-sketch CHECKPOINTS every K offsets
  (ceil(S_B/K) x C_T x s, tiny);
- the forward pass rebuilds one K-offset segment of suffix sketches at
  a time into a VMEM scratch (K x C_T x s), then merges against the
  running prefix sketch and writes theta — the full suffix stack never
  exists.

Work: 3*S_B O(s) insertions + S_B O(s^2) rank-count merges per tile,
all on VPU registers/VMEM. The merge is the same scatter/sort-free
rank-count as the XLA path (winnow._merge_theta).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RSENT = np.int32(np.iinfo(np.int32).max)

C_T = 32          # block rows per grid program
SEG_K = 256       # checkpoint / segment length (offsets)


def _insert(state, v):
    """Insert (C_T, 1) values into sorted RSENT-padded (C_T, s) sets."""
    # NB: every reduction pins dtype=int32 — under jax_enable_x64 the
    # defaults are int64, which Mosaic does not lower.
    is_dup = jnp.any(state == v, axis=-1, keepdims=True)
    skip = is_dup | (v == RSENT)
    pos = jnp.sum((state < v).astype(jnp.int32), axis=-1,
                  keepdims=True, dtype=jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, state.shape, 1)
    shifted = jnp.concatenate([state[:, :1], state[:, :-1]], axis=-1)
    cand = jnp.where(lane < pos, state,
                     jnp.where(lane == pos, v, shifted))
    return jnp.where(skip, state, cand)


def _cumsum_lanes(x):
    """Inclusive prefix sum over the lane axis (Hillis-Steele shifts;
    the cumsum primitive has no Pallas TPU lowering)."""
    s = x.shape[-1]
    d = 1
    while d < s:
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[..., :d]), x[..., :-d]], axis=-1)
        x = x + shifted
        d *= 2
    return x


def _merge_theta(a, b, s):
    """s-th smallest distinct of two sorted (C_T, s) rank sets."""
    valid_a = a != RSENT
    valid_b = b != RSENT
    le_ba = (b[:, None, :] <= a[:, :, None]) & valid_b[:, None, :]
    eq_ba = (b[:, None, :] == a[:, :, None]) & valid_b[:, None, :]
    rB_a = jnp.sum(le_ba.astype(jnp.int32), axis=-1, dtype=jnp.int32)
    dup_a = jnp.any(eq_ba, axis=-1)
    csum_dup_a = _cumsum_lanes(dup_a.astype(jnp.int32))
    i = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1) + 1
    f_a = i + rB_a - csum_dup_a

    le_ab = (a[:, None, :] <= b[:, :, None]) & valid_a[:, None, :]
    eq_ab = (a[:, None, :] == b[:, :, None]) & valid_a[:, None, :]
    rA_b = jnp.sum(le_ab.astype(jnp.int32), axis=-1, dtype=jnp.int32)
    dup_b = jnp.any(eq_ab, axis=-1)
    csum_dup_b = _cumsum_lanes(dup_b.astype(jnp.int32))
    f_b = i + rA_b - csum_dup_b

    th_a = jnp.min(jnp.where((f_a == s) & valid_a, a, RSENT), axis=-1)
    th_b = jnp.min(jnp.where((f_b == s) & valid_b, b, RSENT), axis=-1)
    return jnp.minimum(th_a, th_b)      # (C_T,)


def _theta_kernel(cur_ref, nxt_ref, out_ref, ckpt_ref, seg_ref, s, s_b_p):
    n_seg = s_b_p // SEG_K
    empty = jnp.full((C_T, s), RSENT, jnp.int32)
    K = jnp.int32(SEG_K)

    # ---- pass 1: suffix-sketch checkpoints (backward over segments)
    def back_seg(m, state):
        seg = jnp.int32(n_seg - 1) - m

        def back_off(t, st):
            j = seg * K + (K - 1 - t)
            return _insert(st, cur_ref[:, pl.ds(j, 1)])

        state = jax.lax.fori_loop(jnp.int32(0), jnp.int32(SEG_K), back_off, state)
        ckpt_ref[pl.ds(seg, 1), :, :] = state[None]
        return state

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_seg), back_seg, empty)

    # ---- pass 2: forward prefix + merge, one segment at a time
    def fwd_seg(m, pre_state):
        # rebuild suffix sketches of segment m from checkpoint m+1
        nxt_ck = jax.lax.cond(
            m + 1 < jnp.int32(n_seg),
            lambda: ckpt_ref[pl.ds(m + 1, 1), :, :][0], lambda: empty)

        def rebuild(t, st):
            j_local = K - 1 - t
            st = _insert(st, cur_ref[:, pl.ds(m * K + j_local, 1)])
            seg_ref[pl.ds(j_local, 1), :, :] = st[None]
            return st

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(SEG_K), rebuild, nxt_ck)

        def fwd_off(t, pre):
            j = m * K + t
            out_ref[:, pl.ds(j, 1)] = _merge_theta(
                seg_ref[pl.ds(t, 1), :, :][0], pre, s)[:, None]
            return _insert(pre, nxt_ref[:, pl.ds(j, 1)])

        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(SEG_K), fwd_off, pre_state)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_seg), fwd_seg, empty)


@functools.partial(jax.jit, static_argnames=("s", "s_b", "interpret"))
def theta_chunk_pallas(cur: jax.Array, nxt: jax.Array, s: int, s_b: int,
                       interpret: bool = False) -> jax.Array:
    """theta ranks for (C, S_B) int32 block rows (C % C_T == 0)."""
    C = cur.shape[0]
    s_b_p = -(-s_b // SEG_K) * SEG_K
    if s_b_p > s_b:
        pad = jnp.full((C, s_b_p - s_b), RSENT, jnp.int32)
        cur = jnp.concatenate([cur, pad], axis=1)
        nxt = jnp.concatenate([nxt, pad], axis=1)
    n_seg = s_b_p // SEG_K

    kernel = functools.partial(_theta_kernel, s=s, s_b_p=s_b_p)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, s_b_p), jnp.int32),
        grid=(C // C_T,),
        in_specs=[
            pl.BlockSpec((C_T, s_b_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_T, s_b_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C_T, s_b_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_seg, C_T, s), jnp.int32),    # checkpoints
            pltpu.VMEM((SEG_K, C_T, s), jnp.int32),    # segment suffixes
        ],
        interpret=interpret,
    )(cur, nxt)
    return out[:, :s_b]
