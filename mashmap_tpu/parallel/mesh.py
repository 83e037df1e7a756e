"""Device mesh + sharding layout.

The reference's only parallelism is an order-preserving pthread pool with
one whole query sequence per task (ThreadPool.hpp:19-268). The TPU-native
equivalent (SURVEY.md section 2.3):

- query fragments are the batch axis -> pure data parallelism over a 1-D
  ``('data',)`` mesh (single-controller JAX; multi-host via
  jax.distributed uses the same code path);
- the reference index is replicated across chips (it fits HBM at default
  sampling; hash-range sharding + all-to-all is the planned scale path
  for --dense whole-human indexes);
- the only cross-chip communication is the host gather of per-fragment
  results — mapping is embarrassingly parallel until chain merging, which
  is a tiny host pass (the analog of the reference's output-ordering
  queue).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    from . import distributed
    # multi-process runs keep each process's mesh LOCAL: processes map
    # disjoint query shards (parallel/distributed.py), so arrays differ
    # per process and must never land on a cross-process sharding
    devices = (jax.local_devices() if distributed.context() is not None
               else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_fragments(mesh: Mesh) -> NamedSharding:
    """Fragments (B, L): batch axis split across chips."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    """Index arrays: replicated on every chip."""
    return NamedSharding(mesh, P())


def device_put_index(index, mesh: Mesh):
    """Place the device-side index arrays, replicated over the mesh."""
    import jax.numpy as jnp
    rep = replicate(mesh)
    return {
        "uniq_hashes": jax.device_put(jnp.asarray(index.uniq_hashes), rep),
        "post_offsets": jax.device_put(
            jnp.asarray(index.post_offsets.astype(np.int32)), rep),
        "post_seqid": jax.device_put(jnp.asarray(index.post_seqid), rep),
        "post_wpos": jax.device_put(jnp.asarray(index.post_wpos), rep),
        "post_wend": jax.device_put(jnp.asarray(index.post_wend), rep),
        "is_frequent": jax.device_put(jnp.asarray(index.is_frequent), rep),
        # no mi_key: the kernels synthesize (seqid << 32 | wpos) probe
        # keys from the columns below (mapdev.l2_slice_bounds)
        "mi_rank": jax.device_put(jnp.asarray(index.mi_rank), rep),
        "mi_wpos": jax.device_put(jnp.asarray(index.mi_wpos), rep),
        "mi_wend": jax.device_put(jnp.asarray(index.mi_wend), rep),
        "mi_strand": jax.device_put(jnp.asarray(index.mi_strand), rep),
        "mi_seqid": jax.device_put(jnp.asarray(index.mi_seqid), rep),
    }
