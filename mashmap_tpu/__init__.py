"""mashmap-tpu: a TPU-native approximate genome mapper.

A from-scratch reimplementation of the capabilities of MashMap3
(reference: marbl/MashMap v3.1.3) designed for TPU hardware:

- k-mer hashing and sketching run as batched JAX/XLA computations
  (MurmurHash3_x64_128 in uint64 lanes),
- the reference minmer-interval index is built with a block-decomposed
  sliding-window bottom-s threshold scan (``jax.lax.scan`` over fixed-size
  blocks, all blocks in parallel) instead of the reference's sequential
  deque/heap winnowing (reference: src/map/include/commonFunc.hpp:301-570),
- stage L1 candidate finding and stage L2 sliding Jaccard are vectorized
  sorted-array/cumsum/matmul formulations of the reference's interval-point
  sweeps (reference: src/map/include/computeMap.hpp:915-1451),
- multi-chip scaling is data-parallel over query fragments via
  ``jax.sharding``/``shard_map`` (the reference uses a pthread pool,
  src/map/include/ThreadPool.hpp).

Numerical parity targets the reference's PAF output (coordinates, strand,
``id:f`` ANI tag) on its own test workloads.
"""

import os

import jax

# Exact 64-bit hashing (MurmurHash3_x64_128) requires real uint64 lanes.
# TPU lowers u64 to u32 pairs; results are exact either way.
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache. The pipeline's kernels take tens of
# seconds to compile on TPU (and compile latency is highly variable on
# tunneled backends); the cache makes every process after the first pay
# ~nothing. Note: setting JAX_COMPILATION_CACHE_DIR in the environment is
# NOT sufficient with some PJRT plugins — the config API is.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.environ.get("XDG_CACHE_HOME",
                                    os.path.expanduser("~/.cache")),
                     "mashmap_tpu", "jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Backend override (e.g. MASHMAP_TPU_PLATFORM=cpu). Needed because some
# PJRT plugins in this environment register themselves regardless of
# JAX_PLATFORMS; the config API wins.
_plat = os.environ.get("MASHMAP_TPU_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)
del _plat

__version__ = "0.1.0"

from .params import Parameters, FIXED  # noqa: E402,F401


def map_files(params, index=None):
    """Library entry point: build/load the index and map the queries.

    See api.map_files; imported lazily so `import mashmap_tpu` stays
    cheap."""
    from .api import map_files as _mf
    return _mf(params, index)


def build_or_load_index(params):
    from .api import build_or_load_index as _b
    return _b(params)
