"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the standard JAX approach to testing multi-chip code without a pod
(SURVEY.md section 4): tests never require TPU hardware.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache: kernel shapes repeat across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# In this environment an experimental TPU platform plugin overrides the
# JAX_PLATFORMS env var; force CPU through the config API instead (must
# happen before any backend is initialized).
import jax  # noqa: E402

if os.environ.get("MASHMAP_TPU_TEST_ON_TPU", "") != "1":
    jax.config.update("jax_platforms", "cpu")
