#!/usr/bin/env python
"""Probe whether the backend's compile service accepts parallel
requests — the gating fact for compile-prewarm threading.

Compiles N distinct XLA programs (sorts at different pow2 shapes, all
cache-cold) serially, then N more (different shapes again) from N
threads, and reports both wall times. If the parallel batch is
substantially faster than the serial one, MASHMAP_TPU_PREWARM_THREADS>1
and a build-kernel prewarm thread are worth wiring up; if the times
match, the tunnel serializes compiles and overlap can only come from
hiding them under real work.

Uses a throwaway compile cache so every compile is real.
"""

import os
import tempfile
import time

os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="jax_cache_probe_")

import jax                                      # noqa: E402
import jax.numpy as jnp                         # noqa: E402

N = 3


def make_job(log2n: int):
    def f(x):
        s = jax.lax.sort(x, dimension=-1)
        return jnp.cumsum(s) + jnp.flip(s)

    shape = jax.ShapeDtypeStruct((1 << log2n,), jnp.int32)
    return lambda: jax.jit(f).lower(shape).compile()


def main() -> None:
    jax.devices()                                # init backend first
    t0 = time.time()
    for i in range(N):
        make_job(16 + i)()
    serial = time.time() - t0
    print(f"serial   {N} compiles: {serial:.1f}s", flush=True)

    from concurrent.futures import ThreadPoolExecutor
    jobs = [make_job(24 + i) for i in range(N)]
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=N) as ex:
        for f in [ex.submit(j) for j in jobs]:
            f.result()
    par = time.time() - t0
    print(f"parallel {N} compiles: {par:.1f}s", flush=True)
    print(f"speedup: {serial / max(par, 1e-9):.2f}x "
          f"({'PARALLEL PAYS' if par < 0.7 * serial else 'serialized'})")


if __name__ == "__main__":
    main()
