"""Multi-host (multi-process) launch path.

The reference is a single-process pthread program (its only parallel
runtime is the per-thread query loop, ThreadPool.hpp:19-268); the TPU
rebuild scales across hosts the way SURVEY.md §5 "Distributed
communication backend" prescribes: option (b) — replicate the index on
every host, shard the QUERY stream across processes, and gather the
per-process PAF parts on process 0 in input order. Within one process
the existing device mesh handles the local chips (pure DP); across
processes the only communication is the jax.distributed coordination
service (DCN) used for the end-of-run barrier — mapping itself is
embarrassingly parallel over queries.

Launch recipe (one process per host; also works single-host for
testing):

    MASHMAP_TPU_COORDINATOR=host0:12345 \
    MASHMAP_TPU_NUM_PROCS=4 MASHMAP_TPU_PROC_ID=<0..3> \
    python -m mashmap_tpu.cli -r ref.fa -q q.fa -o out.paf [...]

or the equivalent ``--coordinator/--numProcesses/--processId`` flags.
Every process reads the whole (replicated) reference and query files;
process p maps queries whose input ordinal i satisfies ``i % P == p``
and writes ``out.paf.part<p>``; after the barrier, process 0 merges the
parts into ``out.paf`` byte-identically to a single-process run.

Combining with ``--shardIndex`` is supported and is the intended
deployment when the index exceeds one chip's HBM: each process shards
the index across its OWN local mesh (hash-range postings + contig-range
L2 slabs over ICI) while the query stream stays sharded across
processes over DCN. Nothing changes in the launch recipe — just add
``--shardIndex``; tests/test_distributed.py asserts the 2-process x
4-local-device combination is byte-identical to a single replicated
process.

The index build is deterministic, so processes building it concurrently
get identical tables; for large references prefer building once with
``--saveIndex`` and launching with ``--loadIndex`` (only process 0
honors ``--saveIndex`` to avoid write races).
"""

from __future__ import annotations

import heapq
import logging
import os
import pickle
from dataclasses import dataclass
from typing import List, Optional

logger = logging.getLogger("mashmap_tpu.dist")

_CTX: Optional["DistContext"] = None


@dataclass(frozen=True)
class DistContext:
    process_id: int
    num_processes: int

    @property
    def is_primary(self) -> bool:
        return self.process_id == 0

    def owns_query(self, global_ordinal: int) -> bool:
        """Strided query ownership: deterministic, order-preserving,
        balanced for homogeneous query streams (the reference's
        ThreadPool hands queries out in the same round-robin spirit)."""
        return global_ordinal % self.num_processes == self.process_id

    def part_path(self, out_file_name: str, pid: int | None = None) -> str:
        p = self.process_id if pid is None else pid
        return f"{out_file_name}.part{p}"


def setup(coordinator: Optional[str] = None,
          num_processes: Optional[int] = None,
          process_id: Optional[int] = None) -> Optional[DistContext]:
    """Initialize the multi-process runtime (idempotent).

    Flag values take precedence over the MASHMAP_TPU_* environment
    variables. Returns None (single-process mode) unless a coordinator
    address is configured with >= 2 processes.
    """
    global _CTX
    if _CTX is not None:
        return _CTX
    coordinator = coordinator or os.environ.get("MASHMAP_TPU_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("MASHMAP_TPU_NUM_PROCS", "0") or 0)
    if process_id is None:
        process_id = int(os.environ.get("MASHMAP_TPU_PROC_ID", "-1"))
    if not coordinator or num_processes < 2:
        return None
    if not (0 <= process_id < num_processes):
        raise ValueError(
            f"processId {process_id} out of range for "
            f"{num_processes} processes")
    import jax
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    # processes compute on DISJOINT query shards: keep every array on
    # process-local devices so jax never applies its global-SPMD
    # "same value on each process" device_put semantics
    jax.config.update("jax_default_device", jax.local_devices()[0])
    _CTX = DistContext(process_id, num_processes)
    logger.info("multi-process runtime up: process %d/%d (coordinator %s)",
                process_id, num_processes, coordinator)
    return _CTX


def context() -> Optional[DistContext]:
    return _CTX


_BARRIER_SEQ: dict = {}


def barrier(tag: str) -> None:
    """Block until every process reaches this point.

    Uses the jax.distributed coordination-service barrier directly
    (DCN), NOT a device collective: ``sync_global_devices`` lowers to a
    psum whose CPU Gloo context initialization has a hard 30s key-value
    timeout — on a loaded host a peer still compiling its first program
    misses that window and the whole run dies (seen in CI). The
    coordination client is already connected (``setup``), needs no
    collective compile, and takes an explicit timeout
    (MASHMAP_TPU_BARRIER_TIMEOUT_S, default 1h — index builds are
    legitimately long). Barrier ids are sequence-numbered per tag; all
    processes execute the same barrier sequence by construction.
    """
    if _CTX is None:
        return
    _BARRIER_SEQ[tag] = seq = _BARRIER_SEQ.get(tag, 0) + 1
    timeout_ms = int(float(os.environ.get(
        "MASHMAP_TPU_BARRIER_TIMEOUT_S", "3600")) * 1000)
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    if client is None:  # pragma: no cover - setup() always connects
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)
        return
    client.wait_at_barrier(f"mashmap:{tag}:{seq}", timeout_ms)


def merge_paf_parts(out_file_name: str, ctx: DistContext) -> None:
    """Process-0 gather: k-way merge of per-process PAF parts.

    Part lines are ``<query_ordinal>\\t<paf...>``; parts are ascending
    in query ordinal (each process preserves input order), so a stable
    heap merge reproduces the exact single-process output order. All
    ties live within one part (one query maps on exactly one process).
    """
    if not ctx.is_primary:
        return
    paths = [ctx.part_path(out_file_name, p)
             for p in range(ctx.num_processes)]

    def keyed(fh):
        for line in fh:
            ordinal, _, rest = line.partition("\t")
            yield int(ordinal), rest

    handles = [open(p) for p in paths]
    try:
        with open(out_file_name, "w") as out:
            for _, rest in heapq.merge(*[keyed(fh) for fh in handles]):
                out.write(rest)
    finally:
        for fh in handles:
            fh.close()
    for p in paths:
        os.remove(p)


def dump_rows(path: str, rows: List) -> None:
    """Spill one process's buffered one-to-one rows for the gather."""
    with open(path, "wb") as fh:
        pickle.dump(rows, fh, protocol=pickle.HIGHEST_PROTOCOL)


def gather_rows(out_file_name: str, ctx: DistContext) -> List:
    """Process-0 gather of every process's buffered one-to-one rows,
    restored to the single-process emission order (rows are emitted
    grouped per query; a stable sort on query ordinal restores the
    global input order across parts)."""
    rows: List = []
    for p in range(ctx.num_processes):
        path = ctx.part_path(out_file_name, p) + ".rows"
        with open(path, "rb") as fh:
            rows.extend(pickle.load(fh))
        os.remove(path)
    rows.sort(key=lambda m: m.query_seq_id)
    return rows
