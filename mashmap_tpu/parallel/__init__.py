"""Multi-chip execution: mesh setup and data-parallel sharding."""

from .mesh import make_mesh, shard_fragments, replicate  # noqa: F401
