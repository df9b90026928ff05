"""Multi-chip scaling: element-axis domain decomposition over a device mesh.

Populated by `halo` (ppermute neighbor exchange) and `distributed` (sharded
V-cycle / multigrid via shard_map).
"""

from .halo import halo_shift
from .distributed import (
    distributed_multigrid,
    distributed_v_cycle,
    make_solver_mesh,
    shard_hierarchy,
)

__all__ = [
    "halo_shift",
    "make_solver_mesh",
    "shard_hierarchy",
    "distributed_v_cycle",
    "distributed_multigrid",
]
