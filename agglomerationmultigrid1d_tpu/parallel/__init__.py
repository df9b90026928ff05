"""Multi-chip scaling: element-axis domain decomposition over a device mesh.

Populated by `halo` (ppermute neighbor exchange) and `distributed` (sharded
V-cycle / multigrid via shard_map).
"""

from .halo import halo_shift
from .distributed import (
    distributed_multigrid,
    distributed_v_cycle,
    fused_shard_spec,
    make_solver_mesh,
    shard_hierarchy,
)
from .sharded_kernels import sharded_chebyshev_multisweep, sharded_multisweep

__all__ = [
    "halo_shift",
    "make_solver_mesh",
    "shard_hierarchy",
    "fused_shard_spec",
    "distributed_v_cycle",
    "distributed_multigrid",
    "sharded_multisweep",
    "sharded_chebyshev_multisweep",
]
