from .config import CycleParams, HierarchySpec, SolveParams
from .host import cpu_device, host_setup, on_host, to_accelerator
from .precision import hierarchy_astype, tree_astype
from .checkpoint import load_solver_state, save_solver_state
from .profiling import device_trace, nnz_per_second, sync, wall_timer

__all__ = [
    "CycleParams",
    "HierarchySpec",
    "SolveParams",
    "cpu_device",
    "host_setup",
    "on_host",
    "to_accelerator",
    "hierarchy_astype",
    "tree_astype",
    "load_solver_state",
    "save_solver_state",
    "device_trace",
    "nnz_per_second",
    "sync",
    "wall_timer",
]
