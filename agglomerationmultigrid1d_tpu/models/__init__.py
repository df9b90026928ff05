from .hierarchy import (
    BlockLevel,
    CgLevel,
    Hierarchy,
    build_dg_hierarchy,
    build_hierarchy,
)
from .solvers import (
    MultigridResult,
    iterative_smoother_solve,
    level_matvec,
    mg_preconditioner,
    multigrid,
    transfer_prolong,
    transfer_restrict,
    v_cycle,
)

__all__ = [name for name in dir() if not name.startswith("_")]
