from .hierarchy import (
    BlockLevel,
    CgLevel,
    Hierarchy,
    build_dg_hierarchy,
    build_hierarchy,
    chebyshev_hierarchy,
)
from .analysis import (
    mode_damping,
    smoother_dense_matrix,
    smoother_iteration_matrix,
    smoother_spectrum,
)
from .problems import (
    Problem,
    poisson_cg_hierarchy,
    poisson_dg_cg_hierarchy,
    poisson_dg_hierarchy,
    poisson_full_hierarchy,
    poisson_scattered_hierarchy,
)
from .solvers import (
    make_low_precision_hierarchy,
    multigrid_mixed,
    MultigridResult,
    iterative_smoother_solve,
    level_matvec,
    mg_preconditioner,
    multigrid,
    multigrid_progressive,
    multigrid_true,
    transfer_prolong,
    transfer_restrict,
    v_cycle,
    v_cycle_ff,
)

__all__ = [name for name in dir() if not name.startswith("_")]
