from .shifts import shift
from .block_diag import (
    BlockDiag,
    bd_from_dense_blocks,
    bd_inverse,
    bd_matvec,
    bd_solve,
    bd_solve_mat,
    bd_to_dense,
    bd_to_dense_blocks,
)
from .block_tridiag import (
    BlockTridiag,
    bd_mul_bt,
    bt_add,
    bt_diag_blocks,
    bt_diagonal,
    bt_distance2_residual,
    bt_from_dense,
    bt_matvec,
    bt_mul_bd,
    bt_mul_bt,
    bt_scale,
    bt_sub,
    bt_to_dense,
    bt_zeros,
)
from .cg_operator import (
    CgOperator,
    assemble_band,
    cg_assembled_windows,
    cg_diagonal,
    cg_from_windows,
    cg_matvec,
    cg_node_multiplicity,
    cg_to_dense,
)
from .transfer_ops import (
    BlockProlong,
    CgProlong,
    SeamProlong,
    block_prolong_constant,
    bp_galerkin,
    bp_prolong,
    bp_restrict,
    cgp_galerkin,
    cgp_prolong,
    cgp_restrict,
    seam_prolong,
    seam_restrict,
)
from .block_penta import (
    BlockPenta,
    bp5_matvec,
    bp5_pair_merge,
    bp5_sub,
    bp5_to_dense,
    bt_as_penta,
    bt_mul_bt_full,
)
from .block_coo import (
    BlockCOO,
    bcoo_add,
    bcoo_coalesce,
    bcoo_diag_blocks,
    bcoo_from_bt,
    bcoo_matvec,
    bcoo_matvec_t,
    bcoo_scale_cols,
    bcoo_spgemm,
    bcoo_to_dense,
)
from .coarse_solve import (
    BTCoarseSolver,
    CoarseSolver,
    PaddedBTCoarseSolver,
    coarse_solve,
    make_bt_coarse_solver,
    make_coarse_solver,
    make_penta_coarse_solver,
)

__all__ = [name for name in dir() if not name.startswith("_")]
