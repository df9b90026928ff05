from .block_kernels import (
    chebyshev_coefficients,
    pallas_block_jacobi_multisweep,
    pallas_block_jacobi_multisweep_residual,
    pallas_block_jacobi_sweep,
    pallas_bt_matvec,
    pallas_chebyshev_multisweep,
    pallas_ff_stencil_mid_defect,
)

__all__ = [
    "chebyshev_coefficients",
    "pallas_block_jacobi_multisweep",
    "pallas_block_jacobi_multisweep_residual",
    "pallas_block_jacobi_sweep",
    "pallas_bt_matvec",
    "pallas_chebyshev_multisweep",
    "pallas_ff_stencil_mid_defect",
]
