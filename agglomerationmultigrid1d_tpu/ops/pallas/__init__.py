from .block_kernels import (
    pallas_block_jacobi_multisweep,
    pallas_block_jacobi_multisweep_residual,
    pallas_block_jacobi_sweep,
    pallas_bt_matvec,
)

__all__ = [
    "pallas_block_jacobi_multisweep",
    "pallas_block_jacobi_multisweep_residual",
    "pallas_block_jacobi_sweep",
    "pallas_bt_matvec",
]
