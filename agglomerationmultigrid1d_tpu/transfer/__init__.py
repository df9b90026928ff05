from .interpolation import (
    cg_cg_interpolation2,
    dg_dg_interpolation2,
    aggdg_aggdg_interpolation,
    aggdg_cg_interpolation,
    aggdg_cg_interpolation_dense,
    aggdg_dg_interpolation,
    aggdg_dg_interpolation2,
    cg_cg_interpolation,
    dg_cg_interpolation,
    dg_cg_interpolation_dense,
    dg_dg_interpolation,
)
from .scattered_transfer import (
    ScatteredProlong,
    scattered_dg_interpolation,
    scattered_galerkin,
    scattered_scattered_interpolation,
    sp_prolong,
    sp_restrict,
)

__all__ = [name for name in dir() if not name.startswith("_")]
