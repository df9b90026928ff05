from .smoother import (
    BlockJacobiSmoother,
    JacobiSmoother,
    SchwarzSmoother,
    Smoother,
    apply_smoother,
    cg_smoother,
    dg_smoother,
)

__all__ = [
    "BlockJacobiSmoother",
    "JacobiSmoother",
    "SchwarzSmoother",
    "Smoother",
    "apply_smoother",
    "cg_smoother",
    "dg_smoother",
]
