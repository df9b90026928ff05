from .config import CycleParams, HierarchySpec, SolveParams

__all__ = ["CycleParams", "HierarchySpec", "SolveParams"]
