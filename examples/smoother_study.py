"""Smoother analysis (mirrors tests/cg_smoother_test.jl).

(a) Richardson-with-smoother solve of -u'' = 1; (b) damping of sin(i pi x)
modes after 10 sweeps; (c) spectral radius of I - alpha S A.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo root


import numpy as np
import jax.numpy as jnp

from agglomerationmultigrid1d_tpu.assembly import cg_stiffness_and_rhs
from agglomerationmultigrid1d_tpu.mesh import BoundaryCondition, create_uniform_mesh, make_cg_mesh
from agglomerationmultigrid1d_tpu.models import iterative_smoother_solve, mode_damping, smoother_spectrum
from agglomerationmultigrid1d_tpu.models.hierarchy import CgLevel
from agglomerationmultigrid1d_tpu.smoothers import cg_smoother
from agglomerationmultigrid1d_tpu.utils import on_host


def main():
    with on_host():
        cg = make_cg_mesh(create_uniform_mesh(16, 0.0, 1.0), 2)
        bc = BoundaryCondition(("dir", 0.0), ("dir", 0.0))
        a, f = cg_stiffness_and_rhs(cg, lambda x: jnp.ones_like(x), bc)
        for kind, alpha in [("jac", 2 / 3), ("addSchwarz", 1 / 3), ("hybridSchwarz", 2 / 3)]:
            level = CgLevel(a=a, smoother=cg_smoother(a, kind))
            res = iterative_smoother_solve(level, jnp.zeros_like(f), f,
                                           maxiter=20000, tol=1e-8, alpha=alpha)
            print(f"{kind:15s}: {int(res.iterations)} Richardson iterations")
            rho = np.abs(smoother_spectrum(level, alpha)[0])
            damp = mode_damping(level, modes=8, sweeps=10, alpha=alpha)
            print(f"{'':15s}  spectral radius {rho:.4f}; "
                  f"mode damping (i=1..8): {np.array2string(damp, precision=3)}")


if __name__ == "__main__":
    main()
