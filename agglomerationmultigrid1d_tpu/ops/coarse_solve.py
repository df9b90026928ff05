"""Coarsest-level direct solve (replaces the reference's UMFPACK ``A \\ b``).

The coarsest level of every hierarchy is tiny (a few to a few hundred DoFs).
The TPU backend has no f64 LU, so we factorize on the host once at setup and
carry the **explicit inverse**; the in-cycle solve is then a dense matvec (MXU
-friendly) followed by one step of iterative refinement, which restores
LU-solve-level accuracy even for the penalty-dominated (CDir = 1000 n) agg
coarse operators.  Under multi-chip sharding this level is replicated.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CoarseSolver(NamedTuple):
    a_dense: jax.Array  # (n, n)
    a_inv: jax.Array  # (n, n) host-computed inverse

    @property
    def n(self) -> int:
        return self.a_dense.shape[0]


def make_coarse_solver(a_dense: jax.Array) -> CoarseSolver:
    inv = np.linalg.inv(np.asarray(a_dense))
    return CoarseSolver(a_dense=jnp.asarray(a_dense), a_inv=jnp.asarray(inv))


def coarse_solve(f: CoarseSolver, b: jax.Array) -> jax.Array:
    """``A^-1 b`` with one iterative-refinement correction."""
    x = f.a_inv @ b
    r = b - f.a_dense @ x
    return x + f.a_inv @ r
