"""Solver analysis utilities mirroring the reference's smoother studies.

The reference's ``cg_smoother_test.jl:83-126`` / ``dg_smoother_test.jl:105-116``
build the dense smoother iteration matrix ``E = I - alpha S A``, inspect its
spectrum, and measure high-frequency damping on sine modes.  These helpers
reproduce those studies (host-side dense linear algebra; analysis only).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.block_tridiag import bt_to_dense
from ..ops.cg_operator import cg_to_dense
from ..smoothers.smoother import apply_smoother
from .hierarchy import CgLevel, Level


def level_dense_operator(level: Level) -> np.ndarray:
    a = level.a
    return np.asarray(cg_to_dense(a) if isinstance(level, CgLevel) else bt_to_dense(a))


def smoother_dense_matrix(level: Level) -> np.ndarray:
    """Materialize S by applying the smoother to the identity."""
    a_dense = level_dense_operator(level)
    n = a_dense.shape[0]
    if isinstance(level, CgLevel):
        shape = (n,)

        def to_vec(e):
            return jnp.asarray(e)

        def from_vec(y):
            return np.asarray(y)
    else:
        bs = level.a.block_size
        n_el = level.a.n_blocks

        def to_vec(e):
            return jnp.asarray(e.reshape(n_el, bs).T)

        def from_vec(y):
            return np.asarray(y).T.reshape(-1)

    cols = []
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        cols.append(from_vec(apply_smoother(level.smoother, to_vec(e))))
    return np.stack(cols, axis=1)


def smoother_iteration_matrix(level: Level, alpha: float = 2.0 / 3.0) -> np.ndarray:
    """``E = I - alpha S A`` (cf. ``cg_smoother_test.jl:111-117``)."""
    a = level_dense_operator(level)
    s = smoother_dense_matrix(level)
    return np.eye(a.shape[0]) - alpha * s @ a


def smoother_spectrum(level: Level, alpha: float = 2.0 / 3.0) -> np.ndarray:
    """Eigenvalues of the smoother iteration matrix, sorted by magnitude."""
    ev = np.linalg.eigvals(smoother_iteration_matrix(level, alpha))
    return ev[np.argsort(-np.abs(ev))]


def mode_damping(
    level: Level, modes: int = 10, sweeps: int = 10, alpha: float = 2.0 / 3.0
) -> np.ndarray:
    """Residual-norm reduction of sin(i pi x) error modes after ``sweeps``
    damped smoother applications (cf. ``cg_smoother_test.jl:83-109``).

    Returns ``(modes,)`` array of ||E^sweeps v_i|| / ||v_i||.
    """
    e_mat = smoother_iteration_matrix(level, alpha)
    n = e_mat.shape[0]
    x = np.linspace(0.0, 1.0, n)
    out = np.empty(modes)
    for i in range(1, modes + 1):
        v = np.sin(i * np.pi * x)
        w = v.copy()
        for _ in range(sweeps):
            w = e_mat @ w
        out[i - 1] = np.linalg.norm(w) / np.linalg.norm(v)
    return out
