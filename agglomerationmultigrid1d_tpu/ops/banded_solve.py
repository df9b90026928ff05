"""Host-side banded direct solves for observability and test oracles.

The reference computes its error history against ``u_exact = A \\ b`` with a
sparse LU (``src/solvers.jl:120``).  Every fine operator in this framework is
scalar-banded (CG DIA band of bandwidth ``p``; block-tridiagonal with block
size ``bs`` <=> scalar bandwidth ``2 bs - 1``), so the equivalent here is a
LAPACK banded solve (``scipy.linalg.solve_banded``, dgbsv) — O(n b^2) time and
O(n b) memory instead of the dense O(n^3)/O(n^2) a naive materialization pays.

Host/NumPy only: this is observability and test infrastructure, never the
solver hot path.
"""

from __future__ import annotations

import numpy as np

from .block_tridiag import BlockTridiag
from .cg_operator import CgOperator


def cg_banded_ab(a: CgOperator) -> tuple[int, np.ndarray]:
    """LAPACK banded storage ``ab[u + i - j, j] = A[i, j]`` from the DIA band."""
    band = np.asarray(a.band, dtype=np.float64)
    p, n = a.p, a.n_nodes
    ab = np.zeros((2 * p + 1, n))
    for off in range(-p, p + 1):
        # band[off + p, i] = A[i, i + off]  ->  ab[p - off, j] for j = i + off
        i = np.arange(max(0, -off), n - max(0, off))
        ab[p - off, i + off] = band[off + p, i]
    return p, ab


def bt_banded_ab(a: BlockTridiag) -> tuple[int, np.ndarray]:
    """LAPACK banded storage of the flattened block-tridiagonal operator
    (scalar row ``k * bs + i``), bandwidth ``2 bs - 1``."""
    bs, n = a.block_size, a.n_blocks
    u = 2 * bs - 1
    ab = np.zeros((2 * u + 1, n * bs))
    mats = {
        0: (np.asarray(a.diag, dtype=np.float64), np.arange(n)),
        -1: (np.asarray(a.lower, dtype=np.float64)[:, :, 1:], np.arange(1, n)),
        1: (np.asarray(a.upper, dtype=np.float64)[:, :, :-1], np.arange(n - 1)),
    }
    for d, (mat, ks) in mats.items():
        for i in range(bs):
            for j in range(bs):
                cols = (ks + d) * bs + j
                ab[u - d * bs + i - j, cols] = mat[i, j, :]
    return u, ab


def bp5_banded_ab(a) -> tuple[int, np.ndarray]:
    """LAPACK banded storage of a flattened :class:`~.block_penta.BlockPenta`
    (scalar bandwidth ``3 bs - 1``)."""
    bs, n = a.block_size, a.n_blocks
    u = 3 * bs - 1
    ab = np.zeros((2 * u + 1, n * bs))
    for d, mat in zip((-2, -1, 0, 1, 2), a):
        m = np.asarray(mat, dtype=np.float64)
        ks = np.arange(max(0, -d), n - max(0, d))
        for i in range(bs):
            for j in range(bs):
                cols = (ks + d) * bs + j
                ab[u - d * bs + i - j, cols] = m[i, j, ks]
    return u, ab


def banded_solve(u: int, ab: np.ndarray, b: np.ndarray) -> np.ndarray:
    from scipy.linalg import solve_banded

    return solve_banded((u, u), ab, b)


def fine_direct_solve(level, b_flat: np.ndarray) -> np.ndarray:
    """``A^-1 b`` for a hierarchy level's operator via the banded LAPACK solve.

    ``level`` is a ``CgLevel`` / ``BlockLevel`` (or anything exposing ``.a`` of
    type :class:`CgOperator` / :class:`BlockTridiag`); ``b_flat`` the flattened
    DoF vector.
    """
    from .block_penta import BlockPenta

    op = level.a
    if isinstance(op, CgOperator):
        u, ab = cg_banded_ab(op)
    elif isinstance(op, BlockTridiag):
        u, ab = bt_banded_ab(op)
    elif isinstance(op, BlockPenta):
        u, ab = bp5_banded_ab(op)
    else:  # pragma: no cover
        raise TypeError(f"unknown operator type {type(op)}")
    return banded_solve(u, ab, np.asarray(b_flat, dtype=np.float64))
