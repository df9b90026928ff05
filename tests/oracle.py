"""Dense NumPy oracle of the reference's hierarchy builder + multigrid solver.

A deliberately-slow, cleverness-free transliteration of
``/root/reference/src/mesh_heirarchy.jl:30-181`` and
``/root/reference/src/solvers.jl:19-139`` over general dense matrices: coarse
operators by dense Galerkin triple products (G, D, C projected *separately*,
then recombined ``A = C - D M^-1 G`` with the coarse level's own mass),
smoothers as explicit dense matrices, the V-cycle and outer iteration as plain
Python loops.  Julia is not installed in this image, so this oracle is the
executable stand-in for the reference's solver behavior; the framework's
structured f64 path must reproduce its iteration counts exactly and residual
histories to float64 reduction-order noise (see tests/test_parity.py).

Inputs are discretization data only (fine operator + rhs, dense transfer
matrices, directly-assembled seam-level G/D/C, per-level masses) — everything
the *solver* does is recomputed here independently.
"""

from __future__ import annotations

import numpy as np


def jacobi_smoother(a: np.ndarray) -> np.ndarray:
    """Pointwise Jacobi S = diag(A)^-1 (``smoother.jl:52-58``)."""
    return np.diag(1.0 / np.diag(a))


def block_jacobi_smoother(a: np.ndarray, bs: int) -> np.ndarray:
    """Block Jacobi: S = blockdiag(inv(A_kk)) (``smoother.jl:64-81``)."""
    n = a.shape[0] // bs
    s = np.zeros_like(a)
    for k in range(n):
        sl = slice(k * bs, (k + 1) * bs)
        s[sl, sl] = np.linalg.inv(a[sl, sl])
    return s


def schwarz_smoother(a: np.ndarray, p: int, hybrid: bool) -> np.ndarray:
    """Additive / hybrid Schwarz over overlapping CG element blocks
    (``smoother.jl:1-46``; blocks = ``A[el.nodes, el.nodes]``, factory
    ``cg_smoother`` ``:88-139``).  Nodes are position-ordered here, so element
    ``e`` covers nodes ``[e p, e p + p]``; overlapping contributions are summed
    (additive) or divided by the node multiplicity (hybrid,
    ``mCountingMatrix``)."""
    n = a.shape[0]
    n_el = (n - 1) // p
    s = np.zeros_like(a)
    mult = np.zeros(n)
    for e in range(n_el):
        sl = slice(e * p, e * p + p + 1)
        s[sl, sl] += np.linalg.inv(a[sl, sl])
        mult[sl] += 1.0
    if hybrid:
        s = np.diag(1.0 / mult) @ s
    return s


def cg_oracle_smoother(a: np.ndarray, kind: str, p: int) -> np.ndarray:
    if kind == "jac":
        return jacobi_smoother(a)
    if kind in ("addSchwarz", "hybridSchwarz"):
        return schwarz_smoother(a, p, hybrid=kind == "hybridSchwarz")
    raise ValueError(kind)  # pragma: no cover


class OracleLevel:
    def __init__(self, a, smoother):
        self.a = a
        self.s = smoother


def build_oracle_hierarchy(spec: list[dict]) -> tuple[list[OracleLevel], list[np.ndarray]]:
    """Mirror ``MeshHierarchy`` (``mesh_heirarchy.jl:30-138`` CG-topped,
    ``:140-181`` DG-topped).

    ``spec`` is a fine->coarse list of level dicts:

    * ``{"type": "cg", "a": A}``                       — finest CG level (given A)
    * ``{"type": "cg", "l": L}``                       — CG p-coarsening: A = L^T A L
    * ``{"type": "block", "l": L, "bs": bs, "mass": M, "gdc": (G, D, C) | None,
         "a": A | None}``
        — DG/agg level.  First block level (seam or finest): ``gdc`` (and for a
          DG-topped finest level ``a``) assembled directly; deeper levels get
          G, D, C by dense Galerkin of the previous block level's and recombine
          with their OWN mass: ``A = C - D M^-1 G`` (``mesh_heirarchy.jl:79-84``).
    """
    levels: list[OracleLevel] = []
    transfers: list[np.ndarray] = []
    prev_gdc = None

    for k, lv in enumerate(spec):
        if lv["type"] == "cg":
            if k == 0:
                a = np.asarray(lv["a"], dtype=np.float64)
            else:
                l = np.asarray(lv["l"], dtype=np.float64)
                a = l.T @ levels[-1].a @ l
                transfers.append(l)
            kind = lv.get("smoother", "jac")
            levels.append(OracleLevel(a, cg_oracle_smoother(a, kind, lv.get("p", 0))))
        elif lv["type"] == "block":
            bs = lv["bs"]
            m = np.asarray(lv["mass"], dtype=np.float64)
            if lv.get("gdc") is not None:
                g, d, c = (np.asarray(x, dtype=np.float64) for x in lv["gdc"])
            else:
                l = np.asarray(lv["l"], dtype=np.float64)
                gf, df, cf = prev_gdc
                g, d, c = l.T @ gf @ l, l.T @ df @ l, l.T @ cf @ l
            if k > 0:
                transfers.append(np.asarray(lv["l"], dtype=np.float64))
            a = c - d @ np.linalg.solve(m, g)
            levels.append(OracleLevel(a, block_jacobi_smoother(a, bs)))
            prev_gdc = (g, d, c)
        else:  # pragma: no cover
            raise ValueError(lv["type"])
    return levels, transfers


def oracle_v_cycle(levels, transfers, u0, b, n_pre=3, n_post=3, alpha=2.0 / 3.0):
    """``multigrid_v_cycle`` (``solvers.jl:19-50``), dense."""
    n = len(levels)
    u = [None] * n
    rhs = [None] * n
    u[0], rhs[0] = u0.copy(), b

    for k in range(n - 1):
        a, s = levels[k].a, levels[k].s
        if k > 0:
            u[k] = np.zeros_like(rhs[k])
        for _ in range(n_pre):
            u[k] = u[k] + alpha * (s @ (rhs[k] - a @ u[k]))
        rhs[k + 1] = transfers[k].T @ (rhs[k] - a @ u[k])

    u[n - 1] = np.linalg.solve(levels[n - 1].a, rhs[n - 1])  # solvers.jl:39

    for k in range(n - 2, -1, -1):
        a, s = levels[k].a, levels[k].s
        u[k] = u[k] + transfers[k] @ u[k + 1]
        for _ in range(n_post):
            u[k] = u[k] + alpha * (s @ (rhs[k] - a @ u[k]))
    return u[0]


def oracle_multigrid(levels, transfers, x0, b, maxiter=100, tol=1e-10, **cycle_kw):
    """``multigrid`` (``solvers.jl:116-139``): V-cycles until
    ``||A x - b|| < tol * ||b||``; returns (x, iterations, res_history, err_history)."""
    a = levels[0].a
    u_exact = np.linalg.solve(a, b)
    norm_b = np.linalg.norm(b)
    x = x0.copy()
    res_h, err_h = [], []
    it = 0
    for _ in range(maxiter):
        x = oracle_v_cycle(levels, transfers, x, b, **cycle_kw)
        it += 1
        res = np.linalg.norm(a @ x - b)
        res_h.append(res)
        err_h.append(np.linalg.norm(x - u_exact))
        if res < tol * norm_b:
            break
    return x, it, np.asarray(res_h), np.asarray(err_h)
