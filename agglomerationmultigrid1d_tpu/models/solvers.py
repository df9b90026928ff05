"""Multigrid V-cycle and outer drivers (counterpart of ``src/solvers.jl``).

The V-cycle (``solvers.jl:19-50``) is a pure jittable function: the level count
and all shapes are static, so the cycle unrolls into one fused XLA program.  The
outer ``multigrid`` driver (``solvers.jl:116-139``) runs a ``lax.while_loop``
with a device-side convergence check and fixed-length masked residual / error
histories, preserving the reference's observability contract
``(x, iter, res, err)``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.block_tridiag import bt_matvec
from ..ops.cg_operator import cg_matvec
from ..ops.coarse_solve import coarse_solve
from ..ops.transfer_ops import (
    BlockProlong,
    CgProlong,
    SeamProlong,
    bp_prolong,
    bp_restrict,
    cgp_prolong,
    cgp_restrict,
    seam_prolong,
    seam_restrict,
)
from ..smoothers.smoother import apply_smoother
from .hierarchy import BlockLevel, CgLevel, Hierarchy


def level_matvec(level, x):
    if isinstance(level, CgLevel):
        return cg_matvec(level.a, x)
    return bt_matvec(level.a, x)


def transfer_prolong(l, xc):
    if isinstance(l, CgProlong):
        return cgp_prolong(l, xc)
    if isinstance(l, BlockProlong):
        return bp_prolong(l, xc)
    if isinstance(l, SeamProlong):
        return seam_prolong(l, xc)
    raise TypeError(type(l))


def transfer_restrict(l, rf):
    if isinstance(l, CgProlong):
        return cgp_restrict(l, rf)
    if isinstance(l, BlockProlong):
        return bp_restrict(l, rf)
    if isinstance(l, SeamProlong):
        return seam_restrict(l, rf)
    raise TypeError(type(l))


def _flatten_level_vec(x):
    """Level vector -> flat DoF vector (block levels: dof = k * bs + i)."""
    if x.ndim == 1:
        return x
    return x.T.reshape(-1)


def _unflatten_level_vec(flat, like):
    if like.ndim == 1:
        return flat
    bs, n = like.shape
    return flat.reshape(n, bs).T


def _smooth_n(level, u, rhs, n_sweeps, alpha, use_pallas):
    """``n_sweeps`` damped smoother applications ``u += alpha S (rhs - A u)``.

    On block levels with a block-Jacobi smoother and f32 data, all sweeps fuse
    into ONE temporally-blocked Pallas pass over HBM (~n_sweeps x the effective
    throughput of the sweep-at-a-time formulation)."""
    from ..smoothers.smoother import BlockJacobiSmoother

    if (
        use_pallas
        and isinstance(level, BlockLevel)
        and isinstance(level.smoother, BlockJacobiSmoother)
        and u.dtype == jnp.float32
    ):
        from ..ops.pallas import pallas_block_jacobi_multisweep

        return pallas_block_jacobi_multisweep(
            level.a, level.smoother.inv, u, rhs, n_sweeps=n_sweeps, alpha=alpha
        )
    for _ in range(n_sweeps):
        u = u + apply_smoother(level.smoother, rhs - level_matvec(level, u), alpha=alpha)
    return u


def _level_matvec_opt(level, x, use_pallas):
    if use_pallas and isinstance(level, BlockLevel) and x.dtype == jnp.float32:
        from ..ops.pallas import pallas_bt_matvec

        return pallas_bt_matvec(level.a, x)
    return level_matvec(level, x)


def v_cycle(
    h: Hierarchy,
    x0: jax.Array,
    b: jax.Array,
    *,
    n_pre: int = 3,
    n_post: int = 3,
    alpha: float = 2.0 / 3.0,
    use_pallas: bool = False,
) -> jax.Array:
    """One multigrid V-cycle (cf. ``solvers.jl:19-50``)."""
    n = h.n_levels
    u = [None] * n
    rhs = [None] * n
    u[0], rhs[0] = x0, b

    for k in range(n - 1):
        level = h.levels[k]
        if k > 0:
            u[k] = jnp.zeros_like(rhs[k])
        u[k] = _smooth_n(level, u[k], rhs[k], n_pre, alpha, use_pallas)
        rhs[k + 1] = transfer_restrict(
            h.transfers[k], rhs[k] - _level_matvec_opt(level, u[k], use_pallas)
        )

    # coarsest level: replicated dense direct solve (cf. solvers.jl:39)
    flat = _flatten_level_vec(rhs[n - 1])
    u[n - 1] = _unflatten_level_vec(coarse_solve(h.coarse, flat), rhs[n - 1])

    for k in range(n - 2, -1, -1):
        level = h.levels[k]
        u[k] = u[k] + transfer_prolong(h.transfers[k], u[k + 1])
        u[k] = _smooth_n(level, u[k], rhs[k], n_post, alpha, use_pallas)
    return u[0]


def mg_preconditioner(h: Hierarchy, b: jax.Array, **kw) -> jax.Array:
    """One V-cycle from a zero initial guess (the reference's ``ldiv!`` interface,
    ``solvers.jl:63-92``)."""
    return v_cycle(h, jnp.zeros_like(b), b, **kw)


class MultigridResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array  # scalar int
    res_history: jax.Array  # (maxiter,), NaN beyond `iterations`
    err_history: jax.Array  # (maxiter,), NaN beyond `iterations` (or all-NaN)


def _dense_fine_solve(h: Hierarchy, b: jax.Array) -> jax.Array:
    """Host-side direct solve of the finest operator (the reference's
    ``u_exact = A \\ b``, ``solvers.jl:120``).  Done through NumPy because the
    TPU backend has no f64 LU; this is observability-only, never the hot path."""
    import numpy as np

    from ..ops.block_tridiag import bt_to_dense
    from ..ops.cg_operator import cg_to_dense

    fine = h.levels[0]
    a_dense = cg_to_dense(fine.a) if isinstance(fine, CgLevel) else bt_to_dense(fine.a)
    sol = np.linalg.solve(np.asarray(a_dense), np.asarray(_flatten_level_vec(b)))
    return jnp.asarray(sol)


def multigrid(
    h: Hierarchy,
    x0: jax.Array,
    b: jax.Array,
    maxiter: int = 100,
    tol: float = 1e-10,
    *,
    n_pre: int = 3,
    n_post: int = 3,
    alpha: float = 2.0 / 3.0,
    compute_error: bool = True,
) -> MultigridResult:
    """Outer V-cycle iteration until ``||Ax - b|| < tol * ||b||`` (``solvers.jl:116-139``).

    ``err_history`` tracks ``||x - A^-1 b||`` against a dense direct solve of the
    finest operator, like the reference; disable via ``compute_error`` for large
    problems (the reference has no such guard — it always pays the sparse solve).
    """
    u_exact = _dense_fine_solve(h, b) if compute_error else None
    return _multigrid_loop(
        h, x0, b, u_exact, maxiter=maxiter, tol=tol, n_pre=n_pre, n_post=n_post, alpha=alpha
    )


@functools.partial(jax.jit, static_argnames=("maxiter", "n_pre", "n_post", "alpha"))
def _multigrid_loop(
    h: Hierarchy,
    x0: jax.Array,
    b: jax.Array,
    u_exact,
    *,
    maxiter: int,
    tol,
    n_pre: int,
    n_post: int,
    alpha: float,
) -> MultigridResult:
    fine = h.levels[0]
    norm_b = jnp.linalg.norm(_flatten_level_vec(b))
    nan = jnp.full((maxiter,), jnp.nan, dtype=norm_b.dtype)

    def body(state):
        x, i, res_h, err_h, _ = state
        x = v_cycle(h, x, b, n_pre=n_pre, n_post=n_post, alpha=alpha)
        res = jnp.linalg.norm(_flatten_level_vec(level_matvec(fine, x) - b))
        res_h = res_h.at[i].set(res)
        if u_exact is not None:
            err_h = err_h.at[i].set(jnp.linalg.norm(_flatten_level_vec(x) - u_exact))
        converged = res < tol * norm_b
        return x, i + 1, res_h, err_h, converged

    def cond(state):
        _, i, _, _, converged = state
        return jnp.logical_and(i < maxiter, jnp.logical_not(converged))

    x, it, res_h, err_h, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.array(0), nan, nan, jnp.array(False))
    )
    return MultigridResult(x=x, iterations=it, res_history=res_h, err_history=err_h)


def iterative_smoother_solve(
    level,
    x0: jax.Array,
    b: jax.Array,
    *,
    maxiter: int = 1000,
    tol: float = 1e-6,
    alpha: float = 1.0,
) -> MultigridResult:
    """Pure Richardson-with-smoother iteration (``solvers.jl:189-213``)."""
    import numpy as np

    from ..ops.block_tridiag import bt_to_dense
    from ..ops.cg_operator import cg_to_dense

    a_dense = cg_to_dense(level.a) if isinstance(level, CgLevel) else bt_to_dense(level.a)
    u_exact = jnp.asarray(
        np.linalg.solve(np.asarray(a_dense), np.asarray(_flatten_level_vec(b)))
    )
    norm_b = jnp.linalg.norm(_flatten_level_vec(b))
    nan = jnp.full((maxiter,), jnp.nan, dtype=norm_b.dtype)

    def body(state):
        x, i, res_h, err_h, _ = state
        x = x + apply_smoother(level.smoother, b - level_matvec(level, x), alpha=alpha)
        res = jnp.linalg.norm(_flatten_level_vec(level_matvec(level, x) - b))
        res_h = res_h.at[i].set(res)
        err_h = err_h.at[i].set(jnp.linalg.norm(_flatten_level_vec(x) - u_exact))
        return x, i + 1, res_h, err_h, res < tol * norm_b

    def cond(state):
        _, i, _, _, converged = state
        return jnp.logical_and(i < maxiter, jnp.logical_not(converged))

    x, it, res_h, err_h, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.array(0), nan, nan, jnp.array(False))
    )
    return MultigridResult(x=x, iterations=it, res_history=res_h, err_history=err_h)


# ---------------------------------------------------------------------------
# Mixed precision: f32 fast-path V-cycle inside an f64 defect-correction loop
# ---------------------------------------------------------------------------


def make_low_precision_hierarchy(h: Hierarchy, dtype=jnp.float32) -> Hierarchy:
    """Cast a hierarchy for use as the inner preconditioner of
    :func:`multigrid_mixed` (see ``utils.precision``)."""
    from ..utils.precision import hierarchy_astype

    return hierarchy_astype(h, dtype)


@jax.jit
def _mixed_defect(fine, x, b):
    r = b - level_matvec(fine, x)
    return r, jnp.linalg.norm(_flatten_level_vec(r))


@functools.partial(jax.jit, static_argnames=("n_pre", "n_post", "alpha", "use_pallas"))
def _mixed_inner(h_low, r, *, n_pre, n_post, alpha, use_pallas):
    return v_cycle(
        h_low, jnp.zeros_like(r), r,
        n_pre=n_pre, n_post=n_post, alpha=alpha, use_pallas=use_pallas,
    )


@jax.jit
def _mixed_update(x, e):
    return x + e.astype(x.dtype)


def multigrid_mixed(
    h: Hierarchy,
    h_low: Hierarchy,
    x0: jax.Array,
    b: jax.Array,
    maxiter: int = 100,
    tol: float = 1e-10,
    *,
    n_pre: int = 3,
    n_post: int = 3,
    alpha: float = 2.0 / 3.0,
    use_pallas: bool = True,
) -> MultigridResult:
    """Defect-correction multigrid: residuals and updates in f64, the V-cycle
    itself in f32 (Pallas fast path).  Converges to the same 1e-10 relative
    residuals as the all-f64 iteration because the inner cycle only serves as a
    preconditioner — this is the TPU answer to the reference's reliance on
    double-precision solvers (SURVEY §7 hard part 1).

    The outer loop runs on the host over three small module-level jitted
    programs (f64 defect, f32 V-cycle, f64 update): compiling both precisions
    into one fused while_loop module is pathologically slow on the remote TPU
    toolchain, and the per-iteration host sync is one scalar.
    """
    import numpy as np

    low_dtype = jax.tree_util.tree_leaves(h_low.levels[0].a)[0].dtype
    fine = h.levels[0]
    kw = dict(n_pre=n_pre, n_post=n_post, alpha=alpha, use_pallas=use_pallas)

    norm_b = float(jnp.linalg.norm(_flatten_level_vec(b)))
    res_h = np.full((maxiter,), np.nan)
    err_h = np.full((maxiter,), np.nan)
    x = x0
    it = 0
    for i in range(maxiter):
        r, _ = _mixed_defect(fine, x, b)
        e = _mixed_inner(h_low, r.astype(low_dtype), **kw)
        x = _mixed_update(x, e)
        _, res = _mixed_defect(fine, x, b)
        res = float(res)
        res_h[i] = res
        it = i + 1
        if res < tol * norm_b:
            break
    return MultigridResult(
        x=x,
        iterations=jnp.array(it),
        res_history=jnp.asarray(res_h),
        err_history=jnp.asarray(err_h),
    )
