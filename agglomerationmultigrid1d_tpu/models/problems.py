"""Canonical problem setups mirroring the reference's driver scripts.

The reference has no API layer above the hierarchy — its ``tests/*.jl`` scripts
double as the user interface (SURVEY layer L8).  These builders reproduce those
configurations as one-call constructors:

* :func:`poisson_cg_hierarchy`      — ``tests/cg_heirarchy_test.jl``
* :func:`poisson_dg_cg_hierarchy`   — ``tests/dg_cg_heirarchy_test.jl``
* :func:`poisson_dg_hierarchy`      — ``tests/dg_heirarchy_test.jl``
* :func:`poisson_full_hierarchy`    — ``tests/full_heirarchy_test.jl``

Model problem: -u'' = cos(x) on [0, 1], u = cos (mixed Neumann/Dirichlet ends).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..assembly.cg_assembly import cg_stiffness_and_rhs
from ..assembly.dg_assembly import dg_flux_operators, dg_flux_rhs
from ..mesh.agg_mesh import coarsen_agg_mesh, make_agg_mesh
from ..mesh.cg_mesh import make_cg_mesh
from ..mesh.dg_mesh import make_dg_mesh
from ..mesh.topology import BoundaryCondition, create_uniform_mesh
from ..ops.block_diag import bd_matvec
from ..ops.block_tridiag import bt_matvec
from ..utils.config import CycleParams, HierarchySpec, SolveParams
from ..utils.host import host_setup, to_accelerator
from .hierarchy import Hierarchy, build_dg_hierarchy, build_hierarchy, schur_stiffness


@dataclasses.dataclass(frozen=True)
class Problem:
    hierarchy: Hierarchy
    b: jnp.ndarray
    meshes: list
    bc: BoundaryCondition


@host_setup
def build_problem(
    spec: HierarchySpec,
    n: int,
    func: Callable | None = None,
    bc: BoundaryCondition | None = None,
    mesh=None,
    to_device: bool = True,
    agg_tables: bool = False,
) -> Problem:
    """Build any of the reference's hierarchy configurations from a
    :class:`~..utils.config.HierarchySpec` (the config-driven entry point; the
    four ``poisson_*`` builders below are canned specs).

    ``spec.cg_orders`` empty selects the DG-topped constructor
    (``mesh_heirarchy.jl:140-181``); otherwise the CG-topped one (``:30-138``).

    Agg meshes in ``Problem.meshes`` are built *lite* (``tables=False``) by
    default — the hierarchy's operators/transfers are closed-form and never
    read the O(n_base) quadrature tables.  Pass ``agg_tables=True`` if the
    returned meshes will feed quadrature-based helpers (``agg_load_vector``,
    ``agg_flux_rhs``, ``base_jacobians``), which raise on lite meshes.
    """
    func_, u_ex, ux_ex = default_model_problem()
    func = func or func_
    bc = bc or _default_bc(u_ex, ux_ex)
    if mesh is None:
        mesh = create_uniform_mesh(n, 0.0, 1.0)

    meshes: list = [make_cg_mesh(mesh, p) for p in spec.cg_orders]
    meshes += [make_dg_mesh(mesh, p) for p in spec.dg_orders]
    for i in range(spec.n_agg_levels):
        if i == 0:
            # hierarchy agg levels never need the O(n_base) quadrature tables
            # (operators/transfers are closed-form for the interval modal basis)
            n_base, r = mesh.n_elements, spec.first_agg_factor
            if n_base % r:
                meshes.append(
                    make_agg_mesh(
                        spec.p_agg, mesh,
                        partition=_near_uniform_partition(n_base, r), tables=agg_tables,
                    )
                )
            else:
                meshes.append(make_agg_mesh(spec.p_agg, mesh, r, tables=agg_tables))
        else:
            fine = meshes[-1]
            if fine.n_agg % spec.agg_factor:
                meshes.append(
                    coarsen_agg_mesh(
                        fine, partition=_near_uniform_partition(fine.n_agg, spec.agg_factor)
                    )
                )
            else:
                meshes.append(coarsen_agg_mesh(fine, spec.agg_factor))

    if spec.cg_orders:
        a, b = cg_stiffness_and_rhs(meshes[0], func, bc)
        h = build_hierarchy(
            meshes, bc, a, c_dir=spec.c_dir, cg_smoother_kind=spec.cg_smoother
        )
    else:
        dg = meshes[0]
        g, d, c = dg_flux_operators(dg, bc, spec.c_dir)
        a = schur_stiffness(g, d, c, dg.mass_inv, mixed_switch=dg.u_hat_left is not None)
        f, r = dg_flux_rhs(dg, func, bc, spec.c_dir)
        b = f - bt_matvec(d, bd_matvec(dg.mass_inv, r))
        h = build_dg_hierarchy(meshes, a, g, d, c)
    if not to_device:
        # leave everything on the host (large-problem flows cast/strip first
        # and ship only the solve-path arrays; see bench.py's XL solve)
        return Problem(hierarchy=h, b=b, meshes=meshes, bc=bc)
    return Problem(hierarchy=to_accelerator(h), b=to_accelerator(b), meshes=meshes, bc=bc)


def solve(
    problem: Problem,
    x0: jnp.ndarray | None = None,
    solve_params: SolveParams = SolveParams(),
    cycle_params: CycleParams = CycleParams(),
):
    """Run the outer multigrid iteration with config-dataclass parameters
    (defaults mirror the reference's keyword defaults, ``solvers.jl:19-20``)."""
    from .solvers import multigrid

    if x0 is None:
        x0 = jnp.zeros_like(problem.b)
    return multigrid(
        problem.hierarchy,
        x0,
        problem.b,
        maxiter=solve_params.maxiter,
        tol=solve_params.tol,
        n_pre=cycle_params.n_pre,
        n_post=cycle_params.n_post,
        alpha=cycle_params.alpha,
        compute_error=solve_params.compute_error,
    )


def _near_uniform_partition(n: int, r: int) -> np.ndarray:
    """Contiguous partition of ``n`` items into groups of ~``r``: when ``r``
    doesn't divide ``n``, the first groups take one extra item (ragged
    agglomerates; the hierarchy then works for any element count, not just
    powers of two)."""
    m = max(n // r, 1)
    base, rem = divmod(n, m)
    return np.asarray([base + 1] * rem + [base] * (m - rem), dtype=np.int64)


def default_model_problem():
    """-u'' = cos, exact u = cos (cf. full_heirarchy_test.jl:23-25)."""
    func = jnp.cos
    u_exact = np.cos
    ux_exact = lambda x: -np.sin(x)  # noqa: E731
    return func, u_exact, ux_exact


def _default_bc(u_exact, ux_exact, xin=0.0, xout=1.0) -> BoundaryCondition:
    """Neumann left / Dirichlet right (full_heirarchy_test.jl:39)."""
    return BoundaryCondition(("neu", ux_exact(xin)), ("dir", u_exact(xout)))


def _cg_orders(max_p: int, n_cg: int) -> list[int]:
    """p, p//2, p//4, ... (cf. cg_heirarchy_test.jl:29-34)."""
    orders = []
    p = max_p
    for _ in range(n_cg):
        orders.append(p)
        p //= 2
    return orders


def poisson_cg_hierarchy(
    n: int = 128,
    max_p: int = 8,
    n_cg: int = 4,
    func: Callable | None = None,
    bc: BoundaryCondition | None = None,
    cg_smoother: str = "jac",
) -> Problem:
    spec = HierarchySpec(
        cg_orders=tuple(_cg_orders(max_p, n_cg)), n_agg_levels=0, cg_smoother=cg_smoother
    )
    return build_problem(spec, n, func, bc)


def poisson_dg_cg_hierarchy(
    n: int = 128,
    max_p: int = 8,
    n_cg: int = 4,
    n_dg: int = 1,
    c_dir: float | None = None,
    func: Callable | None = None,
    bc: BoundaryCondition | None = None,
) -> Problem:
    """CG chain then DG levels continuing the p-halving (reaching p = 0 for the
    default 4 + 1 configuration, as in dg_cg_heirarchy_test.jl:31-45)."""
    orders = _cg_orders(max_p, n_cg + n_dg)
    spec = HierarchySpec(
        cg_orders=tuple(orders[:n_cg]),
        dg_orders=tuple(orders[n_cg:]),
        c_dir=1000.0 * n if c_dir is None else c_dir,
    )
    return build_problem(spec, n, func, bc)


def poisson_dg_hierarchy(
    n: int = 128,
    max_p: int = 8,
    n_dg: int = 4,
    n_agg: int = 0,
    p_agg: int = 1,
    c_dir: float | None = None,
    func: Callable | None = None,
    bc: BoundaryCondition | None = None,
) -> Problem:
    """DG-topped hierarchy; finest operators assembled directly and
    ``b = f - D M^-1 r`` (dg_heirarchy_test.jl:38-46).

    ``n_agg`` optionally appends agglomerated h-coarsening levels below the DG
    p-chain (4:1 first, 2:1 after) — required to keep the coarsest level small
    for large element counts (cf. the DG->agg path of ``mesh_heirarchy.jl:89-95``).
    """
    spec = HierarchySpec(
        cg_orders=(),
        dg_orders=tuple(_cg_orders(max_p, n_dg)),
        n_agg_levels=n_agg,
        p_agg=p_agg,
        c_dir=1000.0 * n if c_dir is None else c_dir,
    )
    return build_problem(spec, n, func, bc)


def poisson_full_hierarchy(
    n: int = 128,
    max_p: int = 8,
    n_cg: int = 4,
    n_agg: int | None = None,
    p_agg: int = 1,
    c_dir: float | None = None,
    func: Callable | None = None,
    bc: BoundaryCondition | None = None,
) -> Problem:
    """The flagship configuration (full_heirarchy_test.jl:30-92): 4 CG levels
    p = 8, 4, 2, 1, then log2(n) - 1 agglomerated levels (first 4:1, rest 2:1),
    CDir = 1000 n."""
    if n_agg is None:
        n_agg = int(np.log2(n)) - 1
    spec = HierarchySpec(
        cg_orders=tuple(_cg_orders(max_p, n_cg)),
        n_agg_levels=n_agg,
        p_agg=p_agg,
        c_dir=1000.0 * n if c_dir is None else c_dir,
    )
    return build_problem(spec, n, func, bc)


@host_setup
def poisson_scattered_hierarchy(
    n: int = 64,
    p_dg: int = 1,
    groups_per_level: list | None = None,
    p_agg: int = 1,
    c_dir: float | None = None,
    func: Callable | None = None,
    bc: BoundaryCondition | None = None,
    to_device: bool = True,
) -> Problem:
    """DG-topped hierarchy whose coarsening levels are SCATTERED (non-
    contiguous) agglomerations from explicit element-id lists — the reference's
    ``AgglomeratedDgMesh1(mP, agg::Vector{Vector{Int64}}, ...)`` workflow
    (``agglomerated_dg_mesh.jl:400-495``) as a one-call constructor.

    ``groups_per_level[0]`` partitions the base elements; each subsequent
    entry partitions the previous level's AGGLOMERATES (recursive
    ``AgglomeratedDgMeshN``).  Default: one level of locally interleaved
    agglomerates (two 4-element runs per 16-element block).
    """
    from ..mesh.scattered_agg import (
        coarsen_scattered_agg_mesh,
        make_scattered_agg_mesh,
    )

    func_, u_ex, ux_ex = default_model_problem()
    func = func or func_
    bc = bc or _default_bc(u_ex, ux_ex)
    c_dir = 1000.0 * n if c_dir is None else c_dir

    if groups_per_level is None:
        if n % 16:
            raise ValueError("the default scattered partition needs 16 | n")
        groups = []
        for blk in range(n // 16):
            o = 16 * blk
            groups.append([o + i for i in (0, 1, 2, 3, 8, 9, 10, 11)])
            groups.append([o + i for i in (4, 5, 6, 7, 12, 13, 14, 15)])
        groups_per_level = [groups]

    mesh = create_uniform_mesh(n, 0.0, 1.0)
    dg = make_dg_mesh(mesh, p_dg)
    meshes: list = [dg]
    sa = make_scattered_agg_mesh(p_agg, mesh, groups_per_level[0])
    meshes.append(sa)
    for groups in groups_per_level[1:]:
        sa = coarsen_scattered_agg_mesh(sa, groups)
        meshes.append(sa)

    g, d, c = dg_flux_operators(dg, bc, c_dir)
    a = schur_stiffness(g, d, c, dg.mass_inv)
    f, r = dg_flux_rhs(dg, func, bc, c_dir)
    b = f - bt_matvec(d, bd_matvec(dg.mass_inv, r))
    h = build_dg_hierarchy(meshes, a, g, d, c)
    if not to_device:
        return Problem(hierarchy=h, b=b, meshes=meshes, bc=bc)
    return Problem(hierarchy=to_accelerator(h), b=to_accelerator(b), meshes=meshes, bc=bc)
