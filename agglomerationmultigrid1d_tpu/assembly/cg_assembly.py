"""CG stiffness / rhs assembly (counterpart of ``src/cg_mesh.jl:87-247``).

All element contributions are one constant reference matrix scaled by 1/J per
element (1D Laplacian), so "assembly" is a broadcast plus the banded window
scatter-add of :mod:`..ops.cg_operator`.  Strong Dirichlet boundary surgery
(``cg_mesh.jl:117-119,:177-182``) is folded into the boundary element windows;
see ``ops.cg_operator`` for why this is exact.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.cg_mesh import CgMesh
from ..mesh.topology import BoundaryCondition
from ..ops.cg_operator import CgOperator, cg_from_windows


def _stiffness_ref_pos(cg: CgMesh) -> np.ndarray:
    """Reference stiffness  K[i,j] = sum_l w_l phi'_i phi'_j  in grid-position order."""
    ref = cg.ref
    k_slot = np.einsum("l,li,lj->ij", ref.quad_weights, ref.deriv_at_quad, ref.deriv_at_quad)
    pos = ref.pos_to_slot
    return k_slot[np.ix_(pos, pos)]


def _fold_dirichlet(windows: jax.Array, bc: BoundaryCondition) -> jax.Array:
    """Zero Dirichlet row/col and set unit diagonal inside the owning element window."""
    w = windows.shape[0]
    if bc.dir_left:
        windows = windows.at[0, :, 0].set(0.0)
        windows = windows.at[:, 0, 0].set(0.0)
        windows = windows.at[0, 0, 0].set(1.0)
    if bc.dir_right:
        windows = windows.at[w - 1, :, -1].set(0.0)
        windows = windows.at[:, w - 1, -1].set(0.0)
        windows = windows.at[w - 1, w - 1, -1].set(1.0)
    return windows


def _raw_stiffness_windows(cg: CgMesh) -> jax.Array:
    k_pos = jnp.asarray(_stiffness_ref_pos(cg))
    inv_jac = 1.0 / jnp.asarray(cg.mesh.jacobians)
    return k_pos[:, :, None] * inv_jac[None, None, :]


def cg_stiffness(cg: CgMesh, bc: BoundaryCondition) -> CgOperator:
    """Assembled stiffness with Dirichlet surgery (cf. ``cg_mesh.jl:87-122``)."""
    return cg_from_windows(_fold_dirichlet(_raw_stiffness_windows(cg), bc))


def _load_vector(cg: CgMesh, func: Callable) -> jax.Array:
    """Volume load  f[node] = sum_el J w_l phi_i f(x_l)  in grid order."""
    ref = cg.ref
    p = cg.p
    n_el = cg.n_elements
    basis_pos = jnp.asarray(ref.basis_at_quad[:, ref.pos_to_slot])  # (n_q, w)
    jac = jnp.asarray(cg.mesh.jacobians)
    xq = jnp.asarray(cg.mesh.centers)[:, None] + jac[:, None] * jnp.asarray(ref.quad_nodes)[None, :]
    fe = jnp.einsum("k,l,la,kl->ak", jac, jnp.asarray(ref.quad_weights), basis_pos, func(xq))
    f = jnp.zeros((cg.n_nodes,), dtype=fe.dtype)
    idx = p * jnp.arange(n_el)[None, :] + jnp.arange(p + 1)[:, None]
    return f.at[idx].add(fe)


def _apply_neumann(f: jax.Array, bc: BoundaryCondition) -> jax.Array:
    """Neumann flux terms (cf. ``cg_mesh.jl:164-174``): -g at the left end, +g right."""
    if bc.neu_left:
        f = f.at[0].add(-bc.left[1])
    if bc.neu_right:
        f = f.at[-1].add(bc.right[1])
    return f


def cg_stiffness_and_rhs(
    cg: CgMesh, func: Callable, bc: BoundaryCondition
) -> tuple[CgOperator, jax.Array]:
    """Stiffness + load with full BC treatment (cf. ``cg_mesh.jl:125-185``).

    The Dirichlet lift ``f -= A[:, dir] * g`` uses the *raw* (pre-surgery)
    stiffness column, which lives entirely inside the boundary element window.
    """
    raw = _raw_stiffness_windows(cg)
    f = _load_vector(cg, func)
    f = _apply_neumann(f, bc)

    w = raw.shape[0]
    if bc.dir_left:
        g = bc.left[1]
        idx = jnp.arange(w)
        f = f.at[idx].add(-raw[:, 0, 0] * g)
        f = f.at[0].set(g)
    if bc.dir_right:
        g = bc.right[1]
        idx = cg.n_nodes - w + jnp.arange(w)
        f = f.at[idx].add(-raw[:, w - 1, -1] * g)
        f = f.at[-1].set(g)

    a = cg_from_windows(_fold_dirichlet(raw, bc))
    return a, f


def cg_rhs(cg: CgMesh, func: Callable, bc: BoundaryCondition) -> jax.Array:
    """Rhs-only variant (cf. ``cg_mesh.jl:188-247``); equals the rhs above."""
    _, f = cg_stiffness_and_rhs(cg, func, bc)
    return f
