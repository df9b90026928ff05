"""Agglomerated-DG flux operator and rhs assembly.

Counterpart of ``src/agglomerated_dg_mesh.jl:641-994``.  Identical flux scheme
to the DG level, but vertex terms are rank-1 outer products of the boundary
modal-basis value vectors (``mBdBasisGQFunVal``) and the volume term integrates
base element by base element.  With contiguous uniform agglomerates everything
reduces to batched einsums and boundary-column edits on (bs, bs, m) diagonals.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.agg_mesh import AggMesh
from ..mesh.topology import BoundaryCondition
from ..ops.block_tridiag import BlockTridiag


def agg_flux_operators(
    agg: AggMesh, bc: BoundaryCondition, c_dir: float
) -> tuple[BlockTridiag, BlockTridiag, BlockTridiag]:
    """(G, D, C) over agglomerates (cf. ``agglomerated_dg_mesh.jl:641-873``).

    Assembled in host NumPy (one O(m) pass, no eager-JAX scatters) and
    converted once.  Lite meshes (no quadrature tables) take the closed form
    for the volume moment: ``integral of phi_j over the agglomerate`` is
    ``(h, 0)`` for the modal basis {1, 2(x-xc)/h} on an interval of width h —
    identical to the per-base-element quadrature sums."""
    m = agg.n_agg
    bs = agg.block_size

    # volume:  temp[i, j] = deriv_i * integral of phi_j over the agglomerate
    if agg.has_tables:
        q = np.einsum(
            "cs,l,cslj->cj", agg.base_jacobians(), agg.quad_weights, agg.basis_q
        )  # (m, bs)
    else:
        q = np.zeros((m, bs))
        q[:, 0] = agg.boxes[:, 1] - agg.boxes[:, 0]
    vol = np.einsum("ci,cj->ijc", agg.deriv_vals, q)  # (bs, bs, m)

    bl = agg.bd_left  # (m, bs)
    br = agg.bd_right

    g_diag = vol.copy()
    d_diag = vol.copy()
    g_lower = np.zeros((bs, bs, m))
    g_upper = np.zeros((bs, bs, m))
    d_lower = np.zeros((bs, bs, m))
    d_upper = np.zeros((bs, bs, m))
    c_diag = np.zeros((bs, bs, m))

    # interior vertices between agglomerates c (left) and c+1 (right), default:
    # u-hat = left agglomerate's right-boundary trace, q-hat = right's left
    # trace; an explicit switch (``agglomerated_dg_mesh.jl:459-487``) mirrors
    # the couplings at flipped vertices exactly as the DG level does
    if m > 1:
        sw = (
            np.ones(m - 1)
            if agg.u_hat_left is None
            else np.asarray(agg.u_hat_left, dtype=np.float64)
        )
        fl = 1.0 - sw
        g_lower[:, :, 1:] += sw * np.einsum("ci,cj->ijc", bl[1:], br[:-1])
        g_diag[:, :, :-1] -= sw * np.einsum("ci,cj->ijc", br[:-1], br[:-1])
        d_diag[:, :, 1:] += sw * np.einsum("ci,cj->ijc", bl[1:], bl[1:])
        d_upper[:, :, :-1] -= sw * np.einsum("ci,cj->ijc", br[:-1], bl[1:])
        if agg.u_hat_left is not None:
            g_diag[:, :, 1:] += fl * np.einsum("ci,cj->ijc", bl[1:], bl[1:])
            g_upper[:, :, :-1] -= fl * np.einsum("ci,cj->ijc", br[:-1], bl[1:])
            d_diag[:, :, :-1] -= fl * np.einsum("ci,cj->ijc", br[:-1], br[:-1])
            d_lower[:, :, 1:] += fl * np.einsum("ci,cj->ijc", bl[1:], br[:-1])

    bl0 = np.outer(bl[0], bl[0])
    brn = np.outer(br[-1], br[-1])
    if bc.dir_left:
        d_diag[:, :, 0] += bl0
        c_diag[:, :, 0] += c_dir * bl0
    elif bc.neu_left:
        g_diag[:, :, 0] += bl0
    if bc.dir_right:
        d_diag[:, :, -1] -= brn
        c_diag[:, :, -1] += c_dir * brn
    elif bc.neu_right:
        g_diag[:, :, -1] -= brn

    zero = jnp.zeros((bs, bs, m))
    g = BlockTridiag(
        lower=jnp.asarray(g_lower), diag=jnp.asarray(g_diag), upper=jnp.asarray(g_upper)
    )
    d = BlockTridiag(
        lower=jnp.asarray(d_lower), diag=jnp.asarray(d_diag), upper=jnp.asarray(d_upper)
    )
    c = BlockTridiag(lower=zero, diag=jnp.asarray(c_diag), upper=zero)
    return g, d, c


def agg_load_vector(agg: AggMesh, func: Callable) -> jax.Array:
    """Volume load  f[i, c] = sum_s J_cs sum_l w_l phi_i(x_csl) f(x_csl)."""
    jacs = jnp.asarray(agg.base_jacobians())
    return jnp.einsum(
        "cs,l,csli,csl->ic",
        jacs,
        jnp.asarray(agg.quad_weights),
        jnp.asarray(agg.basis_q),
        func(jnp.asarray(agg.x_quad)),
    )


def agg_flux_rhs(
    agg: AggMesh, func: Callable, bc: BoundaryCondition, c_dir: float
) -> tuple[jax.Array, jax.Array]:
    """(f, r) right-hand sides (cf. ``agglomerated_dg_mesh.jl:875-994``)."""
    f = agg_load_vector(agg, func)
    r = jnp.zeros_like(f)
    bl0 = jnp.asarray(agg.bd_left[0])
    brn = jnp.asarray(agg.bd_right[-1])

    if bc.dir_left:
        g = bc.left[1]
        f = f.at[:, 0].add(c_dir * g * bl0)
        r = r.at[:, 0].add(-g * bl0)
    elif bc.neu_left:
        f = f.at[:, 0].add(-bc.left[1] * bl0)
    if bc.dir_right:
        g = bc.right[1]
        f = f.at[:, -1].add(c_dir * g * brn)
        r = r.at[:, -1].add(g * brn)
    elif bc.neu_right:
        f = f.at[:, -1].add(bc.right[1] * brn)
    return f, r


# -- standalone single-operator variants (cf. agglomerated_dg_mesh.jl:1012-1381) --


def agg_gradient(agg: AggMesh, bc: BoundaryCondition) -> BlockTridiag:
    g, _, _ = agg_flux_operators(agg, bc, 0.0)
    return g


def agg_divergence(agg: AggMesh, bc: BoundaryCondition) -> BlockTridiag:
    _, d, _ = agg_flux_operators(agg, bc, 0.0)
    return d


def agg_c_matrix(agg: AggMesh, bc: BoundaryCondition, c_dir: float) -> BlockTridiag:
    """Penalty matrix alone.  (The reference's standalone p=0 ``C_matrix`` has a
    dead-code typo, ``agglomerated_dg_mesh.jl:1362``; this version is simply the
    C factor of :func:`agg_flux_operators`, which the hierarchy actually uses.)"""
    _, _, c = agg_flux_operators(agg, bc, c_dir)
    return c


def agg_r_vector(agg: AggMesh, bc: BoundaryCondition) -> jax.Array:
    """Dirichlet-lift vector alone (cf. ``agglomerated_dg_mesh.jl`` r terms)."""
    _, r = agg_flux_rhs(agg, lambda x: jnp.zeros_like(x), bc, 0.0)
    return r


def agg_f_vector(agg: AggMesh, func: Callable, bc: BoundaryCondition, c_dir: float) -> jax.Array:
    """Load + boundary contributions alone."""
    f, _ = agg_flux_rhs(agg, func, bc, c_dir)
    return f
