"""Flux operators / rhs over scattered (non-contiguous) agglomeration levels.

Same flux scheme as the contiguous agglomerated assembly
(:mod:`.agg_assembly`, cf. ``src/agglomerated_dg_mesh.jl:641-994``), with the
vertex terms enumerated over the mesh's *interface list* instead of the
implicit ``c | c+1`` adjacency: at each interface vertex the default rule
takes u-hat from the LEFT agglomerate's trace and q-hat from the RIGHT's, and
an explicit per-interface switch mirrors the couplings exactly as on the
contiguous levels.  Because a scattered agglomerate can touch many interfaces,
the results are general :class:`~..ops.block_coo.BlockCOO` operators.

Derivation of the per-interface contributions (identical algebra to
``agg_assembly.agg_flux_operators`` with ``L = c``, ``R = c + 1``,
``tL = br[c]``, ``tR = bl[c+1]``):

* default (u-hat left, q-hat right):
  ``G[R,L] += tR tL^T``, ``G[L,L] -= tL tL^T``,
  ``D[R,R] += tR tR^T``, ``D[L,R] -= tL tR^T``
* flipped  (u-hat right, q-hat left):
  ``G[R,R] += tR tR^T``, ``G[L,R] -= tL tR^T``,
  ``D[L,L] -= tL tL^T``, ``D[R,L] += tR tL^T``

Domain-boundary terms and the penalty ``C`` are the same single-agglomerate
patches as the contiguous case (``agg_assembly.py:78-89``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.scattered_agg import ScatteredAggMesh
from ..mesh.topology import BoundaryCondition
from ..ops.block_coo import BlockCOO, bcoo_add, bcoo_coalesce, bcoo_scale_cols, bcoo_spgemm
from ..ops.block_diag import BlockDiag


def scattered_flux_operators(
    sa: ScatteredAggMesh, bc: BoundaryCondition, c_dir: float
) -> tuple[BlockCOO, BlockCOO, BlockCOO]:
    """(G, D, C) block-COO over scattered agglomerates."""
    m = sa.n_agg
    bs = sa.block_size

    # volume:  vol[i, j, c] = deriv_i(c) * integral of phi_j over the members
    q_el = np.einsum("e,l,elj->ej", sa.mesh.jacobians, sa.quad_weights, sa.basis_q)
    q = np.zeros((m, bs))
    np.add.at(q, sa.assign, q_el)
    vol = np.einsum("ci,cj->ijc", sa.deriv_vals, q)  # (bs, bs, m)

    diag_ids = np.arange(m)
    g_rows, g_cols, g_blocks = [diag_ids], [diag_ids], [vol.copy()]
    d_rows, d_cols, d_blocks = [diag_ids], [diag_ids], [vol.copy()]
    c_diag = np.zeros((bs, bs, m))

    n_if = sa.n_interfaces
    if n_if:
        sw = (
            np.ones(n_if)
            if sa.u_hat_left is None
            else np.asarray(sa.u_hat_left, dtype=np.float64)
        )
        fl = 1.0 - sw
        L, R = sa.iface_left, sa.iface_right
        tL, tR = sa.trace_left, sa.trace_right  # (n_if, bs)
        rl = np.einsum("v,vi,vj->ijv", sw, tR, tL)  # tR tL^T, default weight
        ll = np.einsum("v,vi,vj->ijv", sw, tL, tL)
        rr = np.einsum("v,vi,vj->ijv", sw, tR, tR)
        lr = np.einsum("v,vi,vj->ijv", sw, tL, tR)
        g_rows += [R, L]
        g_cols += [L, L]
        g_blocks += [rl, -ll]
        d_rows += [R, L]
        d_cols += [R, R]
        d_blocks += [rr, -lr]
        if sa.u_hat_left is not None:
            frr = np.einsum("v,vi,vj->ijv", fl, tR, tR)
            flr = np.einsum("v,vi,vj->ijv", fl, tL, tR)
            fll = np.einsum("v,vi,vj->ijv", fl, tL, tL)
            frl = np.einsum("v,vi,vj->ijv", fl, tR, tL)
            g_rows += [R, L]
            g_cols += [R, R]
            g_blocks += [frr, -flr]
            d_rows += [L, R]
            d_cols += [L, L]
            d_blocks += [-fll, frl]

    # domain boundary: patches on the agglomerates owning the outermost
    # elements, traces evaluated at the domain endpoints
    from ..numerics import modal_basis_vals_batched

    a0 = int(sa.assign[0])
    an = int(sa.assign[-1])
    vx = sa.mesh.vertex_x
    t0 = modal_basis_vals_batched(sa.p, sa.boxes[[a0]], vx[:1][None, :])[0, 0]
    tn = modal_basis_vals_batched(sa.p, sa.boxes[[an]], vx[-1:][None, :])[0, 0]
    bl0 = np.outer(t0, t0)
    brn = np.outer(tn, tn)
    if bc.dir_left:
        d_rows.append([a0])
        d_cols.append([a0])
        d_blocks.append(bl0[:, :, None])
        c_diag[:, :, a0] += c_dir * bl0
    elif bc.neu_left:
        g_rows.append([a0])
        g_cols.append([a0])
        g_blocks.append(bl0[:, :, None])
    if bc.dir_right:
        d_rows.append([an])
        d_cols.append([an])
        d_blocks.append(-brn[:, :, None])
        c_diag[:, :, an] += c_dir * brn
    elif bc.neu_right:
        g_rows.append([an])
        g_cols.append([an])
        g_blocks.append(-brn[:, :, None])

    g = bcoo_coalesce(
        np.concatenate([np.asarray(r) for r in g_rows]),
        np.concatenate([np.asarray(ccc) for ccc in g_cols]),
        np.concatenate(g_blocks, axis=2),
        m,
        m,
    )
    d = bcoo_coalesce(
        np.concatenate([np.asarray(r) for r in d_rows]),
        np.concatenate([np.asarray(ccc) for ccc in d_cols]),
        np.concatenate(d_blocks, axis=2),
        m,
        m,
    )
    c = bcoo_coalesce(diag_ids, diag_ids, c_diag, m, m)
    return g, d, c


def scattered_load_vector(sa: ScatteredAggMesh, func: Callable) -> jax.Array:
    """Volume load  f[i, c] = sum over members of J_e sum_l w_l phi_i f(x)."""
    fv = np.asarray(func(jnp.asarray(sa.x_quad)))
    per_el = np.einsum(
        "e,l,eli,el->ei", sa.mesh.jacobians, sa.quad_weights, sa.basis_q, fv
    )
    f = np.zeros((sa.n_agg, sa.block_size))
    np.add.at(f, sa.assign, per_el)
    return jnp.asarray(f.T)


def scattered_flux_rhs(
    sa: ScatteredAggMesh, func: Callable, bc: BoundaryCondition, c_dir: float
) -> tuple[jax.Array, jax.Array]:
    """(f, r) right-hand sides, boundary patches as in ``agg_flux_rhs``."""
    from ..numerics import modal_basis_vals_batched

    f = scattered_load_vector(sa, func)
    r = jnp.zeros_like(f)
    a0 = int(sa.assign[0])
    an = int(sa.assign[-1])
    vx = sa.mesh.vertex_x
    t0 = jnp.asarray(modal_basis_vals_batched(sa.p, sa.boxes[[a0]], vx[:1][None, :])[0, 0])
    tn = jnp.asarray(modal_basis_vals_batched(sa.p, sa.boxes[[an]], vx[-1:][None, :])[0, 0])

    if bc.dir_left:
        g = bc.left[1]
        f = f.at[:, a0].add(c_dir * g * t0)
        r = r.at[:, a0].add(-g * t0)
    elif bc.neu_left:
        f = f.at[:, a0].add(-bc.left[1] * t0)
    if bc.dir_right:
        g = bc.right[1]
        f = f.at[:, an].add(c_dir * g * tn)
        r = r.at[:, an].add(g * tn)
    elif bc.neu_right:
        f = f.at[:, an].add(bc.right[1] * tn)
    return f, r


def scattered_schur(
    g: BlockCOO, d: BlockCOO, c: BlockCOO, mass_inv: BlockDiag | jax.Array
) -> BlockCOO:
    """``A = C - D M^-1 G`` over block-COO (host SpGEMM at setup; same
    factorization as ``hierarchy.schur_stiffness``)."""
    dm = bcoo_scale_cols(d, mass_inv)
    return bcoo_add(c, bcoo_spgemm(dm, g), beta=-1.0)
