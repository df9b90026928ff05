"""Agglomerated-DG mesh levels (local modal basis on merged base elements).

TPU-native counterpart of ``src/agglomerated_dg_mesh.jl``.  One class covers
both the reference's ``AgglomeratedDgMesh1`` (first agglomeration level, built
from base CG/DG elements, ``:31-47``) and ``AgglomeratedDgMeshN`` (recursive
levels, ``:62-72``): agglomerate c always owns the *contiguous* run of base
elements ``c*r_base .. (c+1)*r_base - 1`` (the only pattern the reference's test
suite exercises), so every table batches into dense arrays:

* ``boxes``       (m, 2)            bounding boxes [x_left, x_right]
* ``basis_q``     (m, r_base, n_q, p+1)  modal basis at base-element-mapped
                                     Gauss points (``mBasisGQFunVal``, ``:103-128``)
* ``deriv_vals``  (m, p+1)          constant modal derivatives ([0, 2/h], ``:131``)
* ``bd_left/right`` (m, p+1)         boundary basis values at the agglomerate
                                     endpoints (``mBdBasisGQFunVal``, ``:158-173``)
* ``mass``        BlockDiag         per-agglomerate mass integrated base element
                                     by base element (``:437-456``)

The interior-vertex switch resolves to "u-hat from the LEFT agglomerate, q-hat
from the RIGHT agglomerate" exactly as at the DG level (quirk ``:474-475``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..numerics import gauss_quad, modal_basis_vals_batched
from ..ops.block_diag import BlockDiag, bd_inverse
from .topology import Mesh1D


@dataclasses.dataclass(frozen=True)
class AggMesh:
    p: int  # modal order, 0 or 1
    mesh: Mesh1D  # the BASE topological mesh (geometry provider)
    r_base: int  # base elements per agglomerate
    r_sub: int  # sub-(agg-)elements per agglomerate (== r_base on level 1)
    n_agg: int
    quad_nodes: np.ndarray  # (n_q,)
    quad_weights: np.ndarray  # (n_q,)
    boxes: np.ndarray  # (m, 2)
    basis_q: np.ndarray  # (m, r_base, n_q, p+1)
    x_quad: np.ndarray  # (m, r_base, n_q) mapped quadrature points
    deriv_vals: np.ndarray  # (m, p+1)
    bd_left: np.ndarray  # (m, p+1)
    bd_right: np.ndarray  # (m, p+1)
    mass: BlockDiag
    mass_inv: BlockDiag

    @property
    def n_elements(self) -> int:
        return self.n_agg

    @property
    def block_size(self) -> int:
        return self.p + 1

    @property
    def n_nodes(self) -> int:
        return self.n_agg * (self.p + 1)

    def base_jacobians(self) -> np.ndarray:
        """(m, r_base) jacobians of the base elements of each agglomerate."""
        return self.mesh.jacobians.reshape(self.n_agg, self.r_base)


def make_agg_mesh(
    p: int,
    mesh: Mesh1D,
    r_base: int,
    *,
    r_sub: int | None = None,
) -> AggMesh:
    """Build an agglomeration level directly from the base mesh geometry.

    ``r_base`` is the total number of base elements per agglomerate at *this*
    level; ``r_sub`` the grouping factor relative to the previous (finer) level
    (defaults to ``r_base``, i.e. a first agglomeration level).

    The reference builds higher levels from the finer agg level's element lists
    (``agglomerated_dg_mesh.jl:501-559``); with contiguous uniform groups the
    result depends only on (p, base mesh, r_base), which is what we take.  The
    reference hierarchy also re-uses whichever CG/DG mesh for geometry — all its
    CG meshes share element geometry, so taking the topological mesh directly
    resolves SURVEY §7 quirk (d) explicitly.
    """
    if r_sub is None:
        r_sub = r_base
    n_base = mesh.n_elements
    if n_base % r_base:
        raise ValueError("number of base elements must divide into agglomerates")
    m = n_base // r_base

    qx, qw = gauss_quad(2 * p)
    n_q = qx.shape[0]

    vx = mesh.vertex_x
    boxes = np.stack([vx[0 : n_base : r_base], vx[r_base : n_base + 1 : r_base]], axis=1)

    centers = mesh.centers.reshape(m, r_base)
    jacs = mesh.jacobians.reshape(m, r_base)
    x_quad = centers[:, :, None] + jacs[:, :, None] * qx[None, None, :]

    basis_q = modal_basis_vals_batched(p, boxes, x_quad)
    bd = modal_basis_vals_batched(p, boxes, boxes)  # (m, 2, p+1)
    bd_left, bd_right = bd[:, 0, :], bd[:, 1, :]
    if p == 0:
        deriv_vals = np.zeros((m, 1))
    else:
        deriv_vals = np.stack(
            [np.zeros(m), 2.0 / (boxes[:, 1] - boxes[:, 0])], axis=1
        )

    # mass blocks: sum over base elements of J_b * sum_l w_l phi_i phi_j
    mass_nij = np.einsum("cs,l,csli,cslj->cij", jacs, qw, basis_q, basis_q)
    mass = BlockDiag(jnp.moveaxis(jnp.asarray(mass_nij), 0, -1))

    return AggMesh(
        p=p,
        mesh=mesh,
        r_base=r_base,
        r_sub=r_sub,
        n_agg=m,
        quad_nodes=qx,
        quad_weights=qw,
        boxes=boxes,
        basis_q=basis_q,
        x_quad=x_quad,
        deriv_vals=deriv_vals,
        bd_left=bd_left,
        bd_right=bd_right,
        mass=mass,
        mass_inv=bd_inverse(mass),
    )


def coarsen_agg_mesh(fine: AggMesh, r_sub: int = 2) -> AggMesh:
    """Next agglomeration level merging ``r_sub`` finer agglomerates each."""
    return make_agg_mesh(fine.p, fine.mesh, fine.r_base * r_sub, r_sub=r_sub)
