"""Non-contiguous ("scattered") agglomerated-DG mesh levels.

Counterpart of the reference's arbitrary-partition constructor
``AgglomeratedDgMesh1(mP, agg::Vector{Vector{Int64}}, mesh, baseMesh)``
(``src/agglomerated_dg_mesh.jl:400-495``) and its recursive sibling
``AgglomeratedDgMeshN(mP, agg, subAggMesh, baseMesh)`` (``:598-...``): each
agglomerate owns an ARBITRARY set of base elements.  Semantics follow the
reference exactly:

* the agglomerate's modal basis ``{1, 2 (x - xc) / h}`` lives on the bounding
  box ``[min, max]`` of its members (``:92-99``) — holes included in the box
  but NOT in any integral;
* every integral sums base element by base element over the members only
  (mass ``:437-456``, volume moments ``:641-...``), so two agglomerates whose
  boxes overlap still have disjoint supports;
* a base-mesh vertex is an *interface* iff its two neighboring base elements
  belong to different agglomerates (``:143-150`` — the boundary-vertex scan);
  the reference then asserts each vertex neighbors at most two agglomerated
  elements (``:421-431``), which is automatic in 1D.

Contiguous partitions are the :class:`~.agg_mesh.AggMesh` fast path (operators
stay block-tridiagonal); a scattered agglomerate couples, through its
interface vertices, to every agglomerate adjacent to ANY of its runs, so the
operators over these meshes are general block-COO (:mod:`..ops.block_coo`).

A caution that applies equally to the reference: a strongly interleaved
partition (agglomerates whose bounding boxes span most of the domain) gives a
coarse space that approximates poorly — the V-cycle contraction degrades and
can genuinely diverge (measured: 8 agglomerates of 8 runs each spread over
256 elements).  This is a property of the discretization, not of the
implementation (the operators are bit-identical to the Galerkin projections,
``tests/test_scattered.py``); keep scattered agglomerates local.
Solve-path application stays one gather + batched block product +
``segment_sum`` per operator — fully XLA-native; only setup runs on the host,
like every other coarse-level factorization here.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..numerics import gauss_quad, modal_basis_vals_batched
from ..ops.block_diag import BlockDiag, bd_inverse
from .topology import Mesh1D


@dataclasses.dataclass(frozen=True)
class ScatteredAggMesh:
    p: int  # modal order, 0 or 1
    mesh: Mesh1D  # the BASE topological mesh (geometry provider)
    assign: np.ndarray  # (n_base,) owning agglomerate of each base element
    sub_assign: np.ndarray  # (n_prev,) previous-level element -> agglomerate
    n_agg: int
    quad_nodes: np.ndarray  # (n_q,)
    quad_weights: np.ndarray  # (n_q,)
    boxes: np.ndarray  # (m, 2) member bounding boxes
    basis_q: np.ndarray  # (n_base, n_q, p+1) owner basis at mapped Gauss pts
    x_quad: np.ndarray  # (n_base, n_q)
    deriv_vals: np.ndarray  # (m, p+1) constant modal derivatives [0, 2/h]
    mass: BlockDiag  # (p+1, p+1, m)
    mass_inv: BlockDiag
    # interfaces: interior base vertices whose two neighbors differ in owner
    iface_left: np.ndarray  # (n_if,) LEFT agglomerate id
    iface_right: np.ndarray  # (n_if,) RIGHT agglomerate id
    iface_x: np.ndarray  # (n_if,) vertex coordinate
    trace_left: np.ndarray  # (n_if, p+1) LEFT owner's basis at the vertex
    trace_right: np.ndarray  # (n_if, p+1)
    # per-interface switch: True = u-hat from the LEFT agglomerate (default
    # rule, cf. ``AggMesh.u_hat_left``); None = all-default
    u_hat_left: np.ndarray | None = None

    @property
    def n_elements(self) -> int:
        return self.n_agg

    @property
    def block_size(self) -> int:
        return self.p + 1

    @property
    def n_nodes(self) -> int:
        return self.n_agg * (self.p + 1)

    @property
    def n_interfaces(self) -> int:
        return self.iface_left.shape[0]

    @property
    def is_contiguous(self) -> bool:
        """True iff every agglomerate is one contiguous run (the AggMesh fast
        path would apply)."""
        return bool((np.diff(self.assign) != 0).sum() == self.n_agg - 1) and bool(
            (np.diff(self.assign) >= 0).all()
        )


def _groups_to_assign(n_base: int, groups) -> np.ndarray:
    """Element-id lists -> (n_base,) owner map; must partition 0..n_base-1."""
    assign = np.full(n_base, -1, dtype=np.int64)
    for g_id, group in enumerate(groups):
        ids = np.asarray(group, dtype=np.int64)
        if ids.size == 0:
            raise ValueError(f"agglomerate {g_id} is empty")
        if ids.min() < 0 or ids.max() >= n_base:
            raise ValueError(
                f"agglomerate {g_id} references element out of range 0..{n_base - 1}"
            )
        if np.unique(ids).size != ids.size:
            dup = ids[np.diff(np.sort(ids), prepend=-1) == 0]
            raise ValueError(
                f"element(s) {np.unique(dup).tolist()} listed more than once in "
                f"agglomerate {g_id}"
            )
        if (assign[ids] != -1).any():
            dup = ids[assign[ids] != -1]
            raise ValueError(
                f"element(s) {dup.tolist()} assigned to more than one agglomerate"
            )
        assign[ids] = g_id
    if (assign == -1).any():
        miss = np.nonzero(assign == -1)[0]
        raise ValueError(f"element(s) {miss.tolist()} not in any agglomerate")
    return assign


def make_scattered_agg_mesh(
    p: int,
    mesh: Mesh1D,
    groups,
    *,
    switch: np.ndarray | None = None,
    sub_assign: np.ndarray | None = None,
) -> ScatteredAggMesh:
    """Build a (level-1) scattered agglomeration level from explicit element-id
    lists, the reference's ``agg::Vector{Vector{Int64}}`` (0-based here).

    ``groups[c]`` is the arbitrary set of base-element ids owned by agglomerate
    ``c`` — contiguity is NOT required (use :func:`~.agg_mesh.make_agg_mesh`
    for contiguous runs; it keeps operators block-tridiagonal).  ``switch``
    (optional, ``(n_interfaces,)`` bool) sets the per-interface flux switch,
    ordered by interface vertex position; True = u-hat from the left
    agglomerate (the default rule everywhere else in this framework).
    """
    if p not in (0, 1):
        raise ValueError("agglomerated modal basis only implemented for p = 0, 1")
    n_base = mesh.n_elements
    assign = _groups_to_assign(n_base, groups)
    m = int(assign.max()) + 1
    if sub_assign is None:
        sub_assign = assign.copy()

    vx = mesh.vertex_x
    boxes = np.empty((m, 2))
    boxes[:, 0] = np.inf
    boxes[:, 1] = -np.inf
    np.minimum.at(boxes[:, 0], assign, vx[:-1])
    np.maximum.at(boxes[:, 1], assign, vx[1:])

    qx, qw = gauss_quad(2 * p)
    centers = mesh.centers
    jacs = mesh.jacobians
    x_quad = centers[:, None] + jacs[:, None] * qx[None, :]  # (n_base, n_q)
    basis_q = modal_basis_vals_batched(p, boxes[assign], x_quad)  # (n_base, n_q, bs)

    # mass: sum over members of J_e * sum_l w_l phi_i phi_j (reference
    # ``agglomerated_dg_mesh.jl:437-456`` — element-by-element quadrature)
    per_el = np.einsum("e,l,eli,elj->eij", jacs, qw, basis_q, basis_q)
    mass_nij = np.zeros((m, p + 1, p + 1))
    np.add.at(mass_nij, assign, per_el)
    mass = BlockDiag(jnp.moveaxis(jnp.asarray(mass_nij), 0, -1))
    mass_inv = bd_inverse(mass)

    h_box = boxes[:, 1] - boxes[:, 0]
    if p == 0:
        deriv_vals = np.zeros((m, 1))
    else:
        deriv_vals = np.stack([np.zeros(m), 2.0 / h_box], axis=1)

    # interfaces: interior vertices v (between base elements v-1 and v) where
    # the owner changes
    change = np.nonzero(assign[1:] != assign[:-1])[0] + 1  # vertex ids
    iface_left = assign[change - 1]
    iface_right = assign[change]
    iface_x = vx[change]
    trace_left = modal_basis_vals_batched(p, boxes[iface_left], iface_x[:, None])[:, 0, :]
    trace_right = modal_basis_vals_batched(p, boxes[iface_right], iface_x[:, None])[:, 0, :]

    if switch is not None:
        switch = np.asarray(switch, dtype=bool)
        if switch.shape != (change.size,):
            raise ValueError(
                f"switch must have one entry per interface ({change.size}), "
                f"got shape {switch.shape}"
            )
        if switch.all():
            switch = None

    return ScatteredAggMesh(
        p=p,
        mesh=mesh,
        assign=assign,
        sub_assign=np.asarray(sub_assign, dtype=np.int64),
        n_agg=m,
        quad_nodes=qx,
        quad_weights=qw,
        boxes=boxes,
        basis_q=basis_q,
        x_quad=x_quad,
        deriv_vals=deriv_vals,
        mass=mass,
        mass_inv=mass_inv,
        iface_left=iface_left,
        iface_right=iface_right,
        iface_x=iface_x,
        trace_left=trace_left,
        trace_right=trace_right,
        u_hat_left=switch,
    )


def coarsen_scattered_agg_mesh(
    fine, groups, *, switch: np.ndarray | None = None
) -> ScatteredAggMesh:
    """Next scattered level merging FINE AGGLOMERATES by arbitrary id lists
    (the reference's recursive ``AgglomeratedDgMeshN(mP, agg, subAggMesh,
    baseMesh)``): coarse agglomerate ``c`` owns the union of the base elements
    of its fine agglomerates.  ``fine`` may be a :class:`ScatteredAggMesh` or
    a contiguous :class:`~.agg_mesh.AggMesh` (the reference allows either sub
    mesh type for its recursive ctor)."""
    from .agg_mesh import AggMesh

    if isinstance(fine, AggMesh):
        fine_assign = np.repeat(np.arange(fine.n_agg), fine.sizes)
    else:
        fine_assign = fine.assign
    g_assign = _groups_to_assign(fine.n_agg, groups)
    base_groups_assign = g_assign[fine_assign]  # compose down to base elements
    m = int(g_assign.max()) + 1
    groups_base = [np.nonzero(base_groups_assign == c)[0] for c in range(m)]
    return make_scattered_agg_mesh(
        fine.p, fine.mesh, groups_base, switch=switch, sub_assign=g_assign
    )
