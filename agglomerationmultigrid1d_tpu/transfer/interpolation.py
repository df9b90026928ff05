"""Inter-level prolongation builders (counterpart of ``src/interpolation.jl``).

Every function returns one of the structured transfer types of
``..ops.transfer_ops`` (the reference returns general sparse / dense matrices).
Naming follows the reference: ``<coarse>_<fine>_interpolation`` builds the
prolongation L mapping the *coarse* space into the *fine* space; restriction is
always L^T, applied by the solver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.agg_mesh import AggMesh
from ..mesh.cg_mesh import CgMesh
from ..mesh.dg_mesh import DgMesh
from ..numerics import evaluate_nodal_basis, gauss_quad, modal_basis_vals_batched
from ..ops.block_diag import bd_to_dense_blocks
from ..ops.transfer_ops import BlockProlong, CgProlong, SeamProlong, block_prolong_constant


# ---------------------------------------------------------------------------
# CG -> CG (p-coarsening, nodal injection)   cf. interpolation.jl:5-55
# ---------------------------------------------------------------------------


def cg_cg_interpolation(low: CgMesh, high: CgMesh) -> CgProlong:
    """Coarse (low-order) nodal basis evaluated at fine nodes, grid order."""
    x_fine_pos = high.ref.nodes_x[high.ref.pos_to_slot]
    e_slotcols = evaluate_nodal_basis(low.ref.basis_coeff, x_fine_pos)  # (w_f, w_c slots)
    e = e_slotcols[:, low.ref.pos_to_slot]
    return CgProlong(e=jnp.asarray(e))


# ---------------------------------------------------------------------------
# DG -> DG (p-coarsening, nodal injection)   cf. interpolation.jl:91-139
# ---------------------------------------------------------------------------


def dg_dg_interpolation(low: DgMesh, high: DgMesh) -> BlockProlong:
    """Coarse nodal basis at fine nodes, slot order; one constant block."""
    e = evaluate_nodal_basis(low.ref.basis_coeff, high.ref.nodes_x)  # (w_f, w_c)
    return block_prolong_constant(jnp.asarray(e), high.n_elements)


# ---------------------------------------------------------------------------
# DG (coarse) -> CG (fine) seam              cf. interpolation.jl:145-220
# ---------------------------------------------------------------------------


def dg_cg_interpolation(low: DgMesh, high: CgMesh, interp_flag: int = 1) -> SeamProlong:
    """Lumped-mass-scaled L2 projection (flag 1, the hierarchy default,
    ``mesh_heirarchy.jl:62-63``) or nodal averaging (flag 2)."""
    w_cg = high.p + 1
    bs = low.p + 1
    n = high.n_elements
    if interp_flag == 1:
        qx, qw = gauss_quad(low.p + high.p)
        cg_b = evaluate_nodal_basis(high.ref.basis_coeff, qx)[:, high.ref.pos_to_slot]
        dg_b = evaluate_nodal_basis(low.ref.basis_coeff, qx)  # (n_q, bs) slot order
        n_ref = np.einsum("l,la,lm->am", qw, cg_b, dg_b)  # (w_cg, bs)
        n_win = jnp.asarray(n_ref)[:, :, None, None] * jnp.asarray(high.mesh.jacobians)
        return SeamProlong(n_win=n_win, inv_lump=1.0 / high.lumped_mass)
    if interp_flag == 2:
        x_pos = high.ref.nodes_x[high.ref.pos_to_slot]
        e = evaluate_nodal_basis(low.ref.basis_coeff, x_pos)  # (w_cg, bs)
        weights = np.ones((w_cg, n))
        weights[0, 1:] = 0.5  # interior shared vertices averaged between neighbors
        weights[-1, :-1] = 0.5
        n_win = jnp.asarray(weights[:, None, None, :] * e[:, :, None, None])
        return SeamProlong(n_win=n_win, inv_lump=jnp.ones((high.n_nodes,)))
    raise ValueError("interp_flag must be 1 or 2 (0 = dense projection: use *_dense)")


def dg_cg_interpolation_dense(low: DgMesh, high: CgMesh) -> jnp.ndarray:
    """Full consistent-mass L2 projection (interp_flag = 0; dense, analysis only)."""
    from ..ops.cg_operator import cg_to_dense

    l1 = dg_cg_interpolation(low, high, 1)
    n_dense = _seam_to_dense_n(l1)
    mass = cg_to_dense(high.mass)
    import numpy as np

    return jnp.asarray(np.linalg.solve(np.asarray(mass), np.asarray(n_dense)))


def _seam_to_dense_n(l: SeamProlong) -> jnp.ndarray:
    """Materialize the unscaled cross-mass N (testing / dense variants)."""
    w_cg, bs, r, n_c = l.n_win.shape
    p_cg = w_cg - 1
    n_rows = l.inv_lump.shape[0]
    n_el = (n_rows - 1) // p_cg
    base_el = (
        jnp.arange(n_c) * r if l.offsets is None else jnp.asarray(l.offsets)
    )
    out = jnp.zeros((n_rows, bs * n_c))
    for j in range(r):
        for a in range(w_cg):
            rows = jnp.minimum(base_el + j, n_el - 1) * p_cg + a
            for m_ in range(bs):
                cols = jnp.arange(n_c) * bs + m_
                out = out.at[rows, cols].add(l.n_win[a, m_, j, :])
    return out


# ---------------------------------------------------------------------------
# agg -> agg                                  cf. interpolation.jl:226-264
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1))
def _aggdg_aggdg_blocks_uniform(p: int, r: int, cb, fb):
    """Jitted closed-form re-expansion for uniform lite levels, in the
    ``(r, bs, bs, mc)`` BlockProlong layout (see the exactness note in
    :func:`aggdg_aggdg_interpolation`)."""
    mc = cb.shape[0]
    if p == 0:
        return jnp.ones((r, 1, 1, mc), dtype=cb.dtype)
    fbr = fb.reshape(mc, r, 2)
    hf = (fbr[:, :, 1] - fbr[:, :, 0]).T  # (r, mc)
    cf = (0.5 * (fbr[:, :, 0] + fbr[:, :, 1])).T
    hc = cb[:, 1] - cb[:, 0]
    cc = 0.5 * (cb[:, 0] + cb[:, 1])
    one = jnp.ones_like(hf)
    zero = jnp.zeros_like(hf)
    l01 = 2.0 * (cf - cc[None, :]) / hc[None, :]
    l11 = hf / hc[None, :]
    row0 = jnp.stack([one, l01], axis=1)  # (r, 2, mc)
    row1 = jnp.stack([zero, l11], axis=1)
    return jnp.stack([row0, row1], axis=1)  # (r, 2, 2, mc)


def aggdg_aggdg_interpolation(coarse: AggMesh, fine: AggMesh):
    """L2 projection through the fine mass: L = M_f^-1 N, per fine block.

    Uniform groupings return the reshape-based :class:`BlockProlong`; ragged
    partitions (the reference's arbitrary ``agg`` lists) a
    :class:`RaggedBlockProlong`."""
    if coarse.p != fine.p:
        raise ValueError("the two agglomerated meshes must have the same p")
    mc, bs = coarse.n_agg, coarse.block_size
    r = coarse.sub_uniform_r
    rf = fine.uniform_r

    if not fine.has_tables and r is not None and rf is not None:
        return BlockProlong(
            _aggdg_aggdg_blocks_uniform(
                coarse.p, r, jnp.asarray(coarse.boxes), jnp.asarray(fine.boxes)
            )
        )

    parent = np.repeat(np.arange(mc), coarse.sub_sizes)
    if fine.has_tables:
        # per-FINE-agglomerate cross-mass against the parent coarse basis; the
        # padded base-element rows carry zero jacobians, so sums are exact
        bcx = modal_basis_vals_batched(coarse.p, coarse.boxes[parent], fine.x_quad)
        n_f = np.einsum(
            "fs,l,fsli,fslm->fim", fine.jacs, fine.quad_weights, fine.basis_q, bcx
        )  # (m_f, bs, bs)
        minv = np.asarray(bd_to_dense_blocks(fine.mass_inv))  # (m_f, bs, bs)
        l_f = np.einsum("fik,fkm->fim", minv, n_f)
    else:
        # closed form (exact): the coarse modal basis restricted to the fine
        # interval is  1 -> 1,  xi_c -> 2(cf - cc)/hc + (hf/hc) xi_f,
        # so the L2 projection IS that affine re-expansion
        cb, fb = coarse.boxes[parent], fine.boxes
        hc = cb[:, 1] - cb[:, 0]
        hf = fb[:, 1] - fb[:, 0]
        cf = 0.5 * (fb[:, 0] + fb[:, 1])
        cc = 0.5 * (cb[:, 0] + cb[:, 1])
        l_f = np.zeros((fine.n_agg, bs, bs))
        l_f[:, 0, 0] = 1.0
        if coarse.p == 1:
            l_f[:, 0, 1] = 2.0 * (cf - cc) / hc
            l_f[:, 1, 1] = hf / hc

    if r is not None and rf is not None:
        l_blocks = l_f.reshape(mc, r, bs, bs)
        return BlockProlong(jnp.asarray(np.moveaxis(l_blocks, (0, 1), (-1, 0))))
    return _pack_ragged_blocks(l_f, coarse.sub_sizes, coarse.sub_offsets)


def _pack_ragged_blocks(per_fine: np.ndarray, sizes, offsets):
    """(n_f, bs_f, bs_c) per-fine-block matrices -> RaggedBlockProlong with
    zero padding past each group's size."""
    from ..ops.transfer_ops import RaggedBlockProlong, ragged_sizes_to_arrays

    m = sizes.shape[0]
    r_max = int(np.max(sizes))
    n_f = per_fine.shape[0]
    idx = np.minimum(offsets[:, None] + np.arange(r_max)[None, :], n_f - 1)
    valid = np.arange(r_max)[None, :] < np.asarray(sizes)[:, None]
    blocks = np.where(valid[:, :, None, None], per_fine[idx], 0.0)  # (m, r_max, bsf, bsc)
    s, off, total = ragged_sizes_to_arrays(sizes)
    return RaggedBlockProlong(
        blocks=jnp.asarray(np.moveaxis(blocks, (0, 1), (-1, 0))),
        sizes=s,
        offsets=off,
        n_fine=total,
    )


# ---------------------------------------------------------------------------
# agg (coarse) -> DG (fine)                   cf. interpolation.jl:270-324
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1))
def _aggdg_dg_blocks_uniform(p: int, r: int, centers, jacs, nodes_x, boxes):
    """Jitted fused builder for the uniform-r case, directly in the
    ``(r, w, bs, m)`` BlockProlong layout (the eager NumPy path was ~100x
    slower at 10^7 base elements: many full-size temporaries on a 2-core
    host vs one fused XLA loop)."""
    m = boxes.shape[0]
    cen = centers.reshape(m, r).T[None]  # (1, r, m)
    jac = jacs.reshape(m, r).T[None]
    xn = cen + jac * nodes_x[:, None, None]  # (w, r, m)
    phi0 = jnp.ones_like(xn)
    if p == 0:
        return phi0.transpose(1, 0, 2)[:, :, None, :]
    xc = 0.5 * (boxes[:, 0] + boxes[:, 1])
    h = boxes[:, 1] - boxes[:, 0]
    phi1 = 2.0 * (xn - xc[None, None, :]) / h[None, None, :]
    return jnp.stack([phi0, phi1], axis=2).transpose(1, 0, 2, 3)  # (r, w, 2, m)


def aggdg_dg_interpolation(agg: AggMesh, base: DgMesh):
    """Modal -> nodal evaluation of the agglomerate basis at base-element nodes."""
    m = agg.n_agg
    r = agg.uniform_r
    if r is not None:
        blocks = _aggdg_dg_blocks_uniform(
            agg.p, r,
            jnp.asarray(base.mesh.centers), jnp.asarray(base.mesh.jacobians),
            jnp.asarray(base.ref.nodes_x), jnp.asarray(agg.boxes),
        )
        return BlockProlong(blocks)
    parent = np.repeat(np.arange(m), agg.sizes)  # (n_base,)
    centers, jacs = base.mesh.centers, base.mesh.jacobians
    xn = centers[:, None] + jacs[:, None] * base.ref.nodes_x[None, :]  # (n_base, w)
    per_el = modal_basis_vals_batched(agg.p, agg.boxes[parent], xn)  # (n_base, w, bs)
    return _pack_ragged_blocks(per_el, agg.sizes, agg.offsets)


def aggdg_dg_interpolation2(agg: AggMesh, base: DgMesh):
    """L2-projection variant through the base mass (``interpolation.jl:294-324``)."""
    m = agg.n_agg
    w = base.p + 1
    ref = base.ref
    parent = np.repeat(np.arange(m), agg.sizes)
    centers, jacs = base.mesh.centers, base.mesh.jacobians
    xq = centers[:, None] + jacs[:, None] * ref.quad_nodes[None, :]  # (n_base, n_q)
    agg_b = modal_basis_vals_batched(agg.p, agg.boxes[parent], xq)  # (n_base, n_q, bs)
    n_blocks = np.einsum(
        "e,l,li,elm->eim", jacs, ref.quad_weights, ref.basis_at_quad, agg_b
    )
    minv = np.asarray(bd_to_dense_blocks(base.mass_inv))  # (n_base, w, w)
    per_el = np.einsum("eik,ekm->eim", minv, n_blocks)
    r = agg.uniform_r
    if r is not None:
        l_blocks = per_el.reshape(m, r, w, agg.block_size)
        return BlockProlong(jnp.asarray(np.moveaxis(l_blocks, (0, 1), (-1, 0))))
    return _pack_ragged_blocks(per_el, agg.sizes, agg.offsets)


# ---------------------------------------------------------------------------
# agg (coarse) -> CG (fine) seam              cf. interpolation.jl:330-410
# ---------------------------------------------------------------------------


def aggdg_cg_interpolation(agg: AggMesh, base: CgMesh, interp_flag: int = 1) -> SeamProlong:
    m, bs = agg.n_agg, agg.block_size
    w_cg = base.p + 1
    ref = base.ref
    uniform = agg.uniform_r is not None
    r_max = agg.r_max
    n_el = base.n_elements
    # padded per-agglomerate gather of the base CG elements (zero jacobian in
    # the padding rows -> zero windows, so clamped scatter indices are inert)
    j_idx = np.minimum(agg.offsets[:, None] + np.arange(r_max)[None, :], n_el - 1)
    valid = np.arange(r_max)[None, :] < agg.sizes[:, None]
    centers = base.mesh.centers[j_idx]
    jacs = np.where(valid, base.mesh.jacobians[j_idx], 0.0)
    seam_offsets = None if uniform else jnp.asarray(agg.offsets.astype(np.int32))
    if interp_flag == 1:
        xq = centers[:, :, None] + jacs[:, :, None] * ref.quad_nodes[None, None, :]
        cg_b = ref.basis_at_quad[:, ref.pos_to_slot]  # (n_q, w_cg) position order
        agg_b = modal_basis_vals_batched(agg.p, agg.boxes, xq)  # (m, r, n_q, bs)
        n_win = np.einsum("cs,l,la,cslm->csam", jacs, ref.quad_weights, cg_b, agg_b)
        # (m, r, w_cg, bs) -> (w_cg, bs, r, m)
        n_win = jnp.asarray(n_win.transpose(2, 3, 1, 0))
        return SeamProlong(
            n_win=n_win, inv_lump=1.0 / base.lumped_mass, offsets=seam_offsets
        )
    if interp_flag == 2:
        x_pos = ref.nodes_x[ref.pos_to_slot]
        xn = centers[:, :, None] + jacs[:, :, None] * x_pos[None, None, :]
        e = modal_basis_vals_batched(agg.p, agg.boxes, xn)  # (m, r, w_cg, bs)
        weights = np.ones((n_el, w_cg))
        weights[1:, 0] = 0.5
        weights[:-1, -1] = 0.5
        e = e * np.where(valid[:, :, None], weights[j_idx], 0.0)[:, :, :, None]
        n_win = jnp.asarray(e.transpose(2, 3, 1, 0))  # (w_cg, bs, r, m)
        return SeamProlong(
            n_win=n_win, inv_lump=jnp.ones((base.n_nodes,)), offsets=seam_offsets
        )
    raise ValueError("interp_flag must be 1 or 2 (0 = dense projection: use *_dense)")


def aggdg_cg_interpolation_dense(agg: AggMesh, base: CgMesh) -> jnp.ndarray:
    """Full consistent-mass L2 projection (interp_flag = 0; dense, analysis only)."""
    from ..ops.cg_operator import cg_to_dense

    l1 = aggdg_cg_interpolation(agg, base, 1)
    n_dense = _seam_to_dense_n(l1)
    mass = cg_to_dense(base.mass)
    import numpy as np

    return jnp.asarray(np.linalg.solve(np.asarray(mass), np.asarray(n_dense)))


# ---------------------------------------------------------------------------
# analysis-only variants kept for API parity with the reference
# ---------------------------------------------------------------------------


def cg_cg_interpolation2(low: CgMesh, high: CgMesh) -> jnp.ndarray:
    """Consistent-mass L2 projection between CG spaces (``interpolation.jl:57-85``;
    unused by the hierarchy, dense because of the global mass solve)."""
    from ..ops.cg_operator import cg_to_dense

    qx, qw = gauss_quad(low.p + high.p)
    hi_b = evaluate_nodal_basis(high.ref.basis_coeff, qx)[:, high.ref.pos_to_slot]
    lo_b = evaluate_nodal_basis(low.ref.basis_coeff, qx)[:, low.ref.pos_to_slot]
    n_ref = np.einsum("l,la,lb->ab", qw, hi_b, lo_b)  # (w_h, w_l)
    n_el = high.n_elements
    p_h, p_l = high.p, low.p
    n_dense = np.zeros((high.n_nodes, low.n_nodes))
    jac = high.mesh.jacobians
    for k in range(n_el):
        n_dense[k * p_h : k * p_h + p_h + 1, k * p_l : k * p_l + p_l + 1] += jac[k] * n_ref
    mass = np.asarray(cg_to_dense(high.mass))
    return jnp.asarray(np.linalg.solve(mass, n_dense))


def dg_dg_interpolation2(low: DgMesh, high: DgMesh) -> BlockProlong:
    """Duplicate-avoiding build variant (``interpolation.jl:111-139``); its
    entries equal :func:`dg_dg_interpolation` exactly (nodal basis is zero at
    the other endpoints), so this is the same operator."""
    return dg_dg_interpolation(low, high)
