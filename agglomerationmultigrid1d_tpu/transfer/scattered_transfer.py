"""Transfers to/from scattered (non-contiguous) agglomeration levels.

The prolongation from a scattered level is *one dense block per fine element*
— fine element ``e`` reads only its owner agglomerate ``cols[e]`` — i.e. a
block-COO matrix whose rows are the identity enumeration.  That specialization
(:class:`ScatteredProlong`) makes the solve-path transfer one gather + one
batched block product (prolong) and one ``segment_sum`` (restrict), and makes
Galerkin projection a pure re-keying of the fine operator's entries:

    (P^T B P)[assign[r], assign[c]]  +=  P_r^T  B[r, c]  P_c

for every block entry ``(r, c)`` of the fine operator — no general SpGEMM.

Builders mirror the contiguous interpolation semantics exactly
(``src/interpolation.jl:226-324``): modal -> nodal pointwise evaluation onto a
DG base, and exact linear-in-linear re-expansion between agglomeration levels.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.dg_mesh import DgMesh
from ..mesh.scattered_agg import ScatteredAggMesh
from ..numerics import modal_basis_vals_batched
from ..ops.block_coo import BlockCOO, bcoo_coalesce
from ..ops.block_tridiag import BlockTridiag


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("cols", "blocks"),
    meta_fields=("n_coarse",),
)
@dataclasses.dataclass(frozen=True)
class ScatteredProlong:
    """Per-fine-element dense blocks into an arbitrary owner map."""

    cols: jax.Array  # (n_f,) int32 owner agglomerate of each fine element
    blocks: jax.Array  # (bs_f, bs_c, n_f)
    n_coarse: int  # static coarse block count

    @property
    def bs_fine(self) -> int:
        return self.blocks.shape[0]

    @property
    def bs_coarse(self) -> int:
        return self.blocks.shape[1]

    @property
    def n_fine(self) -> int:
        return self.blocks.shape[2]


def sp_prolong(l: ScatteredProlong, xc: jax.Array) -> jax.Array:
    """``(bs_c, n_c) -> (bs_f, n_f)``."""
    xg = xc[:, l.cols]  # (bs_c, n_f)
    out = l.blocks[:, 0, :] * xg[0][None, :]
    for b in range(1, l.bs_coarse):
        out = out + l.blocks[:, b, :] * xg[b][None, :]
    return out


def sp_restrict(l: ScatteredProlong, rf: jax.Array) -> jax.Array:
    """``P^T r``: ``(bs_f, n_f) -> (bs_c, n_c)``."""
    contrib = l.blocks[0, :, :] * rf[0][None, :]
    for a in range(1, l.bs_fine):
        contrib = contrib + l.blocks[a, :, :] * rf[a][None, :]
    return jax.ops.segment_sum(contrib.T, l.cols, num_segments=l.n_coarse).T


def scattered_dg_interpolation(sa: ScatteredAggMesh, base: DgMesh) -> ScatteredProlong:
    """Modal -> nodal evaluation of the owner agglomerate's basis at each base
    element's nodes (the scattered counterpart of ``aggdg_dg_interpolation``,
    cf. ``interpolation.jl:270-292``)."""
    centers, jacs = base.mesh.centers, base.mesh.jacobians
    xn = centers[:, None] + jacs[:, None] * np.asarray(base.ref.nodes_x)[None, :]
    per_el = modal_basis_vals_batched(sa.p, sa.boxes[sa.assign], xn)  # (n, w, bs)
    return ScatteredProlong(
        cols=jnp.asarray(sa.assign, jnp.int32),
        blocks=jnp.asarray(np.moveaxis(per_el, 0, -1)),  # (w, bs, n)
        n_coarse=sa.n_agg,
    )


def scattered_scattered_interpolation(coarse: ScatteredAggMesh, fine) -> ScatteredProlong:
    """Exact re-expansion of the coarse modal basis in each fine agglomerate's
    modal basis (both linear, so the representation is exact — the same
    closed form as ``_aggdg_aggdg_blocks_uniform``):

        1                  = phi_f0
        2 (x - Xc) / H     = (h_f / H) phi_f1 + (2 (xc_f - Xc) / H) phi_f0
    """
    if coarse.p != fine.p:
        raise ValueError("the two agglomerated meshes must have the same p")
    owner = coarse.sub_assign  # (n_fine_agg,)
    if owner.shape[0] != fine.n_agg:
        raise ValueError(
            "coarse.sub_assign does not index the fine level — build the "
            "coarse mesh with coarsen_scattered_agg_mesh(fine, groups)"
        )
    nf = fine.n_agg
    if coarse.p == 0:
        blocks = np.ones((1, 1, nf))
    else:
        hf = fine.boxes[:, 1] - fine.boxes[:, 0]
        cf = 0.5 * (fine.boxes[:, 0] + fine.boxes[:, 1])
        hc = (coarse.boxes[:, 1] - coarse.boxes[:, 0])[owner]
        cc = (0.5 * (coarse.boxes[:, 0] + coarse.boxes[:, 1]))[owner]
        blocks = np.zeros((2, 2, nf))
        blocks[0, 0] = 1.0
        blocks[0, 1] = 2.0 * (cf - cc) / hc
        blocks[1, 1] = hf / hc
    return ScatteredProlong(
        cols=jnp.asarray(owner, jnp.int32),
        blocks=jnp.asarray(blocks),
        n_coarse=coarse.n_agg,
    )


def scattered_galerkin(l: ScatteredProlong, b) -> BlockCOO:
    """``P^T B P`` for ``B`` block-tridiagonal or block-COO over the fine
    blocks: re-key every fine entry ``(r, c)`` to ``(cols[r], cols[c])`` with
    the two-sided block sandwich, then coalesce (host, setup only)."""
    cols = np.asarray(l.cols, np.int64)
    pb = np.asarray(l.blocks)  # (bs_f, bs_c, n_f)

    if isinstance(b, BlockTridiag):
        bs, n = b.block_size, b.n_blocks
        k = np.arange(n)
        rows_f = np.concatenate([k, k[1:], k[:-1]])
        cols_f = np.concatenate([k, k[1:] - 1, k[:-1] + 1])
        blocks_f = np.concatenate(
            [np.asarray(b.diag), np.asarray(b.lower[:, :, 1:]), np.asarray(b.upper[:, :, :-1])],
            axis=2,
        )
    elif isinstance(b, BlockCOO):
        rows_f = np.asarray(b.rows, np.int64)
        cols_f = np.asarray(b.cols, np.int64)
        blocks_f = np.asarray(b.blocks)
    else:
        raise TypeError(type(b))

    #  P_r^T  B[r, c]  P_c   — batched over the fine entries
    sandw = np.einsum(
        "abt,bct,cdt->adt", pb[:, :, rows_f].transpose(1, 0, 2), blocks_f, pb[:, :, cols_f]
    )
    return bcoo_coalesce(cols[rows_f], cols[cols_f], sandw, l.n_coarse, l.n_coarse)
