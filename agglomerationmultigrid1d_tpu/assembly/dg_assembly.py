"""DG first-order-system ("flux") operator and rhs assembly.

Counterpart of ``src/dg_mesh.jl:144-457``.  The LDG-with-penalty scheme builds
three operators over element blocks — G (gradient), D (divergence), C (Dirichlet
penalty) — and the Schur stiffness is formed by the caller as
``A = C - D M^-1 G`` (cf. ``mesh_heirarchy.jl:71-72``).

Structure in 1D (uniform upwinding u-hat = u_left, q-hat = q_right):

* volume term  K[i,j] = sum_l w_l phi'_i phi_j  on every diagonal block of G, D
  (jacobians cancel in 1D, ``dg_mesh.jl:157-160``);
* every interior vertex contributes 4 scalar entries — two diagonal, one on G's
  lower block diagonal, one on D's upper block diagonal
  (``dg_mesh.jl:230-247``);
* Dirichlet/Neumann ends touch a single scalar entry each
  (``dg_mesh.jl:181-215``).

Everything is therefore pure slicing on the (bs, bs, n) diagonals — no scatter.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.dg_mesh import DgMesh
from ..mesh.topology import BoundaryCondition
from ..ops.block_tridiag import BlockTridiag, bt_zeros


def _volume_ref(dg: DgMesh) -> np.ndarray:
    ref = dg.ref
    return np.einsum("l,li,lj->ij", ref.quad_weights, ref.deriv_at_quad, ref.basis_at_quad)


def dg_flux_operators(
    dg: DgMesh, bc: BoundaryCondition, c_dir: float
) -> tuple[BlockTridiag, BlockTridiag, BlockTridiag]:
    """(G, D, C) block-tridiagonal operators (cf. ``dg_mesh.jl:144-336``)."""
    p = dg.p
    bs = p + 1
    n = dg.n_elements
    s1 = 1 if p >= 1 else 0  # slot of the right endpoint value

    # assembled in host NumPy (one pass each, no eager-JAX scatter copies on
    # the O(n)-sized diagonals), converted to device arrays once at the end
    g_lower = np.zeros((bs, bs, n))
    g_diag = np.zeros((bs, bs, n))
    g_upper = np.zeros((bs, bs, n))
    d_lower = np.zeros((bs, bs, n))
    d_diag = np.zeros((bs, bs, n))
    d_upper = np.zeros((bs, bs, n))
    c_diag = np.zeros((bs, bs, n))

    if p >= 1:
        k_vol = _volume_ref(dg)
        g_diag += k_vol[:, :, None]
        d_diag += k_vol[:, :, None]

    # interior vertices, default rule: u-hat from the left element (its
    # right-endpoint slot), q-hat from the right element (its left-endpoint
    # slot).  Sign convention per vertex: left-element row -1, right-element
    # row +1 (outgoing/incoming trace, ``dg_mesh.jl:230-247``).
    if n > 1 and dg.u_hat_left is None:
        g_lower[0, s1, 1:] += 1.0
        g_diag[s1, s1, :-1] += -1.0
        d_diag[0, 0, 1:] += 1.0
        d_upper[s1, 0, :-1] += -1.0
    elif n > 1:
        # explicit switch (``dg_mesh.jl:114-138``): at flipped vertices u-hat
        # comes from the RIGHT element's left-endpoint trace and q-hat from the
        # LEFT element's right-endpoint trace (mirrored couplings).  This
        # deliberately deviates from (and fixes) the reference's literal
        # flipped-vertex behavior, which hard-codes uhatEl.mNodesInd[2] /
        # qhatEl.mNodesInd[1] and therefore evaluates a flipped trace at the
        # NON-shared endpoint; the shared-vertex trace used here is the
        # consistent alternating flux.
        sw = np.asarray(dg.u_hat_left, dtype=np.float64)
        fl = 1.0 - sw
        g_lower[0, s1, 1:] += sw
        g_diag[s1, s1, :-1] += -sw
        g_diag[0, 0, 1:] += fl
        g_upper[s1, 0, :-1] += -fl
        d_diag[0, 0, 1:] += sw
        d_upper[s1, 0, :-1] += -sw
        d_diag[s1, s1, :-1] += -fl
        d_lower[0, s1, 1:] += fl

    # domain boundary vertices
    if bc.dir_left:
        d_diag[0, 0, 0] += 1.0
        c_diag[0, 0, 0] += c_dir
    elif bc.neu_left:
        g_diag[0, 0, 0] += 1.0
    if bc.dir_right:
        d_diag[s1, s1, -1] += -1.0
        c_diag[s1, s1, -1] += c_dir
    elif bc.neu_right:
        g_diag[s1, s1, -1] += -1.0

    zero = jnp.zeros((bs, bs, n))
    g = BlockTridiag(
        lower=jnp.asarray(g_lower), diag=jnp.asarray(g_diag),
        upper=zero if dg.u_hat_left is None else jnp.asarray(g_upper),
    )
    d = BlockTridiag(
        lower=zero if dg.u_hat_left is None else jnp.asarray(d_lower),
        diag=jnp.asarray(d_diag), upper=jnp.asarray(d_upper),
    )
    c = BlockTridiag(lower=zero, diag=jnp.asarray(c_diag), upper=zero)
    return g, d, c


@functools.partial(jax.jit, static_argnums=(4,))
def _dg_load_jit(jac, centers, quad_nodes, wphi, func: Callable) -> jax.Array:
    xq = centers[None, :] + jac[None, :] * quad_nodes[:, None]  # (n_q, n)
    fv = func(xq) * jac[None, :]  # (n_q, n)
    # sum_l wphi[l, i] fv[l, k] unrolled over the tiny l (einsum would batch a
    # tiny contraction; the fused broadcast-sum is one pass)
    return sum(wphi[l][:, None] * fv[l][None, :] for l in range(wphi.shape[0]))


def dg_load_vector(dg: DgMesh, func: Callable) -> jax.Array:
    """Volume load  f[i, k] = J_k sum_l w_l phi_i f(x_kl)  as ``(bs, n)``."""
    ref = dg.ref
    wphi = np.asarray(ref.quad_weights)[:, None] * np.asarray(ref.basis_at_quad)
    return _dg_load_jit(
        jnp.asarray(dg.mesh.jacobians), jnp.asarray(dg.mesh.centers),
        jnp.asarray(ref.quad_nodes), jnp.asarray(wphi), func,
    )


def dg_flux_rhs(
    dg: DgMesh, func: Callable, bc: BoundaryCondition, c_dir: float
) -> tuple[jax.Array, jax.Array]:
    """(f, r) right-hand sides (cf. ``dg_mesh.jl:342-457``).

    The solved system's rhs is formed by the caller as ``b = f - D M^-1 r``.
    """
    p = dg.p
    s1 = 1 if p >= 1 else 0
    f = dg_load_vector(dg, func)
    r = jnp.zeros_like(f)

    if bc.dir_left:
        g = bc.left[1]
        f = f.at[0, 0].add(c_dir * g)
        r = r.at[0, 0].add(-g)
    elif bc.neu_left:
        f = f.at[0, 0].add(-bc.left[1])
    if bc.dir_right:
        g = bc.right[1]
        f = f.at[s1, -1].add(c_dir * g)
        r = r.at[s1, -1].add(g)
    elif bc.neu_right:
        f = f.at[s1, -1].add(bc.right[1])
    return f, r


# -- standalone single-operator variants (kept equivalent, cf. dg_mesh.jl:474-943) --


def gradient(dg: DgMesh, bc: BoundaryCondition) -> BlockTridiag:
    g, _, _ = dg_flux_operators(dg, bc, 0.0)
    return g


def divergence(dg: DgMesh, bc: BoundaryCondition) -> BlockTridiag:
    _, d, _ = dg_flux_operators(dg, bc, 0.0)
    return d


def c_matrix(dg: DgMesh, bc: BoundaryCondition, c_dir: float) -> BlockTridiag:
    _, _, c = dg_flux_operators(dg, bc, c_dir)
    return c


def r_vector(dg: DgMesh, bc: BoundaryCondition) -> jax.Array:
    _, r = dg_flux_rhs(dg, lambda x: jnp.zeros_like(x), bc, 0.0)
    return r


def f_vector(dg: DgMesh, func: Callable, bc: BoundaryCondition, c_dir: float) -> jax.Array:
    f, _ = dg_flux_rhs(dg, func, bc, c_dir)
    return f
