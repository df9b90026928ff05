"""Assembled CG operators: overlapping element windows + scalar DIA band.

In the reference the CG mass/stiffness are general sparse CSC matrices built by
COO accumulation (``src/cg_mesh.jl:67-76,:99-114``).  With the framework's
spatially-sorted ("grid-order") CG node numbering — element ``k`` of order ``p``
owns nodes ``k*p .. k*p + p``, sharing endpoints with its neighbors — every CG
operator is a scalar banded matrix of bandwidth ``p``.  We keep two coupled
representations:

* ``windows``: the unassembled per-element ``(p+1) x (p+1)`` contributions, in SoA
  layout ``(w, w, n_el)``.  Galerkin coarsening and assembly read these.
* ``band``: the assembled DIA band ``(2p+1, n_nodes)`` with
  ``band[off + p, i] = A[i, i + off]``.  Matvecs, diagonals and Schwarz blocks
  read this; a matvec is ``2p+1`` shifted fused multiply-adds (bandwidth-optimal).

Strong-Dirichlet row/col surgery (``src/cg_mesh.jl:117-119``) is *folded into the
windows* of the (single) boundary element that owns each Dirichlet node before
assembly; because a 1D domain-boundary node belongs to exactly one element, the
folded assembly equals the reference's post-assembly surgery exactly, and window
-level Galerkin then equals assembled-level Galerkin (both preserve the
row/col = identity structure at the Dirichlet node).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .shifts import shift


class CgOperator(NamedTuple):
    windows: jax.Array  # (w, w, n_el), w = p + 1, position (left-to-right) order
    band: jax.Array  # (2p+1, n_nodes)

    @property
    def p(self) -> int:
        return self.windows.shape[0] - 1

    @property
    def n_el(self) -> int:
        return self.windows.shape[2]

    @property
    def n_nodes(self) -> int:
        """Real node count ``n_el * p + 1`` (derived from the windows: the
        assembled band may carry inert ghost padding when element-sharded —
        see ``parallel.distributed._pad_cg_level``)."""
        return self.n_el * self.p + 1

    @property
    def n_nodes_padded(self) -> int:
        return self.band.shape[1]


def assemble_band(windows: jax.Array) -> jax.Array:
    """Scatter-add element windows ``(w, w, n_el)`` into the DIA band."""
    w = windows.shape[0]
    p = w - 1
    n_el = windows.shape[2]
    n_nodes = n_el * p + 1
    band = jnp.zeros((2 * p + 1, n_nodes), dtype=windows.dtype)
    starts = p * jnp.arange(n_el)
    for a in range(w):
        for b in range(w):
            band = band.at[b - a + p, starts + a].add(windows[a, b, :])
    return band


def cg_from_windows(windows: jax.Array) -> CgOperator:
    return CgOperator(windows=windows, band=assemble_band(windows))


def cg_matvec(a: CgOperator, x: jax.Array) -> jax.Array:
    """``y[i] = sum_off band[off + p, i] * x[i + off]`` for x of shape ``(n_nodes,)``."""
    p = a.p
    y = a.band[p] * x
    for off in range(1, p + 1):
        y = y + a.band[off + p] * shift(x, off)
        y = y + a.band[-off + p] * shift(x, -off)
    return y


def cg_diagonal(a: CgOperator) -> jax.Array:
    return a.band[a.p]


def cg_assembled_windows(a: CgOperator) -> jax.Array:
    """Windows of the *assembled* matrix: ``W[a, b, k] = A[k p + a, k p + b]``.

    Unlike ``a.windows`` these include the neighbor-element contributions at the
    shared endpoints — exactly the blocks ``A[el.nodes, el.nodes]`` the reference
    LU-factors for its Schwarz smoothers (``src/smoother.jl:112,:127``).
    """
    p, w, n_el = a.p, a.p + 1, a.n_el
    starts = p * jnp.arange(n_el)
    out = jnp.zeros((w, w, n_el), dtype=a.band.dtype)
    for aa in range(w):
        for bb in range(w):
            out = out.at[aa, bb, :].set(a.band[bb - aa + p, starts + aa])
    return out


def cg_to_dense(a: CgOperator) -> jax.Array:
    """Materialize dense (tests / coarse solves only)."""
    p, n = a.p, a.n_nodes
    dense = jnp.zeros((n, n), dtype=a.band.dtype)
    idx = jnp.arange(n)
    for off in range(-p, p + 1):
        rows = idx[max(0, -off) : n - max(0, off)]
        dense = dense.at[rows, rows + off].set(a.band[off + p, rows])
    return dense


def cg_node_multiplicity(p: int, n_el: int, dtype=jnp.float64) -> jax.Array:
    """How many elements contain each grid node (2 at interior vertices, else 1).

    This is the reference's ``mCountingMatrix`` (``src/smoother.jl:124-132``).
    """
    n_nodes = n_el * p + 1
    mult = jnp.ones((n_nodes,), dtype=dtype)
    if n_el > 1:
        interior_vertices = p * jnp.arange(1, n_el)
        mult = mult.at[interior_vertices].add(1.0)
    return mult
