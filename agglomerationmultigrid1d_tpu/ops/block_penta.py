"""Block-pentadiagonal operators: the Schur stiffness of *mixed-switch* DG.

With the default (or any uniform) switch function the DG Schur stiffness
``A = C - D M^-1 G`` stays block-tridiagonal (``ops.block_tridiag.bt_mul_bt``'s
structural argument).  A *mixed* per-vertex switch (the explicit-switch
constructor, ``/root/reference/src/dg_mesh.jl:114-138``) breaks that: D and
M^-1 G then carry lower *and* upper couplings at flipped vertices, so their
product has nonzero distance-2 blocks and A is block-**penta**diagonal — the
reference's generic CSC matrices absorb this silently; here it gets its own
explicit format so nothing is ever truncated.

Same SoA layout as :class:`~.block_tridiag.BlockTridiag`, five diagonals:
``lower2[:, :, k]`` couples block-row ``k`` to block-col ``k - 2`` (entries
0, 1 unused), ``upper2`` to ``k + 2`` (entries n-2, n-1 unused).

Only ``A`` is ever pentadiagonal: G, D, C and every Galerkin projection of
them stay block-tridiagonal (transfers are block-aligned), so the solver needs
just the matvec, the diagonal blocks (smoothers), and a direct solve — the
latter by *pair-merging* adjacent blocks, which turns a pentadiagonal operator
with block size ``bs`` into a tridiagonal one with block size ``2 bs`` and
reuses the block-cyclic-reduction coarse solver unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .block_tridiag import BlockTridiag, block_mul
from .shifts import shift


class BlockPenta(NamedTuple):
    lower2: jax.Array  # (bs, bs, n) couples row k to col k-2
    lower: jax.Array  # (bs, bs, n) couples row k to col k-1
    diag: jax.Array  # (bs, bs, n)
    upper: jax.Array  # (bs, bs, n) couples row k to col k+1
    upper2: jax.Array  # (bs, bs, n) couples row k to col k+2

    @property
    def block_size(self) -> int:
        return self.diag.shape[0]

    @property
    def n_blocks(self) -> int:
        return self.diag.shape[2]

    @property
    def n_dof(self) -> int:
        return self.diag.shape[0] * self.diag.shape[2]


def bp5_matvec(a: BlockPenta, x: jax.Array) -> jax.Array:
    """``y[:, k] = sum_d A[k, k+d] x_{k+d}`` over d in [-2, 2]; x is ``(bs, n)``."""
    y = jnp.einsum("ijn,jn->in", a.diag, x)
    y = y + jnp.einsum("ijn,jn->in", a.lower, shift(x, -1))
    y = y + jnp.einsum("ijn,jn->in", a.upper, shift(x, +1))
    y = y + jnp.einsum("ijn,jn->in", a.lower2, shift(x, -2))
    y = y + jnp.einsum("ijn,jn->in", a.upper2, shift(x, +2))
    return y


def bt_as_penta(a: BlockTridiag) -> BlockPenta:
    z = jnp.zeros_like(a.diag)
    return BlockPenta(lower2=z, lower=a.lower, diag=a.diag, upper=a.upper, upper2=z)


def bp5_sub(a: BlockPenta, b: BlockPenta) -> BlockPenta:
    return BlockPenta(*(x - y for x, y in zip(a, b)))


def bt_mul_bt_full(a: BlockTridiag, b: BlockTridiag) -> BlockPenta:
    """``A @ B`` of two block-tridiagonals, keeping the distance-2 blocks
    (the general product :func:`~.block_tridiag.bt_mul_bt` drops)."""
    mm = block_mul
    diag = (
        mm(a.lower, shift(b.upper, -1)) + mm(a.diag, b.diag) + mm(a.upper, shift(b.lower, +1))
    )
    lower = mm(a.lower, shift(b.diag, -1)) + mm(a.diag, b.lower)
    upper = mm(a.diag, b.upper) + mm(a.upper, shift(b.diag, +1))
    lower2 = mm(a.lower, shift(b.lower, -1))
    upper2 = mm(a.upper, shift(b.upper, +1))
    return BlockPenta(lower2=lower2, lower=lower, diag=diag, upper=upper, upper2=upper2)


def bp5_diag_blocks(a: BlockPenta) -> jax.Array:
    return a.diag


def bp5_to_dense(a: BlockPenta) -> jax.Array:
    """Materialize dense (tests / small coarse factorization only)."""
    import numpy as np

    bs, n = a.block_size, a.n_blocks
    dense = np.zeros((n * bs, n * bs), dtype=np.asarray(a.diag).dtype)
    diags = {-2: a.lower2, -1: a.lower, 0: a.diag, 1: a.upper, 2: a.upper2}
    for d, mat in diags.items():
        m = np.asarray(mat)
        for k in range(max(0, -d), n - max(0, d)):
            dense[k * bs : (k + 1) * bs, (k + d) * bs : (k + d + 1) * bs] = m[:, :, k]
    return jnp.asarray(dense)


def bp5_pair_merge(a: BlockPenta) -> BlockTridiag:
    """Re-block a pentadiagonal operator into a tridiagonal one of block size
    ``2 bs`` by merging adjacent block pairs (odd ``n`` pads one trailing
    identity block; the matching rhs padding is zeros, see
    ``ops.coarse_solve.PaddedBTCoarseSolver``).

    Host-side setup utility (NumPy): used once to factorize a pentadiagonal
    coarsest level through the unchanged block-cyclic-reduction solver.
    """
    import numpy as np

    bs, n = a.block_size, a.n_blocks
    n_pad = n + (n % 2)
    m = {}
    for d, mat in zip((-2, -1, 0, 1, 2), a):
        x = np.zeros((bs, bs, n_pad), dtype=np.asarray(a.diag).dtype)
        x[:, :, :n] = np.asarray(mat)
        # zero the convention-unused band slots so garbage never merges in
        x[:, :, : max(0, -d)] = 0.0
        if d > 0:
            x[:, :, n_pad - d :] = 0.0
        m[d] = x
    if n_pad != n:
        m[0][:, :, n] = np.eye(bs)  # inert padding row (rhs padding is zero)

    n2 = n_pad // 2
    diag = np.zeros((2 * bs, 2 * bs, n2), dtype=m[0].dtype)
    lower = np.zeros_like(diag)
    upper = np.zeros_like(diag)
    lo, hi = slice(0, bs), slice(bs, 2 * bs)
    ev, od = (slice(None), slice(None), slice(0, None, 2)), (
        slice(None), slice(None), slice(1, None, 2),
    )
    # merged block j spans fine blocks (2j, 2j+1); a fine coupling row k ->
    # col k+d lands at merged offset (k+d)//2 - k//2, sub-slot (k%2, (k+d)%2)
    lower[lo, lo, :] = m[-2][ev]
    lower[lo, hi, :] = m[-1][ev]
    diag[lo, lo, :] = m[0][ev]
    diag[lo, hi, :] = m[1][ev]
    upper[lo, lo, :] = m[2][ev]
    lower[hi, hi, :] = m[-2][od]
    diag[hi, lo, :] = m[-1][od]
    diag[hi, hi, :] = m[0][od]
    upper[hi, lo, :] = m[1][od]
    upper[hi, hi, :] = m[2][od]
    return BlockTridiag(jnp.asarray(lower), jnp.asarray(diag), jnp.asarray(upper))
