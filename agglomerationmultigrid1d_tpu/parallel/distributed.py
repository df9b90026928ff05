"""Multi-chip multigrid: element-axis domain decomposition via ``jax.sharding``.

Strategy (the "How to Scale Your Model" recipe, applied to a banded solver):

1. pick a 1D device mesh over axis ``"x"`` (ICI ring);
2. annotate every fine-level operator/vector with a ``NamedSharding`` that
   splits the trailing element/node axis; levels below a size threshold stay
   fully replicated (the multigrid coarse-grid analogue of data-parallel
   replication);
3. jit the *same* ``models.solvers`` V-cycle — XLA's SPMD partitioner turns the
   pad+slice neighbor shifts of the block-tridiagonal matvecs into one-column
   ``collective-permute``s over ICI and the norm reductions into ``psum``s.

No NCCL/MPI analogue, no hand-written communication on this path; the
hand-scheduled ``shard_map``/ring-kernel variant lives in ``parallel.halo`` and
``ops.pallas`` for when the compiler's choices need overriding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.hierarchy import BlockLevel, CgLevel, Hierarchy
from ..models.solvers import MultigridResult, multigrid, v_cycle
from ..ops.transfer_ops import BlockProlong, CgProlong, SeamProlong

AXIS = "x"


def make_solver_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (AXIS,))


def _put(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _shard_last(x, mesh):
    """Shard the trailing axis when it divides the device count, else replicate.

    CG node arrays have odd length (n_el * p + 1) and therefore stay replicated
    for now (a ghost-padded representation can lift this later); all block-level
    arrays in the standard configurations divide evenly.
    """
    n_dev = mesh.devices.size
    if x.ndim == 0 or x.shape[-1] % n_dev != 0:
        return _put(x, mesh, P())
    spec = P(*([None] * (x.ndim - 1) + [AXIS]))
    return _put(x, mesh, spec)


def _replicate(tree, mesh):
    return jax.tree_util.tree_map(lambda x: _put(x, mesh, P()), tree)


def shard_hierarchy(
    h: Hierarchy, mesh: Mesh, *, min_blocks_per_device: int = 8
) -> Hierarchy:
    """Distribute a hierarchy: fine levels element-sharded, small levels replicated.

    A level is sharded when its element count gives every device at least
    ``min_blocks_per_device`` blocks; a transfer is sharded iff its coarse side
    is.  The coarsest dense LU is always replicated.
    """
    n_dev = mesh.devices.size

    def level_size(level):
        if isinstance(level, CgLevel):
            return level.a.n_el
        return level.a.n_blocks

    sharded = [level_size(lv) >= n_dev * min_blocks_per_device for lv in h.levels]

    new_levels = []
    for lv, sh in zip(h.levels, sharded):
        if not sh:
            new_levels.append(_replicate(lv, mesh))
        else:
            new_levels.append(jax.tree_util.tree_map(lambda x: _shard_last(x, mesh), lv))

    new_transfers = []
    for k, tr in enumerate(h.transfers):
        # transfer k maps level k+1 (coarse) -> level k (fine); CgProlong is one
        # constant (w_f, w_c) matrix and is always replicated
        if sharded[k + 1] and not isinstance(tr, CgProlong):
            new_transfers.append(jax.tree_util.tree_map(lambda x: _shard_last(x, mesh), tr))
        else:
            new_transfers.append(_replicate(tr, mesh))

    return Hierarchy(
        levels=tuple(new_levels),
        transfers=tuple(new_transfers),
        coarse=_replicate(h.coarse, mesh),
    )


def shard_vector(x: jax.Array, mesh: Mesh) -> jax.Array:
    return _shard_last(x, mesh)


def distributed_v_cycle(h: Hierarchy, x0, b, **kw):
    """Jitted V-cycle on a sharded hierarchy (XLA inserts the collectives)."""
    return jax.jit(lambda hh, x, bb: v_cycle(hh, x, bb, **kw))(h, x0, b)


def distributed_multigrid(h: Hierarchy, x0, b, maxiter=100, tol=1e-10, **kw) -> MultigridResult:
    return multigrid(h, x0, b, maxiter, tol, **kw)
