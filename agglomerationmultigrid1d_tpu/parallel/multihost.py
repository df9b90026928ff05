"""Multi-host (multi-process) solves: per-process LOCAL-shard construction.

The single-controller path (``parallel.distributed.shard_hierarchy``)
materializes every level globally on one host before ``device_put`` — fine for
one process driving N chips, but at the 10^8-DoF north star the global fine
level is itself the host-memory wall, and on a real pod slice each host can
only address its own chips anyway.  This module is the multi-host skeleton:

* :func:`initialize` wires ``jax.distributed.initialize`` (with gloo CPU
  collectives for the multi-process CPU test rig — a TPU pod slice picks its
  native ICI backend automatically);
* :func:`build_sharded_xl_problem` constructs the stencil-inflated hierarchy
  (``models.stencil_setup``) shard by shard: every process materializes ONLY
  the slices owned by its addressable devices (via
  ``jax.make_array_from_single_device_arrays``), plus the O(n/z) stencil
  problem that every process rebuilds redundantly (cheaper than communicating
  it).  No host ever holds a global fine-level array — including the rhs,
  whose volume load is evaluated per-shard.

Levels below ``min_blocks_per_device`` blocks per device replicate, exactly
like the single-controller policy; the coarse factorization always replicates.
The result solves with the same ``models.solvers`` entry points — XLA's SPMD
partitioner emits collective-permutes over ICI between hosts — or the fused
``shard=`` kernel path (``parallel.sharded_kernels``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mesh.topology import BoundaryCondition
from ..models.hierarchy import BlockLevel, Hierarchy
from ..ops.block_tridiag import BlockTridiag
from ..ops.df64 import FF, BlockTridiagFF
from ..ops.transfer_ops import BlockProlong
from ..utils.config import HierarchySpec
from ..utils.host import on_host
from .distributed import AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    *,
    cpu_collectives: str | None = None,
    **kw,
) -> None:
    """``jax.distributed.initialize`` wrapper.

    On a TPU pod slice the three arguments are auto-detected from the
    environment (call with no arguments).  For the multi-process CPU rig pass
    them explicitly and set ``cpu_collectives="gloo"`` BEFORE any backend is
    instantiated.  No-op if the distributed runtime is already up.
    """
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:  # already initialized
            return
    except Exception:  # pragma: no cover — private API moved; initialize will raise
        pass
    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    jax.distributed.initialize(coordinator_address, num_processes, process_id, **kw)


def multihost_mesh(devices=None) -> Mesh:
    """1D solver mesh over ALL processes' devices (call after initialize)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (AXIS,))


# ---------------------------------------------------------------------------
# Local-shard materialization of stencil-inflated arrays
# ---------------------------------------------------------------------------


def _slice_of_inflated(st, n_big: int, lo: int, hi: int) -> np.ndarray:
    """Columns [lo, hi) of ``concat(left, mid*(n-bwl-bwr), right)`` without
    forming the global array (host NumPy; one shard's worth of memory)."""
    left, mid, right = np.asarray(st.left), np.asarray(st.mid), np.asarray(st.right)
    bwl, bwr = left.shape[-1], right.shape[-1]
    mid_end = n_big - bwr
    segs = []
    if lo < bwl:
        segs.append(left[..., lo : min(hi, bwl)])
    m0, m1 = max(lo, bwl), min(hi, mid_end)
    if m1 > m0:
        segs.append(np.broadcast_to(mid, mid.shape[:-1] + (m1 - m0,)))
    if hi > mid_end:
        r0 = max(lo, mid_end) - mid_end
        segs.append(right[..., r0 : hi - mid_end])
    return segs[0] if len(segs) == 1 else np.concatenate(segs, axis=-1)


def _sharded_from_stencil(st, n_big: int, mesh: Mesh, extra_shape: tuple) -> jax.Array:
    """Assemble a globally-sharded array from a stencil: each addressable
    device gets exactly its slice, built locally."""
    shape = extra_shape + (n_big,)
    spec = P(*([None] * len(extra_shape) + [AXIS]))
    s = NamedSharding(mesh, spec)
    idx_map = s.addressable_devices_indices_map(shape)
    arrays = []
    for d, idx in idx_map.items():
        sl = idx[-1]
        lo = 0 if sl.start is None else sl.start
        hi = n_big if sl.stop is None else sl.stop
        arrays.append(jax.device_put(_slice_of_inflated(st, n_big, lo, hi), d))
    return jax.make_array_from_single_device_arrays(shape, s, arrays)


def _replicated(x, mesh: Mesh) -> jax.Array:
    """Replicate a (small) host array onto every device without collectives."""
    x = np.asarray(x)
    s = NamedSharding(mesh, P())
    arrays = [jax.device_put(x, d) for d in s.addressable_devices]
    return jax.make_array_from_single_device_arrays(x.shape, s, arrays)


def _replicate_tree(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda x: _replicated(x, mesh), tree)


class _ShardPlan:
    """Like ``stencil_setup._Plan`` but each registered leaf is either sharded
    (stencil -> per-device slices) or replicated (small level)."""

    def __init__(self, z: int, bw: int, mesh: Mesh):
        self.z = z
        self.bw = bw
        self.mesh = mesh

    def el(self, arr, what: str, sharded: bool):
        from ..models.stencil_setup import _extract_el

        st = _extract_el(arr, self.bw, what)
        n_big = np.asarray(arr).shape[-1] * self.z
        if not sharded:
            # small level: inflate on the host (it IS small) and replicate
            return _replicated(_slice_of_inflated(st, n_big, 0, n_big), self.mesh)
        return _sharded_from_stencil(st, n_big, self.mesh, np.asarray(arr).shape[:-1])


def build_sharded_xl_problem(
    spec: HierarchySpec,
    n: int,
    func: Callable | None = None,
    bc: BoundaryCondition | None = None,
    *,
    mesh: Mesh | None = None,
    z: int | None = None,
    bw: int = 4,
    chebyshev: bool = True,
    min_blocks_per_device: int = 128,
):
    """DG-topped stencil-inflated problem, constructed shard-locally.

    Every process runs this with identical arguments (SPMD setup); the
    returned ``(h_low, a_ff, b_ff, norm_b)`` match
    :func:`~..models.stencil_setup.build_xl_problem` +
    ``distributed.shard_hierarchy`` value-for-value, but no process ever
    materializes more than ``1/n_processes`` of any sharded level (asserted in
    ``tests/test_multihost.py``).  CG-topped chains currently take the
    single-controller path (their odd node counts need the ghost-padding
    machinery of ``distributed._pad_cg_level``).
    """
    from ..models.problems import build_problem, default_model_problem
    from ..models.solvers import _ff_split_level
    from ..models.stencil_setup import (
        _share_fine_hi,
        _stencil_mesh,
        default_stencil_factor,
    )
    from ..models.hierarchy import (
        _coarse_lu,
        chebyshev_hierarchy,
        prepare_fast_smoothers,
        strip_hierarchy,
    )
    from ..models.stencil_setup import _inflate_bt_host
    from ..smoothers.smoother import BlockJacobiSmoother, ChebyshevSmoother
    from ..utils.precision import hierarchy_astype, tree_astype

    if mesh is None:
        mesh = multihost_mesh()
    if spec.cg_orders:
        raise ValueError(
            "build_sharded_xl_problem supports DG-topped chains (the north-star "
            "configuration); CG-topped chains use the single-controller path"
        )
    if z is None:
        z = default_stencil_factor(spec, n, bw)
    n0 = n // z
    h = 1.0 / n

    func_, u_ex, ux_ex = default_model_problem()
    func = func or func_
    if bc is None:
        bc = BoundaryCondition(("neu", ux_ex(0.0)), ("dir", u_ex(1.0)))

    # identical tiny stencil build on every process (cheaper than comms)
    with on_host():
        prob0 = build_problem(spec, n0, func, bc, mesh=_stencil_mesh(n0, h), to_device=False)
        h64 = strip_hierarchy(prob0.hierarchy)
        a_ff_small = _ff_split_level(h64.levels[0])
        h_low0 = hierarchy_astype(h64, jnp.float32)
        h_low0 = _share_fine_hi(h_low0, a_ff_small)
        h_low0 = prepare_fast_smoothers(h_low0)
        if chebyshev:
            h_low0 = chebyshev_hierarchy(h_low0, power_iters=50, safety=1.1)

    n_dev = mesh.devices.size
    plan = _ShardPlan(z, bw, mesh)

    def _bt(a: BlockTridiag, what: str, sharded: bool) -> BlockTridiag:
        return BlockTridiag(
            lower=plan.el(a.lower, what + ".lower", sharded),
            diag=plan.el(a.diag, what + ".diag", sharded),
            upper=plan.el(a.upper, what + ".upper", sharded),
        )

    levels = []
    shard_flags = []
    for k, lv in enumerate(h_low0.levels):
        assert isinstance(lv, BlockLevel)
        n_big_k = lv.a.n_blocks * z
        sh = n_big_k >= n_dev * min_blocks_per_device and n_big_k % n_dev == 0
        sh = sh and k < len(h_low0.levels) - 1  # coarsest always replicates
        shard_flags.append(sh)
        s = lv.smoother
        base = s.base if isinstance(s, ChebyshevSmoother) else s
        assert isinstance(base, BlockJacobiSmoother)
        new_base = BlockJacobiSmoother(
            inv=plan.el(base.inv, f"L{k}.inv", sh),
            ml=None if base.ml is None else plan.el(base.ml, f"L{k}.ml", sh),
            mu=None if base.mu is None else plan.el(base.mu, f"L{k}.mu", sh),
        )
        new_s = s._replace(base=new_base) if isinstance(s, ChebyshevSmoother) else new_base
        levels.append(
            BlockLevel(
                a=_bt(lv.a, f"L{k}.a", sh),
                g=_replicate_tree(lv.g, mesh), d=_replicate_tree(lv.d, mesh),
                c=_replicate_tree(lv.c, mesh),
                mass_inv=_replicate_tree(lv.mass_inv, mesh),
                smoother=new_s,
            )
        )

    transfers = []
    for k, t in enumerate(h_low0.transfers):
        assert isinstance(t, BlockProlong)
        # transfer k maps level k+1 (coarse) -> k (fine): sharded iff coarse is
        transfers.append(BlockProlong(blocks=plan.el(t.blocks, f"T{k}.blocks", shard_flags[k + 1])))

    # full-size coarse factorization from f64 stencils, replicated (tiny)
    with on_host():
        a_coarse = _inflate_bt_host(h64.levels[-1].a, z, bw, "coarse.a")
        coarse = tree_astype(
            _coarse_lu(BlockLevel(a=a_coarse, g=None, d=None, c=None,
                                  mass_inv=None, smoother=None)),
            jnp.float32,
        )
    coarse = _replicate_tree(coarse, mesh)

    h_low = Hierarchy(levels=tuple(levels), transfers=tuple(transfers), coarse=coarse)

    # float-float fine operator: hi shares the fine level's buffers, lo is
    # inflated shard-locally from the split's stencils
    lo_bt = BlockTridiag(
        lower=plan.el(np.asarray(a_ff_small.lo.lower), "a_ff.lo.lower", shard_flags[0]),
        diag=plan.el(np.asarray(a_ff_small.lo.diag), "a_ff.lo.diag", shard_flags[0]),
        upper=plan.el(np.asarray(a_ff_small.lo.upper), "a_ff.lo.upper", shard_flags[0]),
    )
    a_ff = BlockTridiagFF(hi=h_low.levels[0].a, lo=lo_bt)

    # rhs: per-shard volume load (host f64, one shard at a time) + the
    # f-independent BC delta on the outermost elements + float-float split
    b_ff, norm_b = _sharded_dg_b(prob0, spec, n, h, func, bw, mesh, shard_flags[0])
    return h_low, a_ff, b_ff, norm_b


def _sharded_dg_b(prob0, spec, n, h, func, bw, mesh, sharded):
    """Shard-local rhs: each device's slice of the volume load is evaluated on
    its owning host (cf. ``stencil_setup._uniform_dg_b`` — every BC term is an
    additive, f-independent patch on the outermost ``bw`` elements), split to
    float-float, assembled with ``make_array_from_single_device_arrays``, and
    the global ||b|| reduced on-device (a psum across processes)."""
    from ..assembly.dg_assembly import dg_load_vector

    dg0 = prob0.meshes[0]
    ref = dg0.ref
    qw = np.asarray(ref.quad_weights)
    basis = np.asarray(ref.basis_at_quad)  # (n_q, bs)
    qx = np.asarray(ref.quad_nodes)
    with on_host():
        delta = np.asarray(prob0.b) - np.asarray(dg_load_vector(dg0, func))
    bs = delta.shape[0]
    k_patch = min(bw, delta.shape[1] // 2)

    def local_b(lo, hi):
        centers = (np.arange(lo, hi, dtype=np.float64) + 0.5) * h
        xq = centers[None, :] + (h / 2.0) * qx[:, None]  # (n_q, m)
        fv = np.asarray(func(jnp.asarray(xq))) * (h / 2.0)
        loc = np.einsum("l,li,lk->ik", qw, basis, fv)
        # left patch: global elements [0, k_patch) -> delta columns [0, k_patch)
        pl0, pl1 = max(lo, 0), min(hi, k_patch)
        if pl1 > pl0:
            loc[:, pl0 - lo : pl1 - lo] += delta[:, pl0:pl1]
        # right patch: global element n - j maps to delta column n0 - j
        pr0, pr1 = max(lo, n - k_patch), hi
        if pr1 > pr0:
            d0 = delta.shape[1] - (n - pr0)
            loc[:, pr0 - lo : pr1 - lo] += delta[:, d0 : d0 + (pr1 - pr0)]
        return loc

    shape = (bs, n)
    s = NamedSharding(mesh, P(None, AXIS) if sharded else P())
    idx_map = s.addressable_devices_indices_map(shape)
    his, los = [], []
    for d, idx in idx_map.items():
        sl = idx[-1]
        lo = 0 if sl.start is None else sl.start
        hi = n if sl.stop is None else sl.stop
        b_loc = local_b(lo, hi)
        hi32 = b_loc.astype(np.float32)
        lo32 = (b_loc - hi32.astype(np.float64)).astype(np.float32)
        his.append(jax.device_put(hi32, d))
        los.append(jax.device_put(lo32, d))
    b_hi = jax.make_array_from_single_device_arrays(shape, s, his)
    b_lo = jax.make_array_from_single_device_arrays(shape, s, los)
    return FF(b_hi, b_lo), float(np.sqrt(_global_sq_norm(b_hi, b_lo, mesh)))


def _global_sq_norm(b_hi, b_lo, mesh) -> float:
    """sum((hi + lo)^2) over the global array, computed on-device so it works
    identically single- and multi-process (the reduction becomes a psum)."""
    acc_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    f = jax.jit(
        lambda h, l: jnp.sum((h.astype(acc_dtype) + l.astype(acc_dtype)) ** 2),
        out_shardings=NamedSharding(mesh, P()),
    )
    out = f(b_hi, b_lo)
    return float(jax.device_get(out.addressable_shards[0].data))
