"""Stencil-inflated hierarchy setup: O(1)-per-level host work at any size.

On a uniform mesh every operator this framework builds is *translation
invariant away from the domain boundary*: the volume terms depend only on the
(constant) jacobian, the flux/penalty couplings only on c_dir and the element
width, and each Galerkin projection of a constant-interior operator through a
constant-interior transfer is again constant-interior (a convolution of
convolutions).  The reference nevertheless assembles every level at full size
in serial Julia (``src/mesh_heirarchy.jl:30-181``); the host-f64 counterpart
here (:func:`~.hierarchy.build_hierarchy` / ``build_dg_hierarchy``) does the
same for parity, which at 10^8 DoF costs minutes of host bandwidth for arrays
whose interior columns are all identical.

This module instead builds the hierarchy ONCE at a small *stencil size*
``n0 = n / z`` (same element width ``h = L / n``, same ``c_dir``, same
level-count/coarsening plan — so every per-level block value is bit-identical
to the full-size build away from the boundary), extracts per-level stencils
(``bw`` boundary columns each side + one interior column), and **inflates**
them to full size directly on the accelerator as broadcasts + concats — one
tiny host->device transfer and one trivial jit regardless of problem size.
Only the O(n) right-hand side is ever materialized on the host.

Level sizes scale uniformly by ``z``, so the real coarsest level has
``z * n0_coarsest`` blocks — solved by block cyclic reduction
(:mod:`..ops.coarse_solve`), which has no size cliff.

Chebyshev spectral bounds are reused from the stencil-size hierarchy:
``lambda_max(S A)`` of the block-Jacobi-preconditioned operator converges with
n (the preconditioned spectrum is set by the local coupling pattern), and the
smoother already inflates the bound by a 5% safety factor; asserted against
the full-size power iteration in ``tests/test_stencil_setup.py``.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.topology import BoundaryCondition, Mesh1D
from ..ops.block_tridiag import BlockTridiag
from ..ops.cg_operator import CgOperator
from ..ops.transfer_ops import (
    BlockProlong,
    CgProlong,
    RaggedBlockProlong,
    SeamProlong,
)
from ..smoothers.smoother import (
    BlockJacobiSmoother,
    ChebyshevSmoother,
    JacobiSmoother,
    SchwarzSmoother,
)
from ..utils.config import HierarchySpec
from ..utils.host import on_host, to_accelerator
from .hierarchy import BlockLevel, CgLevel, Hierarchy

# stencil extraction widths, in *elements* (blocks).  Boundary influence in
# these hierarchies never exceeds 2 blocks: the fine Schur product
# ``A = C - D M^-1 G`` reaches blocks 0..1, and every r >= 2 Galerkin
# projection maps a fine boundary-affected width w to ceil((w + 1) / r) <= w
# (r = 1 CG p-coarsening is window-local and preserves width exactly).
_BW = 4


class _Stencil(NamedTuple):
    left: np.ndarray  # (..., bw)   — or (..., bw * p + 1) on node axes
    mid: np.ndarray  # (..., 1)    — or (..., p): one period
    right: np.ndarray  # (..., bw)  — or (..., bw * p)


def _check_constant(arr: np.ndarray, mid: np.ndarray, what: str, rtol) -> None:
    """The interior columns must all equal the extracted middle.

    Tolerance is dtype-aware: f64 inputs carry only the ~1e-16-relative
    jacobian noise of ``np.diff`` on a uniform mesh (rtol 1e-11); f32 inputs
    additionally jitter by one f32 ULP where an f64 value sits near a rounding
    boundary (rtol 2.4e-7).  ``rtol=None`` skips the check — used for the
    float-float ``lo`` tails, whose per-element jitter is exactly the hi
    part's allowed ULP flip (the hi+lo sum stays f64-translation-invariant,
    which the hi check enforces)."""
    if rtol is None:
        return
    if rtol == "auto":
        rtol = 2.4e-7 if arr.dtype == np.float32 else 1e-11
    tol = rtol * max(float(np.abs(arr).max()), 1e-300)
    err = float(np.abs(arr - mid).max())
    if err > tol:
        raise ValueError(
            f"{what}: interior is not translation invariant (max deviation "
            f"{err:.3e} vs tol {tol:.3e}) — stencil inflation requires a "
            "uniform mesh with uniform partitions"
        )


def _extract_el(arr, bw: int, what: str, rtol="auto") -> _Stencil:
    """Element-axis stencil: ``arr[..., k]`` constant for bw <= k < n - bw."""
    a = np.asarray(arr)
    n = a.shape[-1]
    if n < 2 * bw + 2:
        raise ValueError(f"{what}: need >= {2 * bw + 2} columns, got {n}")
    mid = a[..., n // 2 : n // 2 + 1]
    _check_constant(a[..., bw : n - bw], mid, what, rtol)
    return _Stencil(a[..., :bw].copy(), mid.copy(), a[..., n - bw :].copy())


def _extract_nodes(arr, p: int, bw: int, what: str, rtol="auto") -> _Stencil:
    """Node-axis stencil (length ``p * n_el + 1``): periodic with period p
    away from the first/last bw elements."""
    a = np.asarray(arr)
    n_el = (a.shape[-1] - 1) // p
    if a.shape[-1] != p * n_el + 1:
        raise ValueError(f"{what}: length {a.shape[-1]} is not p*n_el+1 for p={p}")
    if n_el < 2 * bw + 2:
        raise ValueError(f"{what}: need >= {2 * bw + 2} elements, got {n_el}")
    left = a[..., : bw * p + 1]
    mid = a[..., bw * p + 1 : (bw + 1) * p + 1]
    interior = a[..., bw * p + 1 : (n_el - bw) * p + 1]
    k = interior.shape[-1] // p
    tiled = np.broadcast_to(
        mid[..., None, :], mid.shape[:-1] + (k, p)
    ).reshape(mid.shape[:-1] + (k * p,))
    _check_constant(interior, tiled, what, rtol)
    return _Stencil(left.copy(), mid.copy(), a[..., a.shape[-1] - bw * p :].copy())


def _inflate_el(st: _Stencil, n_big: int) -> jax.Array:
    reps = n_big - st.left.shape[-1] - st.right.shape[-1]
    mid = jnp.broadcast_to(st.mid, st.mid.shape[:-1] + (reps,))
    return jnp.concatenate([jnp.asarray(st.left), mid, jnp.asarray(st.right)], axis=-1)


def _inflate_nodes(st: _Stencil, n_el_big: int, p: int, bw: int) -> jax.Array:
    reps = n_el_big - 2 * bw
    mid = jnp.broadcast_to(
        jnp.asarray(st.mid)[..., None, :], st.mid.shape[:-1] + (reps, p)
    ).reshape(st.mid.shape[:-1] + (reps * p,))
    return jnp.concatenate([jnp.asarray(st.left), mid, jnp.asarray(st.right)], axis=-1)


# ---------------------------------------------------------------------------
# Hierarchy planner: walk the typed pytree, emit stencils + a rebuild closure
# ---------------------------------------------------------------------------


class _Plan:
    """Accumulates (stencil, spec) pairs and passthrough leaves while walking
    the small hierarchy; ``rebuild`` re-assembles the full-size pytree from the
    inflated arrays in emission order."""

    def __init__(self, z: int, bw: int):
        self.z = z
        self.bw = bw
        self.stencils: list[_Stencil] = []
        self.specs: list[tuple] = []  # ("el", n_big) | ("node", n_el_big, p)

    def el(self, arr, what: str, rtol="auto"):
        """Register an element-axis leaf; returns its slot index."""
        st = _extract_el(arr, self.bw, what, rtol)
        n_big = np.asarray(arr).shape[-1] * self.z
        self.stencils.append(st)
        self.specs.append(("el", n_big))
        return len(self.stencils) - 1

    def node(self, arr, p: int, what: str, rtol="auto"):
        st = _extract_nodes(arr, p, self.bw, what, rtol)
        n_el_big = ((np.asarray(arr).shape[-1] - 1) // p) * self.z
        self.stencils.append(st)
        self.specs.append(("node", n_el_big, p))
        return len(self.stencils) - 1


def _is_empty(arr) -> bool:
    return arr is not None and hasattr(arr, "size") and arr.size == 0


def _plan_bt(plan: _Plan, a: BlockTridiag, what: str, rtol="auto"):
    if _is_empty(a.diag):
        return lambda out: a
    # slim fine levels carry empty off-diagonals (the action lives in the
    # smoother's M-form streams); pass empties through untouched
    def one(arr, name):
        if _is_empty(arr):
            return None
        return plan.el(arr, f"{what}.{name}", rtol)

    i, j, k = one(a.lower, "lower"), one(a.diag, "diag"), one(a.upper, "upper")
    e_low, e_up = a.lower, a.upper
    return lambda out: BlockTridiag(
        lower=e_low if i is None else out[i],
        diag=out[j],
        upper=e_up if k is None else out[k],
    )


def _plan_smoother(plan: _Plan, s, level, what: str):
    if isinstance(s, ChebyshevSmoother):
        base_fn = _plan_smoother(plan, s.base, level, what + ".base")
        lam_lo, lam_hi = s.lam_lo, s.lam_hi
        return lambda out: ChebyshevSmoother(
            base=base_fn(out), lam_lo=lam_lo, lam_hi=lam_hi
        )
    if isinstance(s, JacobiSmoother):
        if isinstance(level, CgLevel):
            i = plan.node(s.inv_diag, level.a.p, what + ".inv_diag")
        else:
            i = plan.el(s.inv_diag.reshape(level.a.block_size, -1), what + ".inv_diag")
        return lambda out: JacobiSmoother(inv_diag=out[i])
    if isinstance(s, BlockJacobiSmoother):
        i = plan.el(s.inv, what + ".inv")
        j = None if s.ml is None else plan.el(s.ml, what + ".ml")
        k = None if s.mu is None else plan.el(s.mu, what + ".mu")
        return lambda out: BlockJacobiSmoother(
            inv=out[i],
            ml=None if j is None else out[j],
            mu=None if k is None else out[k],
        )
    if isinstance(s, SchwarzSmoother):
        i = plan.el(s.inv_windows, what + ".inv_windows")
        p = s.inv_windows.shape[0] - 1
        j = None if s.mult_inv is None else plan.node(s.mult_inv, p, what + ".mult_inv")
        return lambda out: SchwarzSmoother(
            inv_windows=out[i], mult_inv=None if j is None else out[j]
        )
    raise TypeError(f"stencil inflation: unsupported smoother {type(s)}")


def _plan_level(plan: _Plan, lv, k: int):
    what = f"level[{k}]"
    if isinstance(lv, CgLevel):
        i = plan.el(lv.a.windows, what + ".windows")
        j = plan.node(lv.a.band, lv.a.p, what + ".band")
        s_fn = _plan_smoother(plan, lv.smoother, lv, what + ".smoother")
        return lambda out: CgLevel(a=CgOperator(windows=out[i], band=out[j]), smoother=s_fn(out))
    if isinstance(lv, BlockLevel):
        if not isinstance(lv.a, BlockTridiag):
            raise TypeError(
                "stencil inflation supports block-tridiagonal levels only "
                "(mixed-switch pentadiagonal operators are not translation "
                "invariant at the flipped vertices)"
            )
        if not (_is_empty(lv.g.diag) and _is_empty(lv.d.diag) and _is_empty(lv.c.diag)):
            raise ValueError(
                "strip the hierarchy before inflation (strip_hierarchy): the "
                "construction-only G/D/C operators are not part of the solve path"
            )
        a_fn = _plan_bt(plan, lv.a, what + ".a")
        g, d, c, m = lv.g, lv.d, lv.c, lv.mass_inv
        s_fn = _plan_smoother(plan, lv.smoother, lv, what + ".smoother")
        return lambda out: BlockLevel(
            a=a_fn(out), g=g, d=d, c=c, mass_inv=m, smoother=s_fn(out)
        )
    raise TypeError(type(lv))


def _plan_transfer(plan: _Plan, t, k: int):
    what = f"transfer[{k}]"
    if isinstance(t, CgProlong):
        return lambda out: t
    if isinstance(t, BlockProlong):
        i = plan.el(t.blocks, what + ".blocks")
        return lambda out: BlockProlong(blocks=out[i])
    if isinstance(t, SeamProlong):
        if t.offsets is not None:
            raise ValueError("stencil inflation requires uniform seam partitions")
        i = plan.el(t.n_win, what + ".n_win")
        j = plan.node(t.inv_lump, t.w_cg - 1, what + ".inv_lump")
        return lambda out: SeamProlong(n_win=out[i], inv_lump=out[j], offsets=None)
    if isinstance(t, RaggedBlockProlong):
        raise ValueError(
            "stencil inflation requires uniform partitions (RaggedBlockProlong "
            "transfers are position dependent); use the host build path"
        )
    raise TypeError(type(t))


@functools.partial(jax.jit, static_argnames=("specs", "bw"))
def _inflate_all(stencils: tuple, specs: tuple, bw: int) -> tuple:
    out = []
    for st, spec in zip(stencils, specs):
        if spec[0] == "el":
            out.append(_inflate_el(st, spec[1]))
        else:
            out.append(_inflate_nodes(st, spec[1], spec[2], bw))
    return tuple(out)


def _inflate_bt_host(a: BlockTridiag, z: int, bw: int, what: str) -> BlockTridiag:
    """Full-size f64 BlockTridiag on the HOST (for the coarse factorization —
    the coarsest level is small, z * n0_coarsest blocks)."""

    def one(arr, name):
        st = _extract_el(arr, bw, f"{what}.{name}")
        n_big = np.asarray(arr).shape[-1] * z
        reps = n_big - 2 * bw
        mid = np.broadcast_to(st.mid, st.mid.shape[:-1] + (reps,))
        return jnp.asarray(np.concatenate([st.left, mid, st.right], axis=-1))

    return BlockTridiag(
        lower=one(a.lower, "lower"), diag=one(a.diag, "diag"), upper=one(a.upper, "upper")
    )


def inflate_hierarchy(
    h_small: Hierarchy,
    h_small_f64: Hierarchy,
    z: int,
    *,
    bw: int = _BW,
    device=None,
) -> Hierarchy:
    """Inflate a stencil-size hierarchy to ``z``-times-larger level sizes.

    ``h_small`` is the (stripped, optionally f32-cast / Chebyshev-wrapped)
    solve-path hierarchy whose arrays are inflated on the accelerator;
    ``h_small_f64`` supplies the f64 coarsest operator for the full-size
    coarse factorization (pass ``h_small`` itself for an all-f64 inflation).
    The coarsest level must be block-tridiagonal: its full-size operator has
    ``z * n0_coarsest`` blocks and is factorized by block cyclic reduction
    on the host (``ops.coarse_solve``), then cast to ``h_small``'s dtype.
    """
    from ..utils.precision import tree_astype
    from .hierarchy import _coarse_lu

    plan = _Plan(z, bw)
    level_fns = [_plan_level(plan, lv, k) for k, lv in enumerate(h_small.levels)]
    transfer_fns = [_plan_transfer(plan, t, k) for k, t in enumerate(h_small.transfers)]

    if device is None:
        device = jax.devices()[0]
    stencils = jax.device_put(tuple(plan.stencils), device)
    out = _inflate_all(stencils, tuple(plan.specs), bw)

    levels = tuple(fn(out) for fn in level_fns)
    transfers = tuple(fn(out) for fn in transfer_fns)

    # full-size coarse factorization from the f64 coarsest stencils (host)
    coarse_lv = h_small_f64.levels[-1]
    if not (isinstance(coarse_lv, BlockLevel) and isinstance(coarse_lv.a, BlockTridiag)):
        raise TypeError(
            "stencil inflation needs a block-tridiagonal coarsest level (add "
            "agglomeration levels; a CG coarsest level would inflate past the "
            "dense-solve cap)"
        )
    with on_host():
        a_coarse = _inflate_bt_host(coarse_lv.a, z, bw, "coarse.a")
        coarse = _coarse_lu(BlockLevel(
            a=a_coarse, g=None, d=None, c=None, mass_inv=None,
            smoother=coarse_lv.smoother,
        ))
        dtype = levels[0].a.band.dtype if isinstance(levels[0], CgLevel) \
            else levels[0].a.diag.dtype
        if dtype != a_coarse.diag.dtype:
            coarse = tree_astype(coarse, dtype)
    coarse = jax.device_put(coarse, device)

    return Hierarchy(levels=levels, transfers=transfers, coarse=coarse)


# ---------------------------------------------------------------------------
# Full XL problem builders (stencil build -> inflate -> rhs)
# ---------------------------------------------------------------------------


def _stencil_mesh(n0: int, h: float) -> Mesh1D:
    """A uniform n0-element mesh with EXACTLY the full problem's element width
    (domain [0, n0 * h]): operators depend on h / c_dir / BC kinds only, so
    every interior value matches the full-size build."""
    return Mesh1D(vertex_x=np.arange(n0 + 1, dtype=np.float64) * h)


def default_stencil_factor(spec: HierarchySpec, n: int, bw: int = _BW) -> int:
    """Largest power-of-two ``z`` keeping every stencil level >= 2 bw + 2
    blocks (the extraction minimum)."""
    sizes = [n] * (len(spec.cg_orders) + len(spec.dg_orders))
    m = n
    for i in range(spec.n_agg_levels):
        m //= spec.first_agg_factor if i == 0 else spec.agg_factor
        sizes.append(m)
    smallest = min(sizes)
    z = 1
    while (
        smallest % (2 * z) == 0
        and smallest // (2 * z) >= 2 * bw + 2
        and n % (2 * z) == 0
    ):
        z *= 2
    return z


def build_xl_problem(
    spec: HierarchySpec,
    n: int,
    func: Callable | None = None,
    bc: BoundaryCondition | None = None,
    *,
    z: int | None = None,
    bw: int = _BW,
    dtype=jnp.float32,
    chebyshev: bool = True,
    slim_fine: bool = False,
    ff_levels: bool = False,
    device=None,
    domain: tuple[float, float] = (0.0, 1.0),
):
    """Build the f32 solve-path hierarchy + float-float fine operator + rhs of
    a uniform-mesh problem at ANY size with O(n0)-host setup.

    Returns ``(h_low, a_ff, b_ff, norm_b)`` ready for
    :func:`~.solvers._mixed_loop_ff` / :func:`~.solvers.multigrid_mixed` —
    the same pytrees the host path produces via ``build_problem`` +
    ``strip_hierarchy`` + ``hierarchy_astype`` + ``prepare_fast_smoothers``
    (+ ``chebyshev_hierarchy``) + ``bt_split`` / ``cg_band_split`` +
    ``ff_split``, up to the documented stencil-size Chebyshev bounds.

    The only O(n) work is the rhs: one fused host-f64 pass evaluating the
    load (plus the boundary-condition lift re-applied from stencil data),
    split to float-float and shipped — everything else moves O(bw) stencil
    columns and inflates on the accelerator.

    ``slim_fine=True`` (DG-topped chains only) additionally drops the fine
    level's materialized off-diagonals AND the whole float-float pair: the
    fine ``a`` keeps only its diagonal (the M-form smoother streams carry the
    off-diagonal action — ``solvers._mform_matvec``), and ``a_ff`` becomes a
    :class:`~..ops.df64.BTFFStencil` whose defect contracts with broadcast
    stencil blocks (zero operator traffic/residency).  Saves ~5 fine-level
    streams (~4 GB at 10^8 DoF) with identical convergence.

    ``ff_levels=True`` returns a TUPLE of per-level float-float operators in
    the ``a_ff`` slot (``a_ffs[0]`` is the usual fine operator) — the inputs
    of the progressive-precision cycles (:func:`~.solvers.v_cycle_ff`), which
    the mixed solver needs once ``cond(A) >~ 1/eps_f32`` (at the 1e8-DoF
    north star the plain f32 inner cycle stops contracting around 2e-7
    relative).  Each deeper level's hi part shares the f32 hierarchy's
    buffers; only the lo tails (~20% of operator residency) are added.
    """
    from ..mesh.cg_mesh import CgMesh
    from ..mesh.dg_mesh import DgMesh
    from ..models.problems import build_problem, default_model_problem
    from ..ops.df64 import CgBandFF, ff_split
    from ..utils.precision import hierarchy_astype
    from .hierarchy import (
        chebyshev_hierarchy,
        prepare_fast_smoothers,
        strip_hierarchy,
    )

    if device is None:
        device = jax.devices()[0]
    if z is None:
        z = default_stencil_factor(spec, n, bw)
    if z < 2 or n % z:
        raise ValueError(f"stencil factor z={z} must be >= 2 and divide n={n}")
    n0 = n // z
    xin, xout = domain
    h = (xout - xin) / n

    func_, u_ex, ux_ex = default_model_problem()
    func = func or func_
    if bc is None:
        bc = BoundaryCondition(("neu", ux_ex(xin)), ("dir", u_ex(xout)))

    # 1) host f64 stencil problem at n0 elements of the REAL width h (rhs from
    #    this small build is discarded — only the BC lift data is reused)
    with on_host():
        prob0 = build_problem(
            spec, n0, func, bc, mesh=_stencil_mesh(n0, h), to_device=False
        )
        h64 = strip_hierarchy(prob0.hierarchy)

        # 2) float-float split of the fine operator (stencil size), f32 cast
        fine64 = h64.levels[0]
        a_ff_small = _ff_split_fine(fine64)
        h_low0 = hierarchy_astype(h64, dtype)
        if dtype == jnp.float32:
            # share the ff hi part with the low hierarchy's fine operator so
            # the smoother streams and the defect agree exactly
            h_low0 = _share_fine_hi(h_low0, a_ff_small)
            h_low0 = prepare_fast_smoothers(h_low0)
        if chebyshev:
            # lambda_max from the stencil-size spectrum: converge the power
            # iteration properly (cheap at n0) and take an extra safety margin
            # over the default to absorb the residual size dependence of the
            # preconditioned spectrum (measured < 4% between n0 and n; only
            # UNDER-estimates hurt — see test_stencil_setup)
            h_low0 = chebyshev_hierarchy(h_low0, power_iters=50, safety=1.1)
        if slim_fine:
            if not isinstance(h_low0.levels[0], BlockLevel) or dtype != jnp.float32:
                raise ValueError("slim_fine requires an f32 DG-topped chain")
            lv0 = h_low0.levels[0]
            e = jnp.zeros((0, 0, 0), dtype=dtype)
            lv0 = lv0._replace(a=BlockTridiag(lower=e, diag=lv0.a.diag, upper=e))
            h_low0 = Hierarchy(
                levels=(lv0,) + h_low0.levels[1:],
                transfers=h_low0.transfers, coarse=h_low0.coarse,
            )

    # 3) inflate the solve hierarchy and the ff fine operator on-device
    h_low = inflate_hierarchy(h_low0, h64, z, bw=bw, device=device)
    if slim_fine:
        a_ff = _stencil_ff_fine(a_ff_small, n, bw, device)
    else:
        a_ff = _inflate_ff_fine(a_ff_small, h_low.levels[0], z, bw, device)
    if ff_levels:
        from .hierarchy import _coarse_lu

        a_ffs = (a_ff,) + _inflate_ff_tail(h64, h_low, z, bw, device)
        t_los = _inflate_transfer_los(h64, h_low, z, bw, device)
        # f64 coarse factorization for the progressive cycles: the f32
        # solve-plus-refinement stops contracting once cond(A_coarse) >~
        # 1/eps_f32 (CDir = 1000 n reaches that at the 1e8-DoF north star)
        with on_host():
            a_c64 = _inflate_bt_host(h64.levels[-1].a, z, bw, "coarse64.a")
            coarse64 = _coarse_lu(BlockLevel(
                a=a_c64, g=None, d=None, c=None, mass_inv=None, smoother=None
            ))
        coarse64 = jax.device_put(coarse64, device)
        a_ff = FFOps(a_ffs=a_ffs, t_los=t_los, coarse64=coarse64)

    # 4) the O(n) rhs: host f64 load + BC lift from stencil data, ff split
    with on_host():
        fine_mesh0 = prob0.meshes[0]
        if isinstance(fine_mesh0, DgMesh):
            b = _uniform_dg_b(prob0, spec, n, h, xin, func, bc, bw)
        elif isinstance(fine_mesh0, CgMesh):
            b = _uniform_cg_b(prob0, n, h, xin, func, bc)
        else:
            raise TypeError(type(fine_mesh0))
        # Frobenius == flat 2-norm; the .T.reshape(-1) form forced a full
        # 8-byte/DoF transpose copy (measured 7 s of the 1e8-DoF setup)
        norm_b = float(np.linalg.norm(np.asarray(b)))
        b_ff = ff_split(jnp.asarray(b))
    b_ff = jax.device_put(b_ff, device)
    if ff_levels:  # a_ff is the FFOps bundle here
        return h_low, a_ff, b_ff, norm_b
    return h_low, a_ff, b_ff, norm_b


def _ff_split_fine(fine64):
    from ..ops.df64 import bt_split, cg_band_split

    if isinstance(fine64, CgLevel):
        return cg_band_split(fine64.a.band)
    return bt_split(fine64.a)


def _share_fine_hi(h_low, a_ff_small):
    """Point the f32 hierarchy's fine operator at the ff split's hi part
    (identical values — ff hi IS round-to-f32 — but sharing the buffers halves
    the fine-level operator residency)."""
    from ..ops.df64 import BlockTridiagFF, CgBandFF

    lv0 = h_low.levels[0]
    if isinstance(a_ff_small, BlockTridiagFF):
        lv0 = lv0._replace(a=a_ff_small.hi)
    else:
        lv0 = lv0._replace(a=CgOperator(windows=lv0.a.windows, band=a_ff_small.hi))
    return Hierarchy(
        levels=(lv0,) + h_low.levels[1:], transfers=h_low.transfers, coarse=h_low.coarse
    )


def _stencil_ff_fine(a_ff_small, n: int, bw: int, device):
    """The float-float fine operator as pure stencils (slim mode): no (bs, bs,
    n) stream is ever materialized; :func:`~..ops.df64.ff_bt_defect_stencil`
    contracts with the broadcast mid blocks."""
    from ..ops.df64 import BlockTridiagFF, BTFFStencil

    if not isinstance(a_ff_small, BlockTridiagFF):
        raise ValueError("slim_fine requires a block-tridiagonal fine operator")

    def parts(bt: BlockTridiag, rtol):
        sts = {
            k: _extract_el(getattr(bt, k), bw, f"a_ff.{k}", rtol)
            for k in ("lower", "diag", "upper")
        }
        mk = lambda sel: BlockTridiag(  # noqa: E731
            lower=jnp.asarray(sel(sts["lower"])),
            diag=jnp.asarray(sel(sts["diag"])),
            upper=jnp.asarray(sel(sts["upper"])),
        )
        return mk(lambda s: s.left), mk(lambda s: s.mid), mk(lambda s: s.right)

    hi_l, hi_m, hi_r = parts(a_ff_small.hi, "auto")
    lo_l, lo_m, lo_r = parts(a_ff_small.lo, None)
    st = BTFFStencil(
        hi_left=hi_l, hi_mid=hi_m, hi_right=hi_r,
        lo_left=lo_l, lo_mid=lo_m, lo_right=lo_r, n=n,
    )
    return jax.device_put(st, device)


class FFOps(NamedTuple):
    """The value-accurate operator bundle for TRUE-precision progressive
    cycles (``solvers._progressive_true_eager``): per-level float-float
    operators, per-transfer lo tails (``blocks64 - blocks32`` rounded to
    f32 — applying transfers as ``T_hi r_hi + (T_hi r_lo + T_lo r_hi)``
    keeps them 2^-48-value-accurate), and the f64 coarse factorization.

    Why all three: once ``eps_f32 * kappa_elem(A) > 1`` (the 1e8-DoF
    CDir = 1000 n north star sits at ~6) EVERY f32-VALUED operator
    application in the correction cycle — smoothing matvec, transfer,
    defect — injects amplifying error and the V-cycle diverges at
    ~eps_f32 * kappa per cycle, regardless of the arithmetic precision it
    is computed in (measured in the r5 conditioning bisects).  With
    ff-valued applications throughout the cycle contracts like f64."""

    a_ffs: tuple  # per-level ff operators (a_ffs[0] may be a BTFFStencil)
    t_los: tuple  # per-transfer lo parts (None where unsupported)
    coarse64: object  # f64 coarse factorization


def _inflate_ff_tail(h64, h_low, z: int, bw: int, device):
    """Per-level float-float operators for levels 1..end (progressive-
    precision cycles): hi shares the inflated f32 hierarchy's buffers (f32
    cast == split hi exactly), lo tails inflate from the stencil-size f64
    split.  Cited behavior: the reference simply keeps every level in native
    f64 (``src/mesh_heirarchy.jl:30-181``); this is the two-f32 equivalent."""
    from ..ops.df64 import BlockTridiagFF, CgBandFF, bt_split, cg_band_split

    # ONE plan across all levels -> one _inflate_all jit (a per-level plan
    # would pay a fresh remote compile per level: ~200 s of setup, measured)
    plan = _Plan(z, bw)
    builders = []
    for k in range(1, len(h64.levels)):
        lv64, lv = h64.levels[k], h_low.levels[k]
        if isinstance(lv64, CgLevel):
            sp = cg_band_split(lv64.a.band)
            i = plan.node(np.asarray(sp.lo), lv64.a.p, f"a_ffs[{k}].lo", rtol=None)
            builders.append(
                lambda arrs, lv=lv, i=i: CgBandFF(hi=lv.a.band, lo=arrs[i])
            )
        else:
            sp = bt_split(lv64.a)
            lo_fn = _plan_bt(plan, sp.lo, f"a_ffs[{k}].lo", rtol=None)
            builders.append(
                lambda arrs, lv=lv, lo_fn=lo_fn: BlockTridiagFF(hi=lv.a, lo=lo_fn(arrs))
            )
    stencils = jax.device_put(tuple(plan.stencils), device)
    arrs = _inflate_all(stencils, tuple(plan.specs), bw)
    return tuple(fn(arrs) for fn in builders)


def _inflate_transfer_los(h64, h_low, z: int, bw: int, device):
    """Per-transfer lo tails ``round32(blocks64 - round32(blocks64))`` for the
    TRUE-precision cycle (see :class:`FFOps`); one plan -> one inflate jit.
    Transfers whose type has no lo representation yet get ``None`` (the true
    cycle then applies them at f32 value accuracy)."""
    plan = _Plan(z, bw)
    idxs = []
    for k, t64 in enumerate(h64.transfers):
        if not isinstance(t64, BlockProlong):
            idxs.append(None)
            continue
        b64 = np.asarray(t64.blocks, np.float64)
        lo = (b64 - b64.astype(np.float32).astype(np.float64)).astype(np.float32)
        idxs.append(plan.el(lo, f"t_lo[{k}]", rtol=None))
    if not any(i is not None for i in idxs):
        return tuple(idxs)
    stencils = jax.device_put(tuple(plan.stencils), device)
    arrs = _inflate_all(stencils, tuple(plan.specs), bw)
    return tuple(None if i is None else BlockProlong(blocks=arrs[i]) for i in idxs)


def _inflate_ff_fine(a_ff_small, fine_low, z: int, bw: int, device):
    """Inflate the float-float fine operator; the hi part re-uses the already
    inflated arrays of the low hierarchy's fine level (same values)."""
    from ..ops.df64 import BlockTridiagFF, CgBandFF

    plan = _Plan(z, bw)
    if isinstance(a_ff_small, BlockTridiagFF):
        lo_fn = _plan_bt(plan, a_ff_small.lo, "a_ff.lo", rtol=None)
        stencils = jax.device_put(tuple(plan.stencils), device)
        out = _inflate_all(stencils, tuple(plan.specs), bw)
        return BlockTridiagFF(hi=fine_low.a, lo=lo_fn(out))
    # CG band: node-axis with p from the band bandwidth
    p = a_ff_small.hi.shape[0] // 2
    i = plan.node(a_ff_small.lo, p, "a_ff.lo", rtol=None)
    stencils = jax.device_put(tuple(plan.stencils), device)
    out = _inflate_all(stencils, tuple(plan.specs), bw)
    return CgBandFF(hi=fine_low.a.band, lo=out[i])


def _uniform_dg_b(prob0, spec, n: int, h: float, xin: float, func, bc, bw: int):
    """Full-size DG rhs ``b = f - D M^-1 r``: the volume load is the only
    f-dependent (hence position-dependent) part; every BC contribution is an
    additive, f-independent patch on the outermost elements, taken verbatim
    from the stencil problem (``dg_flux_rhs`` + the ``- D M^-1 r`` lift are
    all ``.add`` updates, ``assembly/dg_assembly.py:149-161``)."""
    from ..assembly.dg_assembly import _dg_load_jit, dg_load_vector

    dg0 = prob0.meshes[0]
    ref = dg0.ref
    wphi = np.asarray(ref.quad_weights)[:, None] * np.asarray(ref.basis_at_quad)
    jac = jnp.full((n,), h / 2.0, dtype=jnp.float64)
    centers = xin + (jnp.arange(n, dtype=jnp.float64) + 0.5) * h
    load = _dg_load_jit(jac, centers, jnp.asarray(ref.quad_nodes), jnp.asarray(wphi), func)
    delta = np.asarray(prob0.b) - np.asarray(dg_load_vector(dg0, func))
    k = min(bw, delta.shape[1] // 2)
    # stay in jax (donated .at updates) — the previous np.array round trip
    # copied the 8-byte/DoF load twice
    load = load.at[:, :k].add(jnp.asarray(delta[:, :k]))
    return load.at[:, -k:].add(jnp.asarray(delta[:, -k:]))


def _uniform_cg_b(prob0, n: int, h: float, xin: float, func, bc):
    """Full-size CG rhs: volume load at full size + Neumann terms + the
    Dirichlet lift re-applied from the stencil problem's raw boundary window
    (cf. ``assembly/cg_assembly.py:79-104``; the ``f[dir] = g`` overwrite is
    NOT additive, so the lift must be re-run rather than patched)."""
    from ..assembly.cg_assembly import _raw_stiffness_windows

    cg0 = prob0.meshes[0]
    ref = cg0.ref
    p = cg0.p
    w = p + 1
    n_nodes = n * p + 1

    basis_pos = np.asarray(ref.basis_at_quad[:, ref.pos_to_slot])  # (n_q, w)
    qw = np.asarray(ref.quad_weights)
    qx = np.asarray(ref.quad_nodes)
    centers = xin + (np.arange(n, dtype=np.float64) + 0.5) * h
    xq = centers[:, None] + (h / 2.0) * qx[None, :]  # (n, n_q)
    fv = np.asarray(func(jnp.asarray(xq)))
    fe = (h / 2.0) * np.einsum("l,la,kl->ak", qw, basis_pos, fv)  # (w, n)
    f = np.zeros((n_nodes,), dtype=np.float64)
    idx = p * np.arange(n)[None, :] + np.arange(w)[:, None]
    np.add.at(f, idx, fe)

    if bc.neu_left:
        f[0] -= bc.left[1]
    if bc.neu_right:
        f[-1] += bc.right[1]
    raw0 = np.asarray(_raw_stiffness_windows(cg0))
    if bc.dir_left:
        g = bc.left[1]
        f[:w] -= raw0[:, 0, 0] * g
        f[0] = g
    if bc.dir_right:
        g = bc.right[1]
        f[n_nodes - w :] -= raw0[:, w - 1, -1] * g
        f[-1] = g
    return jnp.asarray(f)
