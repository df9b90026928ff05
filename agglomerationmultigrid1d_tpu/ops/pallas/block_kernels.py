"""Pallas TPU kernels for the hot block-level ops.

The V-cycle's hot loop is the damped block-Jacobi sweep
``x += alpha * Binv (b - A x)`` with A block-tridiagonal in SoA layout
(bs, bs, n).  XLA already fuses the jnp einsum formulation well; the Pallas
version fuses the *entire* sweep (matvec + residual + block solve + axpy) into
one pass over HBM, reading each operand exactly once per tile — the
speed-of-light formulation for this memory-bound kernel.

Neighbor access: each grid tile reads its own x block plus the two adjacent
blocks (clamped index maps); the halo columns are spliced in with lane rolls +
masked selects, so no manual DMA is needed.

These kernels are dtype-generic but intended for the f32 fast path; f64 parity
runs stay on the XLA path (`ops.block_tridiag`).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..block_tridiag import BlockTridiag, bt_matvec

try:  # x64 tracing poisons Mosaic with i64 scalars (kernels are f32-only anyway)
    from jax._src.config import enable_x64 as _enable_x64
except ImportError:  # pragma: no cover
    _enable_x64 = None


def _x32_scope():
    return _enable_x64(False) if _enable_x64 is not None else contextlib.nullcontext()


def _pick_tile(bs: int, n: int, dtype, vmem_budget=6 * 1024 * 1024) -> int:
    """Largest power-of-two tile with 4 block operands + 5 vectors in budget."""
    bpe = jnp.dtype(dtype).itemsize
    per_lane = (4 * bs * bs + 5 * bs) * bpe * 2  # x2: double buffering
    tile = 1 << 20
    while tile > 128 and (tile * per_lane > vmem_budget or n % tile != 0):
        tile //= 2
    return tile


def _neighbor_splice(xc, xl, xr, i, ni):
    """Build x_{k-1} and x_{k+1} lane vectors for this tile."""
    bs, t = xc.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bs, t), 1)
    xm = pltpu.roll(xc, jnp.int32(1), axis=1)
    left_col = jnp.where(i == 0, jnp.zeros((bs, 1), xc.dtype), xl[:, t - 1 : t])
    xm = jnp.where(col == 0, left_col, xm)
    xp = pltpu.roll(xc, jnp.int32(t - 1), axis=1)  # circular -1 (shift must be >= 0 i32)
    right_col = jnp.where(i == ni - 1, jnp.zeros((bs, 1), xc.dtype), xr[:, 0:1])
    xp = jnp.where(col == t - 1, right_col, xp)
    return xm, xp


def _contract(mat_ref, vec, bs):
    """y[i, :] = sum_j mat[i, j, :] * vec[j, :] — bs unrolled VPU FMAs."""
    acc = mat_ref[:, 0, :] * vec[0:1, :]
    for j in range(1, bs):
        acc = acc + mat_ref[:, j, :] * vec[j : j + 1, :]
    return acc


def _sweep_kernel(ad, al, au, binv, xc, xl, xr, b, out, *, alpha, bs):
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    x = xc[...]
    xm, xp = _neighbor_splice(x, xl[...], xr[...], i, ni)
    r = b[...] - _contract(ad, x, bs) - _contract(al, xm, bs) - _contract(au, xp, bs)
    out[...] = x + alpha * _contract(binv, r, bs)


def _matvec_kernel(ad, al, au, xc, xl, xr, out, *, bs):
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    x = xc[...]
    xm, xp = _neighbor_splice(x, xl[...], xr[...], i, ni)
    out[...] = _contract(ad, x, bs) + _contract(al, xm, bs) + _contract(au, xp, bs)


def _specs(bs: int, tile: int):
    spec3 = pl.BlockSpec((bs, bs, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    specv = pl.BlockSpec((bs, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    specl = pl.BlockSpec(
        (bs, tile), lambda i: (0, jnp.maximum(i - 1, 0)), memory_space=pltpu.VMEM
    )
    specr = pl.BlockSpec(
        (bs, tile),
        lambda i: (0, jnp.minimum(i + 1, pl.num_programs(0) - 1)),
        memory_space=pltpu.VMEM,
    )
    return spec3, specv, specl, specr


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def pallas_block_jacobi_sweep(
    a: BlockTridiag, s_inv: jax.Array, x: jax.Array, b: jax.Array,
    alpha: float = 2.0 / 3.0, interpret: bool = False,
) -> jax.Array:
    """Fused ``x + alpha * s_inv (b - A x)``; falls back to XLA for awkward n."""
    bs, _, n = a.diag.shape
    tile = _pick_tile(bs, n, x.dtype)
    if x.dtype != jnp.float32 or n % tile != 0 or n < 2 * tile:
        # f64 (parity mode) and awkward sizes take the XLA path; Mosaic is f32-only
        from ...smoothers.smoother import BlockJacobiSmoother, apply_smoother

        return x + apply_smoother(BlockJacobiSmoother(inv=s_inv), b - bt_matvec(a, x), alpha)

    spec3, specv, specl, specr = _specs(bs, tile)
    kernel = functools.partial(_sweep_kernel, alpha=alpha, bs=bs)
    with _x32_scope():
        return pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=[spec3, spec3, spec3, spec3, specv, specl, specr, specv],
            out_specs=specv,
            out_shape=jax.ShapeDtypeStruct((bs, n), x.dtype),
            interpret=interpret,
        )(a.diag, a.lower, a.upper, s_inv, x, x, x, b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_bt_matvec(a: BlockTridiag, x: jax.Array, interpret: bool = False) -> jax.Array:
    """Block-tridiagonal matvec as a single-pass Pallas kernel."""
    bs, _, n = a.diag.shape
    tile = _pick_tile(bs, n, x.dtype)
    if x.dtype != jnp.float32 or n % tile != 0 or n < 2 * tile:
        return bt_matvec(a, x)

    spec3, specv, specl, specr = _specs(bs, tile)
    kernel = functools.partial(_matvec_kernel, bs=bs)
    with _x32_scope():
        return pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=[spec3, spec3, spec3, specv, specl, specr],
            out_specs=specv,
            out_shape=jax.ShapeDtypeStruct((bs, n), x.dtype),
            interpret=interpret,
        )(a.diag, a.lower, a.upper, x, x, x)


# ---------------------------------------------------------------------------
# Temporally-fused multi-sweep kernel
# ---------------------------------------------------------------------------
#
# The V-cycle applies nPre (= 3) smoother sweeps back to back.  Each sweep is
# memory-bound, so fusing k sweeps into one pass over HBM — loading every
# operand once with a k-wide halo and iterating locally (trapezoidal temporal
# blocking) — multiplies the effective sweep throughput by ~k.  After sweep s
# only the inner T + 2(h - s) columns of the widened tile are valid; with halo
# h >= k the written center T columns are exact.


def _seg_ops(gops, gvec, op_tiles, xc, xl, xr, bc, bl, br, i, ni, halo):
    """Per-segment operands: operator streams stay in (left, center, right)
    segments — NO (bs, bs, w) concatenation, which would copy every operator
    element through the VPU — while x and b widen into (bs, w) vectors (cheap).
    Edge programs take the shard ghosts for their outer halo segment; zero
    ghosts reproduce the global zero-Dirichlet boundary exactly."""
    segs = []
    for s, (c, l, r) in enumerate(op_tiles):
        lft = jnp.where(i == 0, gops[s, :, :, 0:halo], l[...])
        rgt = jnp.where(i == ni - 1, gops[s, :, :, halo:], r[...])
        segs.append((lft, c[...], rgt))
    xlft = jnp.where(i == 0, gvec[0, :, 0:halo], xl[...])
    xrgt = jnp.where(i == ni - 1, gvec[0, :, halo:], xr[...])
    blft = jnp.where(i == 0, gvec[1, :, 0:halo], bl[...])
    brgt = jnp.where(i == ni - 1, gvec[1, :, halo:], br[...])
    xw = jnp.concatenate([xlft, xc[...], xrgt], axis=-1)
    bw = jnp.concatenate([blft, bc[...], brgt], axis=-1)
    return segs, xw, bw


def _mat(m, v, bs):
    acc = m[:, 0, :] * v[0:1, :]
    for j in range(1, bs):
        acc = acc + m[:, j, :] * v[j : j + 1, :]
    return acc


def _seg_apply(op_segs, xw, bs, halo, tile):
    """Apply segmented operators to the matching slices of a widened vector."""
    lo, c, r = op_segs
    return (
        _mat(lo, xw[:, 0:halo], bs),
        _mat(c, xw[:, halo : halo + tile], bs),
        _mat(r, xw[:, halo + tile :], bs),
    )


def _seg_residual(ad, al, au, xw, bw, col, bs, halo, tile, w):
    """(rL, rC, rR) = segments of b - A x on the widened window.  The outermost
    window columns use a zero (wrapped-and-masked) neighbor — corrupted by
    design; corruption moves one column inward per sweep, so the center stays
    exact for n_sweeps <= halo."""
    xm = pltpu.roll(xw, jnp.int32(1), axis=1)
    xm = jnp.where(col == 0, 0.0, xm)
    xp = pltpu.roll(xw, jnp.int32(w - 1), axis=1)
    xp = jnp.where(col == w - 1, 0.0, xp)
    td = _seg_apply(ad, xw, bs, halo, tile)
    tl = _seg_apply(al, xm, bs, halo, tile)
    tu = _seg_apply(au, xp, bs, halo, tile)
    bL, bC, bR = bw[:, 0:halo], bw[:, halo : halo + tile], bw[:, halo + tile :]
    return (
        bL - td[0] - tl[0] - tu[0],
        bC - td[1] - tl[1] - tu[1],
        bR - td[2] - tl[2] - tu[2],
    )


def _wide_sweep_kernel(
    gops, gvec,
    adc, adl, adr, alc, all_, alr, auc, aul, aur, bic, bil, bir,
    xc, xl, xr, bc, bl, br, *outs, alpha, bs, n_sweeps, halo, tile,
    emit_residual=False,
):
    """Temporally-blocked multisweep, segment-wise (see :func:`_seg_ops`).

    ``gops``/``gvec`` are *shard ghosts*: ``gops[s, :, :, :halo]`` is the left
    neighbor shard's last ``halo`` operator columns for stream s (diag, lower,
    upper, binv) and ``[..., halo:]`` the right neighbor's first columns;
    ``gvec[0/1]`` likewise for x and b.  Zero ghosts reproduce the global
    zero-Dirichlet boundary exactly (residual, update and iterate all vanish in
    the ghost region), so the single-device path passes zeros; under
    ``shard_map`` the wrapper fills them with one ``ppermute`` per side and the
    center ``tile`` columns are exact for ``n_sweeps <= halo``.
    """
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    w = tile + 2 * halo

    (ad, al, au, bi), xw, bw = _seg_ops(
        gops, gvec,
        [(adc, adl, adr), (alc, all_, alr), (auc, aul, aur), (bic, bil, bir)],
        xc, xl, xr, bc, bl, br, i, ni, halo,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (bs, w), 1)

    for _ in range(n_sweeps):
        rL, rC, rR = _seg_residual(ad, al, au, xw, bw, col, bs, halo, tile, w)
        xw = jnp.concatenate(
            [
                xw[:, 0:halo] + alpha * _mat(bi[0], rL, bs),
                xw[:, halo : halo + tile] + alpha * _mat(bi[1], rC, bs),
                xw[:, halo + tile :] + alpha * _mat(bi[2], rR, bs),
            ],
            axis=-1,
        )

    outs[0][...] = xw[:, halo : halo + tile]
    if emit_residual:
        # A is already resident: one more in-register residual saves the
        # separate full-HBM-pass matvec of the V-cycle's restrict step.
        # After n_sweeps the widened iterate is valid on [n_sweeps, w - n_sweeps),
        # so the center residual (needing +-1 columns) is exact for halo > n_sweeps.
        _, rC, _ = _seg_residual(ad, al, au, xw, bw, col, bs, halo, tile, w)
        outs[1][...] = rC


def _halo_specs(bs: int, tile: int, halo: int):
    """Center + left/right halo BlockSpecs (halo must divide tile)."""
    ratio = tile // halo

    def mk(shape_c, shape_h):
        c = pl.BlockSpec(shape_c, lambda i: (0,) * (len(shape_c) - 1) + (i,),
                         memory_space=pltpu.VMEM)
        l = pl.BlockSpec(
            shape_h,
            lambda i: (0,) * (len(shape_h) - 1) + (jnp.maximum(i * ratio - 1, 0),),
            memory_space=pltpu.VMEM,
        )
        r = pl.BlockSpec(
            shape_h,
            lambda i: (0,) * (len(shape_h) - 1)
            + (jnp.minimum(i * ratio + ratio, pl.num_programs(0) * ratio - 1),),
            memory_space=pltpu.VMEM,
        )
        return c, l, r

    mat_specs = mk((bs, bs, tile), (bs, bs, halo))
    vec_specs = mk((bs, tile), (bs, halo))
    return mat_specs, vec_specs


def _wide_cheb_kernel(
    coef, gops, gvec,
    adc, adl, adr, alc, all_, alr, auc, aul, aur, bic, bil, bir,
    xc, xl, xr, bc, bl, br, *outs, bs, degree, halo, tile, emit_residual=False,
):
    """Temporally-blocked Chebyshev smoothing: all ``degree`` steps of the
    three-term recurrence in one HBM pass (same widened-tile validity argument
    as ``_wide_sweep_kernel``; each step consumes one halo column per side).

    ``coef`` is a (degree, 2) SMEM array: step i does
    ``z = Binv (b - A x); d = coef[i,0] * d + coef[i,1] * z; x += d``.
    ``gops``/``gvec`` are the shard ghosts (see ``_wide_sweep_kernel``); note
    the Chebyshev correction ``d`` starts at zero in the ghost region, matching
    the neighbor's own recurrence exactly (d is a pure function of the initial
    x/b in the +-degree neighborhood, which the ghosts supply)."""
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    w = tile + 2 * halo

    (ad, al, au, bi), xw, bw = _seg_ops(
        gops, gvec,
        [(adc, adl, adr), (alc, all_, alr), (auc, aul, aur), (bic, bil, bir)],
        xc, xl, xr, bc, bl, br, i, ni, halo,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (bs, w), 1)

    d = jnp.zeros_like(xw)
    for s in range(degree):
        rL, rC, rR = _seg_residual(ad, al, au, xw, bw, col, bs, halo, tile, w)
        z = jnp.concatenate(
            [_mat(bi[0], rL, bs), _mat(bi[1], rC, bs), _mat(bi[2], rR, bs)], axis=-1
        )
        d = coef[s, 0] * d + coef[s, 1] * z
        xw = xw + d

    outs[0][...] = xw[:, halo : halo + tile]
    if emit_residual:
        _, rC, _ = _seg_residual(ad, al, au, xw, bw, col, bs, halo, tile, w)
        outs[1][...] = rC


def chebyshev_coefficients(lam_lo, lam_hi, degree: int):
    """(degree, 2) recurrence coefficients [c_d, c_z] for the classic Chebyshev
    smoother on [lam_lo, lam_hi] (traced scalars are fine)."""
    theta = 0.5 * (lam_hi + lam_lo)
    delta = 0.5 * (lam_hi - lam_lo)
    sigma = theta / delta
    rows = []
    rho = 1.0 / sigma
    rows.append(jnp.stack([jnp.zeros_like(theta), 1.0 / theta]))
    for _ in range(1, degree):
        rho_new = 1.0 / (2.0 * sigma - rho)
        rows.append(jnp.stack([rho_new * rho, 2.0 * rho_new / delta]))
        rho = rho_new
    return jnp.stack(rows).astype(jnp.float32)


def multisweep_shapes_ok(bs: int, n: int, dtype, n_steps: int) -> bool:
    """Whether the temporally-blocked kernels support these (local) shapes —
    the ghosted shard_map path must decide statically before calling."""
    halo = 128
    tile = _pick_tile(bs, n, dtype)
    return (
        jnp.dtype(dtype) == jnp.float32
        and n_steps < halo
        and tile % halo == 0
        and n % tile == 0
        and n >= 2 * tile
    )


def _zero_ghosts(bs: int, halo: int, dtype):
    return (
        jnp.zeros((4, bs, bs, 2 * halo), dtype),
        jnp.zeros((2, bs, 2 * halo), dtype),
    )


def _ghost_specs():
    """Full-array VMEM specs for the shard-ghost inputs (constant index map)."""
    g_ops = pl.BlockSpec(memory_space=pltpu.VMEM)
    g_vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return g_ops, g_vec


@functools.partial(jax.jit, static_argnames=("degree", "interpret", "emit_residual"))
def pallas_chebyshev_multisweep(
    a: BlockTridiag, s_inv: jax.Array, x: jax.Array, b: jax.Array, coef: jax.Array,
    degree: int = 3, interpret: bool = False, emit_residual: bool = False,
    ghosts=None,
):
    """All ``degree`` Chebyshev smoothing steps fused into one HBM pass
    (optionally also emitting ``r = b - A x_new``).  ``coef`` from
    :func:`chebyshev_coefficients`.  Falls back to an unfused XLA recurrence
    for awkward shapes/dtypes.  ``ghosts = (gops, gvec)`` supplies neighbor
    shard columns under ``shard_map`` (see ``_wide_sweep_kernel``); the
    fallback path is only valid for ``ghosts=None`` (global arrays)."""
    bs, _, n = a.diag.shape
    halo = 128
    tile = _pick_tile(bs, n, x.dtype)
    if (
        x.dtype != jnp.float32
        or degree >= halo
        or tile % halo != 0
        or n % tile != 0
        or n < 2 * tile
    ):
        if ghosts is not None:
            raise ValueError(
                "ghosted chebyshev multisweep requires f32 and tile-divisible "
                f"local shapes (got dtype={x.dtype}, n={n}, tile={tile})"
            )
        d = jnp.zeros_like(x)
        cf = coef.astype(x.dtype)
        for s in range(degree):
            z = jnp.einsum("ijn,jn->in", s_inv, b - bt_matvec(a, x))
            d = cf[s, 0] * d + cf[s, 1] * z
            x = x + d
        if emit_residual:
            return x, b - bt_matvec(a, x)
        return x

    gops, gvec = _zero_ghosts(bs, halo, x.dtype) if ghosts is None else ghosts
    (m_c, m_l, m_r), (v_c, v_l, v_r) = _halo_specs(bs, tile, halo)
    g_ops_spec, g_vec_spec = _ghost_specs()
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM), g_ops_spec, g_vec_spec]
        + [m_c, m_l, m_r] * 4
        + [v_c, v_l, v_r] * 2
    )
    kernel = functools.partial(
        _wide_cheb_kernel, bs=bs, degree=degree, halo=halo, tile=tile,
        emit_residual=emit_residual,
    )
    args = [coef, gops, gvec]
    for arr in (a.diag, a.lower, a.upper, s_inv):
        args += [arr, arr, arr]
    args += [x, x, x, b, b, b]
    shape = jax.ShapeDtypeStruct((bs, n), x.dtype)
    out_specs = [v_c, v_c] if emit_residual else v_c
    out_shape = [shape, shape] if emit_residual else shape
    with _x32_scope():
        res = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
    return tuple(res) if emit_residual else res


@functools.partial(jax.jit, static_argnames=("alpha", "n_sweeps", "interpret"))
def pallas_block_jacobi_multisweep(
    a: BlockTridiag, s_inv: jax.Array, x: jax.Array, b: jax.Array,
    n_sweeps: int = 3, alpha: float = 2.0 / 3.0, interpret: bool = False,
) -> jax.Array:
    """k fused damped block-Jacobi sweeps in one HBM pass (k <= 8)."""
    return _multisweep_impl(a, s_inv, x, b, n_sweeps, alpha, interpret, False)


@functools.partial(jax.jit, static_argnames=("alpha", "n_sweeps", "interpret"))
def pallas_block_jacobi_multisweep_residual(
    a: BlockTridiag, s_inv: jax.Array, x: jax.Array, b: jax.Array,
    n_sweeps: int = 3, alpha: float = 2.0 / 3.0, interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Like :func:`pallas_block_jacobi_multisweep` but also returns
    ``r = b - A x_new`` computed in the same pass (the operator tiles are
    already in VMEM), saving the V-cycle's separate restrict-side matvec."""
    return _multisweep_impl(a, s_inv, x, b, n_sweeps, alpha, interpret, True)


def _multisweep_impl(a, s_inv, x, b, n_sweeps, alpha, interpret, emit_residual, ghosts=None):
    bs, _, n = a.diag.shape
    halo = 128  # last-dim block sizes must be multiples of 128 on TPU
    tile = _pick_tile(bs, n, x.dtype)
    if (
        x.dtype != jnp.float32
        or n_sweeps >= halo
        or tile % halo != 0
        or n % tile != 0
        or n < 2 * tile
    ):
        if ghosts is not None:
            raise ValueError(
                "ghosted multisweep requires f32 and tile-divisible local "
                f"shapes (got dtype={x.dtype}, n={n}, tile={tile})"
            )
        from ...smoothers.smoother import BlockJacobiSmoother, apply_smoother

        sm = BlockJacobiSmoother(inv=s_inv)
        for _ in range(n_sweeps):
            x = x + apply_smoother(sm, b - bt_matvec(a, x), alpha)
        if emit_residual:
            return x, b - bt_matvec(a, x)
        return x

    gops, gvec = _zero_ghosts(bs, halo, x.dtype) if ghosts is None else ghosts
    (m_c, m_l, m_r), (v_c, v_l, v_r) = _halo_specs(bs, tile, halo)
    g_ops_spec, g_vec_spec = _ghost_specs()
    in_specs = (
        [g_ops_spec, g_vec_spec]
        + [m_c, m_l, m_r] * 4  # ad, al, au, binv
        + [v_c, v_l, v_r] * 2  # x, b
    )
    kernel = functools.partial(
        _wide_sweep_kernel, alpha=alpha, bs=bs, n_sweeps=n_sweeps, halo=halo, tile=tile,
        emit_residual=emit_residual,
    )
    args = [gops, gvec]
    for arr in (a.diag, a.lower, a.upper, s_inv):
        args += [arr, arr, arr]
    args += [x, x, x, b, b, b]
    shape = jax.ShapeDtypeStruct((bs, n), x.dtype)
    out_specs = [v_c, v_c] if emit_residual else v_c
    out_shape = [shape, shape] if emit_residual else shape
    with _x32_scope():
        res = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
    return tuple(res) if emit_residual else res
