"""Float-float ("double-f32") arithmetic for f64-accurate defects at f32 speed.

TPU has no native f64: XLA emulates it ~100x slower than f32, and the emulated
block-tridiagonal defect ``r = b - A x`` dominates the mixed-precision solver's
runtime (the reference runs everything in native f64 on CPU,
``src/solvers.jl:33``).  This module represents every f64 quantity as an
unevaluated pair of f32s ``hi + lo`` with ``|lo| <= ulp(hi)/2`` (~2^-48 ≈ 7e-15
relative precision — more than the 2^-52 of true f64's mantissa tail we give
up, and far beyond the 1e-10 relative-residual targets) and evaluates the
defect with error-free transformations:

* ``two_sum``  — Knuth's branch-free exact addition (6 f32 ops),
* ``two_prod`` — Dekker's exact product via 12-bit operand splitting (17 f32
  ops; no FMA assumed — TPU VPU mul/add are individually IEEE-rounded),

so one defect costs ~30 f32 VPU ops per matrix nonzero instead of one emulated
f64 MAC — an order of magnitude faster at identical solver behavior.

All public entry points force ``float32`` dtypes; inputs may be f64 (split
exactly) or f32 pairs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .block_penta import BlockPenta
from .block_tridiag import BlockTridiag
from .shifts import shift

_SPLITTER = 4097.0  # 2^12 + 1 for f32's 24-bit mantissa


class FF(NamedTuple):
    """A float-float number/array: value = hi + lo (both f32)."""

    hi: jax.Array
    lo: jax.Array


class BlockTridiagFF(NamedTuple):
    """A block-tridiagonal operator with float-float entries."""

    hi: BlockTridiag  # f32
    lo: BlockTridiag  # f32


def ff_split(x: jax.Array) -> FF:
    """Exactly split an f64 array into an f32 pair (hi = round(x), lo = round(x - hi))."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return FF(hi, lo)


def ff_join(x: FF) -> jax.Array:
    """Recombine to f64 (one emulated-f64 add per element)."""
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def bt_split(a: BlockTridiag) -> BlockTridiagFF:
    lo_parts = []
    hi_parts = []
    for d in a:
        p = ff_split(d)
        hi_parts.append(p.hi)
        lo_parts.append(p.lo)
    return BlockTridiagFF(BlockTridiag(*hi_parts), BlockTridiag(*lo_parts))


class BlockPentaFF(NamedTuple):
    """A block-pentadiagonal operator with float-float entries (mixed-switch
    DG levels, see ``ops.block_penta``)."""

    hi: BlockPenta  # f32
    lo: BlockPenta  # f32


def bp5_split(a: BlockPenta) -> BlockPentaFF:
    parts = [ff_split(d) for d in a]
    return BlockPentaFF(
        BlockPenta(*(p.hi for p in parts)), BlockPenta(*(p.lo for p in parts))
    )


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Exact a + b assuming |a| >= |b|."""
    s = a + b
    return s, b - (s - a)


def _split(a):
    t = jnp.float32(_SPLITTER) * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def ff_add(x: FF, y: FF) -> FF:
    """Float-float addition (QD-style 'sloppy' add: sufficient here because the
    accumulation chains are short and renormalized every step)."""
    s, e = _two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return FF(*_quick_two_sum(s, e))


def ff_neg(x: FF) -> FF:
    return FF(-x.hi, -x.lo)


def ff_mul(x: FF, y: FF) -> FF:
    p, e = _two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return FF(*_quick_two_sum(p, e))


def ff_from_f32(x: jax.Array) -> FF:
    return FF(x, jnp.zeros_like(x))


def _contract_ff(m: BlockTridiagFF, sel, x: FF, acc: FF, sign: float) -> FF:
    """acc += sign * (sel(m)[i, j, :] @ x[j, :]) over the block rows.

    Two details here are load-bearing against XLA:CPU's optimizer (TPU is
    exact either way; measured defect error 6.7e-12 vs 5e-15):

    * each product and each renormalized accumulator pair is pinned with an
      ``optimization_barrier`` so the fused accumulation loop cannot be
      reassociated across the error-free transforms;
    * the sign is applied to the *product* (after its barrier), never to the
      multiplicand — ``(-a) * x`` invites a sign-distribution rewrite through
      Dekker's splitting that costs ~12 bits."""
    mh, ml = sel(m.hi), sel(m.lo)
    bs = mh.shape[0]
    for j in range(bs):
        a = FF(mh[:, j, :], ml[:, j, :])
        t = ff_mul(a, FF(x.hi[j : j + 1, :], x.lo[j : j + 1, :]))
        t = FF(*jax.lax.optimization_barrier((t.hi, t.lo)))
        if sign < 0:
            t = ff_neg(t)
        acc = ff_add(acc, t)
        acc = FF(*jax.lax.optimization_barrier((acc.hi, acc.lo)))
    return acc


def ff_bt_matvec(a: BlockTridiagFF, x: FF) -> FF:
    """Block-tridiagonal matvec in float-float (cf. :func:`bt_matvec`)."""
    xm = FF(shift(x.hi, -1), shift(x.lo, -1))
    xp = FF(shift(x.hi, +1), shift(x.lo, +1))
    z = jnp.zeros_like(x.hi)
    acc = FF(z, z)
    acc = _contract_ff(a, lambda t: t.diag, x, acc, +1.0)
    acc = _contract_ff(a, lambda t: t.lower, xm, acc, +1.0)
    acc = _contract_ff(a, lambda t: t.upper, xp, acc, +1.0)
    return acc


def ff_bt_defect(a: BlockTridiagFF, x: FF, b: FF) -> FF:
    """``r = b - A x`` in float-float: one f32-speed pass, ~2^-48-accurate."""
    xm = FF(shift(x.hi, -1), shift(x.lo, -1))
    xp = FF(shift(x.hi, +1), shift(x.lo, +1))
    acc = b
    acc = _contract_ff(a, lambda t: t.diag, x, acc, -1.0)
    acc = _contract_ff(a, lambda t: t.lower, xm, acc, -1.0)
    acc = _contract_ff(a, lambda t: t.upper, xp, acc, -1.0)
    return acc


def ff_bp5_defect(a: BlockPentaFF, x: FF, b: FF) -> FF:
    """Pentadiagonal ``r = b - A x`` in float-float (mixed-switch levels):
    :func:`ff_bt_defect` plus the two distance-2 contractions."""
    acc = b
    acc = _contract_ff(a, lambda t: t.diag, x, acc, -1.0)
    for d, sel in ((-1, lambda t: t.lower), (+1, lambda t: t.upper),
                   (-2, lambda t: t.lower2), (+2, lambda t: t.upper2)):
        xs = FF(shift(x.hi, d), shift(x.lo, d))
        acc = _contract_ff(a, sel, xs, acc, -1.0)
    return acc


class CgBandFF(NamedTuple):
    """An assembled CG DIA band (see ops.cg_operator) with float-float entries."""

    hi: jax.Array  # (2p+1, n_nodes) f32
    lo: jax.Array  # (2p+1, n_nodes) f32


def cg_band_split(band: jax.Array) -> CgBandFF:
    p = ff_split(band)
    return CgBandFF(p.hi, p.lo)


def ff_cg_defect(a: CgBandFF, x: FF, b: FF) -> FF:
    """``r = b - A x`` for a scalar-banded CG operator in float-float.

    Mirrors :func:`ops.cg_operator.cg_matvec`: 2p+1 shifted MACs, each fenced
    like :func:`_contract_ff` (same XLA:CPU reassociation hazard)."""
    p = a.hi.shape[0] // 2
    acc = b
    for off in range(-p, p + 1):
        band = FF(a.hi[off + p], a.lo[off + p])
        xs = FF(shift(x.hi, off), shift(x.lo, off))
        t = ff_mul(band, xs)
        t = FF(*jax.lax.optimization_barrier((t.hi, t.lo)))
        acc = ff_add(acc, ff_neg(t))
        acc = FF(*jax.lax.optimization_barrier((acc.hi, acc.lo)))
    return acc


def ff_defect(a, x: FF, b: FF) -> FF:
    """Dispatch ``r = b - A x`` on the float-float operator type."""
    if isinstance(a, BlockTridiagFF):
        return ff_bt_defect(a, x, b)
    if isinstance(a, BlockPentaFF):
        return ff_bp5_defect(a, x, b)
    if isinstance(a, CgBandFF):
        return ff_cg_defect(a, x, b)
    raise TypeError(type(a))


def ff_norm(x: FF) -> jax.Array:
    """2-norm of a float-float vector, returned as f64.

    One emulated-f64 pass over the vector (join + square + sum); a negligible
    fraction of the defect cost, and the norm must be exact to f64 because the
    solver's convergence test compares it against ``tol * ||b||``."""
    v = ff_join(x).reshape(-1)
    return jnp.linalg.norm(v)
