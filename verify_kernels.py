"""Real-TPU (non-interpreted Mosaic) validation of every Pallas kernel against
the XLA reference path.  Run on the actual chip each round:

    python verify_kernels.py          # exits nonzero on any mismatch

The pytest suite exercises these kernels only in interpreter mode on CPU
(tests/test_pallas.py); this script catches Mosaic-only regressions (tiling,
roll semantics, SMEM coefficient delivery, ghost VMEM inputs) that interpret
mode cannot see.
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

from agglomerationmultigrid1d_tpu.ops.block_tridiag import BlockTridiag, bt_matvec
from agglomerationmultigrid1d_tpu.ops.pallas import (
    chebyshev_coefficients,
    pallas_block_jacobi_multisweep,
    pallas_block_jacobi_multisweep_residual,
    pallas_block_jacobi_sweep,
    pallas_bt_matvec,
    pallas_chebyshev_multisweep,
)
from agglomerationmultigrid1d_tpu.parallel import (
    make_solver_mesh,
    sharded_chebyshev_multisweep,
    sharded_multisweep,
)
from agglomerationmultigrid1d_tpu.smoothers.smoother import (
    BlockJacobiSmoother,
    apply_smoother,
)

FAILS: list[str] = []


def check(name: str, got, want, rtol=3e-5, atol=3e-4):
    got, want = np.asarray(got), np.asarray(want)
    err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-30)
    ok = err < max(rtol, atol / max(np.max(np.abs(want)), 1e-30))
    print(f"  {name:42s} rel err {err:9.2e}  {'OK' if ok else 'FAIL'}")
    if not ok:
        FAILS.append(name)


def well_conditioned_system(rng, bs, n):
    """Diagonally dominant, bounded condition per block (so f32 comparisons
    against the XLA path are meaningful everywhere)."""
    q = rng.normal(size=(n, bs, bs)).astype(np.float32)
    q /= np.linalg.norm(q, axis=(1, 2), keepdims=True)
    diag = 8.0 * np.eye(bs, dtype=np.float32)[None] + q
    lower = 0.25 * rng.normal(size=(bs, bs, n)).astype(np.float32)
    upper = 0.25 * rng.normal(size=(bs, bs, n)).astype(np.float32)
    lower[:, :, 0] = 0.0
    upper[:, :, -1] = 0.0
    inv = np.linalg.inv(diag).transpose(1, 2, 0).astype(np.float32)
    a = BlockTridiag(
        jnp.asarray(lower), jnp.asarray(diag.transpose(1, 2, 0)), jnp.asarray(upper)
    )
    x = jnp.asarray(rng.normal(size=(bs, n)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(bs, n)).astype(np.float32))
    return a, jnp.asarray(inv), x, b


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev} (platform={dev.platform})")
    if dev.platform not in ("tpu", "axon"):
        print("WARNING: not a TPU — this validates the interpret path only")

    rng = np.random.default_rng(7)
    bs, n = 4, 1 << 18
    a, inv, x, b = well_conditioned_system(rng, bs, n)
    sm = BlockJacobiSmoother(inv=inv)
    alpha = 2.0 / 3.0

    # XLA references
    y_ref = bt_matvec(a, x)
    x1_ref = x + alpha * apply_smoother(sm, b - bt_matvec(a, x))
    x3_ref = x
    for _ in range(3):
        x3_ref = x3_ref + alpha * apply_smoother(sm, b - bt_matvec(a, x3_ref))
    r3_ref = b - bt_matvec(a, x3_ref)
    coef = chebyshev_coefficients(0.2, 2.0, 3)
    xc_ref, d = x, jnp.zeros_like(x)
    for s_ in range(3):
        z = jnp.einsum("ijn,jn->in", inv, b - bt_matvec(a, xc_ref))
        d = coef[s_, 0] * d + coef[s_, 1] * z
        xc_ref = xc_ref + d
    rc_ref = b - bt_matvec(a, xc_ref)

    print("kernels (non-interpreted):")
    check("pallas_bt_matvec", pallas_bt_matvec(a, x), y_ref)
    check("pallas_block_jacobi_sweep", pallas_block_jacobi_sweep(a, inv, x, b, alpha), x1_ref)
    check(
        "pallas_block_jacobi_multisweep(3)",
        pallas_block_jacobi_multisweep(a, inv, x, b, n_sweeps=3, alpha=alpha),
        x3_ref,
    )
    x3, r3 = pallas_block_jacobi_multisweep_residual(a, inv, x, b, n_sweeps=3, alpha=alpha)
    check("multisweep_residual(3).x", x3, x3_ref)
    check("multisweep_residual(3).r", r3, r3_ref, atol=3e-3)
    xc, rc = pallas_chebyshev_multisweep(a, inv, x, b, coef, 3, emit_residual=True)
    check("pallas_chebyshev_multisweep(3).x", xc, xc_ref)
    check("pallas_chebyshev_multisweep(3).r", rc, rc_ref, atol=3e-3)

    print("shard_map-wrapped kernels (1-device mesh, real collectives path):")
    mesh = make_solver_mesh(1)
    xs = jax.jit(
        lambda a, i, x, b: sharded_multisweep(
            mesh, "x", a, i, x, b, n_sweeps=3, alpha=alpha, use_pallas=True
        )
    )(a, inv, x, b)
    check("sharded_multisweep(3) [overlap]", xs, x3_ref)
    xs_b = jax.jit(
        lambda a, i, x, b: sharded_multisweep(
            mesh, "x", a, i, x, b, n_sweeps=3, alpha=alpha, use_pallas=True,
            overlap=False,
        )
    )(a, inv, x, b)
    check("sharded_multisweep(3) [blocking]", xs_b, x3_ref)
    check("overlap == blocking", xs, xs_b, rtol=3e-6)
    xcs = jax.jit(
        lambda a, i, x, b: sharded_chebyshev_multisweep(
            mesh, "x", a, i, x, b, coef, degree=3, use_pallas=True
        )
    )(a, inv, x, b)
    check("sharded_chebyshev_multisweep(3)", xcs, xc_ref)

    # fused float-float stencil defect (true-precision cycle hot loop) vs the
    # XLA interior pass — identical EFT operation order on this backend
    print("float-float stencil defect kernel:")
    from agglomerationmultigrid1d_tpu.ops.df64 import (
        FF,
        BTFFStencil,
        _ff_mid_defect,
    )
    from agglomerationmultigrid1d_tpu.ops.pallas import pallas_ff_stencil_mid_defect

    bs2, n2 = 2, 1 << 18
    bt1 = lambda s: BlockTridiag(  # noqa: E731
        jnp.asarray(rng.normal(size=(bs2, bs2, 1)) * s, jnp.float32),
        jnp.asarray(rng.normal(size=(bs2, bs2, 1)) * s, jnp.float32),
        jnp.asarray(rng.normal(size=(bs2, bs2, 1)) * s, jnp.float32),
    )
    hi_mid, lo_mid = bt1(1.0), bt1(1e-7)
    xf = FF(
        jnp.asarray(rng.normal(size=(bs2, n2)), jnp.float32),
        jnp.asarray(1e-7 * rng.normal(size=(bs2, n2)), jnp.float32),
    )
    bf = FF(
        jnp.asarray(rng.normal(size=(bs2, n2)), jnp.float32),
        jnp.asarray(1e-7 * rng.normal(size=(bs2, n2)), jnp.float32),
    )
    out_k = pallas_ff_stencil_mid_defect(hi_mid, lo_mid, xf, bf)
    st2 = BTFFStencil(hi_left=hi_mid, hi_mid=hi_mid, hi_right=hi_mid,
                      lo_left=lo_mid, lo_mid=lo_mid, lo_right=lo_mid, n=n2)
    ref2 = _ff_mid_defect(st2, xf, bf, n2)
    vk = np.asarray(out_k.hi, np.float64) + np.asarray(out_k.lo, np.float64)
    vr = np.asarray(ref2.hi, np.float64) + np.asarray(ref2.lo, np.float64)
    check("pallas_ff_stencil_mid_defect", vk, vr, rtol=1e-11)

    # float-float defect accuracy WITHOUT the CPU-only optimization_barrier
    # fences (ops.df64._use_barriers): XLA:TPU must preserve the error-free
    # transforms — the defect of a random system must match the f64 reference
    # to ~2^-40, far past f32's 2^-24 (a reassociation regression lands ~1e-7)
    print("float-float defect (unfenced on this backend):")
    from agglomerationmultigrid1d_tpu.ops.df64 import bt_split, ff_bt_defect, ff_split

    a64 = BlockTridiag(*(jnp.asarray(np.asarray(m), jnp.float64) for m in a))
    x64 = jnp.asarray(np.asarray(x), jnp.float64) * (1.0 + 1e-9)
    b64 = jnp.asarray(np.asarray(b), jnp.float64)
    r64 = np.asarray(b64 - bt_matvec(a64, x64))
    a_ff = bt_split(a64)
    r_ff = jax.jit(ff_bt_defect)(a_ff, ff_split(x64), ff_split(b64))
    r_val = np.asarray(r_ff.hi, np.float64) + np.asarray(r_ff.lo, np.float64)
    scale = float(np.abs(b64).max())
    err = float(np.abs(r_val - r64).max()) / scale
    ok = err < 1e-10
    print(f"  {'ff_bt_defect vs f64':42s} rel err {err:9.2e}  {'OK' if ok else 'FAIL'}")
    if not ok:
        FAILS.append("ff_bt_defect")

    if FAILS:
        print(f"FAILED: {len(FAILS)} kernel(s): {FAILS}")
        return 1
    print("ALL KERNELS OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
