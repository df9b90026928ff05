"""Pallas kernel correctness (interpreter mode on CPU) and mixed-precision
multigrid convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agglomerationmultigrid1d_tpu.ops import BlockTridiag, bt_matvec
from agglomerationmultigrid1d_tpu.ops.pallas import (
    pallas_block_jacobi_sweep,
    pallas_bt_matvec,
)
from agglomerationmultigrid1d_tpu.smoothers.smoother import (
    BlockJacobiSmoother,
    apply_smoother,
)


def _random_bt(rng, bs, n, dtype=jnp.float64):
    l = rng.standard_normal((bs, bs, n))
    l[:, :, 0] = 0
    u = rng.standard_normal((bs, bs, n))
    u[:, :, -1] = 0
    d = rng.standard_normal((bs, bs, n)) + 5 * np.eye(bs)[:, :, None]
    return BlockTridiag(*[jnp.asarray(m, dtype) for m in (l, d, u)])


@pytest.mark.parametrize("bs,n", [(2, 512), (4, 1024), (9, 640)])
def test_pallas_matvec_matches_xla(rng, bs, n):
    a = _random_bt(rng, bs, n, jnp.float32)
    x = jnp.asarray(rng.standard_normal((bs, n)), jnp.float32)
    out = pallas_bt_matvec(a, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(bt_matvec(a, x)), atol=1e-4)


@pytest.mark.parametrize("bs,n", [(4, 1024), (2, 4096)])
def test_pallas_sweep_matches_xla(rng, bs, n):
    a = _random_bt(rng, bs, n, jnp.float32)
    sinv = jnp.asarray(rng.standard_normal((bs, bs, n)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((bs, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((bs, n)), jnp.float32)
    out = pallas_block_jacobi_sweep(a, sinv, x, b, interpret=True)
    ref = x + apply_smoother(BlockJacobiSmoother(inv=sinv), b - bt_matvec(a, x), 2.0 / 3.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pallas_f64_falls_back_to_xla(rng):
    a = _random_bt(rng, 4, 1024)
    x = jnp.asarray(rng.standard_normal((4, 1024)))
    out = pallas_bt_matvec(a, x)  # f64: pure XLA fallback, exact
    np.testing.assert_allclose(np.asarray(out), np.asarray(bt_matvec(a, x)), atol=0)


def test_pallas_fallback_small_n(rng):
    """n below the tile threshold transparently falls back to the XLA path."""
    a = _random_bt(rng, 4, 8)
    x = jnp.asarray(rng.standard_normal((4, 8)))
    out = pallas_bt_matvec(a, x)  # no interpret needed: pure XLA fallback
    np.testing.assert_allclose(np.asarray(out), np.asarray(bt_matvec(a, x)), atol=0)


def test_mixed_precision_multigrid_converges_to_f64_tol():
    """f32 inner V-cycle + f64 defect correction reaches 1e-10 relative residual
    and matches the all-f64 solve."""
    from agglomerationmultigrid1d_tpu.models.problems import poisson_dg_hierarchy
    from agglomerationmultigrid1d_tpu.models.solvers import (
        make_low_precision_hierarchy,
        multigrid,
        multigrid_mixed,
    )

    prob = poisson_dg_hierarchy(n=256, max_p=4, n_dg=3)
    h32 = make_low_precision_hierarchy(prob.hierarchy)
    b = prob.b
    res = multigrid_mixed(prob.hierarchy, h32, jnp.zeros_like(b), b, 80, 1e-10, use_pallas=False)
    it = int(res.iterations)
    nb = float(jnp.linalg.norm(b.T.reshape(-1)))
    r = np.asarray(res.res_history)[:it]
    assert r[-1] < 1e-10 * nb, (it, r[-1] / nb)

    res64 = multigrid(prob.hierarchy, jnp.zeros_like(b), b, 80, 1e-10, compute_error=False)
    # Both runs stop on the same relative-residual criterion; for this
    # penalty-conditioned A (CDir = 1000 n) two residual-stopped solutions may
    # legitimately differ by ~cond(A) * tol * ||x||.  Check both are equally
    # good solutions of the system rather than bitwise-near each other.
    from agglomerationmultigrid1d_tpu.models.solvers import _flatten_level_vec, level_matvec

    def true_rel_defect(x):
        return float(
            jnp.linalg.norm(_flatten_level_vec(level_matvec(prob.hierarchy.levels[0], x) - b))
        ) / nb

    assert true_rel_defect(res.x) < 1e-10
    assert true_rel_defect(res64.x) < 1e-10
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res64.x), atol=1e-4)
    # the mixed refinement should need far fewer f64 defects than f64 V-cycles,
    # and not dramatically more total cycles
    assert it <= int(res64.iterations), (it, int(res64.iterations))
    assert int(res.inner_cycles) <= 4 * int(res64.iterations), (
        int(res.inner_cycles), int(res64.iterations),
    )


def test_pallas_multisweep_mform_matches_xla(rng):
    """The M-form temporally-blocked multisweep (real pallas path, interpreter
    mode) vs plain damped block-Jacobi sweeps — with and without the
    precomputed ml/mu streams, and with the fused restrict-side residual."""
    from agglomerationmultigrid1d_tpu.ops.block_tridiag import block_mul
    from agglomerationmultigrid1d_tpu.ops.pallas import (
        pallas_block_jacobi_multisweep,
        pallas_block_jacobi_multisweep_residual,
    )

    bs, n = 4, 16384
    a = _random_bt(rng, bs, n, jnp.float32)
    sinv = jnp.asarray(
        np.linalg.inv(np.moveaxis(np.asarray(a.diag), -1, 0)).transpose(1, 2, 0),
        jnp.float32,
    )
    x0 = jnp.asarray(rng.standard_normal((bs, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((bs, n)), jnp.float32)

    ref = x0
    for _ in range(3):
        ref = ref + apply_smoother(
            BlockJacobiSmoother(inv=sinv), b - bt_matvec(a, ref), 2.0 / 3.0
        )
    r_ref = b - bt_matvec(a, ref)
    scale = float(jnp.abs(ref).max())

    out = pallas_block_jacobi_multisweep(a, sinv, x0, b, n_sweeps=3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5 * scale)

    ml, mu = block_mul(sinv, a.lower), block_mul(sinv, a.upper)
    out2, r2 = pallas_block_jacobi_multisweep_residual(
        a, sinv, x0, b, n_sweeps=3, interpret=True, ml=ml, mu=mu
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(r2), np.asarray(r_ref), atol=2e-4 * float(jnp.abs(b).max())
    )


def test_pallas_chebyshev_multisweep_matches_xla(rng):
    """Fused Chebyshev kernel (real pallas path at n >= 2*tile, interpreter
    mode) vs the plain XLA recurrence."""
    from agglomerationmultigrid1d_tpu.ops.pallas import (
        chebyshev_coefficients,
        pallas_chebyshev_multisweep,
    )

    bs, n, k = 4, 16384, 3
    a = _random_bt(rng, bs, n, jnp.float32)
    # the fused kernels run in M-form: s_inv must be the exact inverse of
    # a.diag (the block-Jacobi contract — see ops/pallas/block_kernels.py)
    sinv = jnp.asarray(
        np.linalg.inv(np.moveaxis(np.asarray(a.diag), -1, 0)).transpose(1, 2, 0),
        jnp.float32,
    )
    x0 = jnp.asarray(rng.standard_normal((bs, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((bs, n)), jnp.float32)
    coef = chebyshev_coefficients(jnp.float32(0.3), jnp.float32(1.2), k)

    # reference: unfused recurrence
    x, d = x0, jnp.zeros_like(x0)
    for s in range(k):
        z = jnp.einsum("ijn,jn->in", sinv, b - bt_matvec(a, x))
        d = coef[s, 0] * d + coef[s, 1] * z
        x = x + d
    r_ref = b - bt_matvec(a, x)

    out, r = pallas_chebyshev_multisweep(
        a, sinv, x0, b, coef, k, interpret=True, emit_residual=True
    )
    scale = float(jnp.abs(x).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(r), np.asarray(r_ref), atol=2e-4 * float(jnp.abs(b).max())
    )


def test_pallas_ff_stencil_mid_defect_matches_xla(rng):
    """The fused float-float stencil-defect kernel (true-precision cycle hot
    loop) == the XLA interior pass, to the pair-sum's f64-class accuracy (the
    CPU XLA path carries optimization-barrier fences the kernel does not, so
    lo tails may differ by reassociation; the hi+lo value is the invariant)."""
    from agglomerationmultigrid1d_tpu.ops import df64
    from agglomerationmultigrid1d_tpu.ops.df64 import FF, BTFFStencil
    from agglomerationmultigrid1d_tpu.ops.pallas import pallas_ff_stencil_mid_defect

    bs, n = 2, 16384  # tile = 8192 here; need n >= 2 * tile

    def bt1():
        return BlockTridiag(
            lower=jnp.asarray(rng.standard_normal((bs, bs, 1)), jnp.float32),
            diag=jnp.asarray(rng.standard_normal((bs, bs, 1)), jnp.float32),
            upper=jnp.asarray(rng.standard_normal((bs, bs, 1)), jnp.float32),
        )

    hi_mid, lo_mid = bt1(), jax.tree_util.tree_map(lambda v: 1e-7 * v, bt1())
    x = FF(
        jnp.asarray(rng.standard_normal((bs, n)), jnp.float32),
        jnp.asarray(1e-7 * rng.standard_normal((bs, n)), jnp.float32),
    )
    b = FF(
        jnp.asarray(rng.standard_normal((bs, n)), jnp.float32),
        jnp.asarray(1e-7 * rng.standard_normal((bs, n)), jnp.float32),
    )
    out = pallas_ff_stencil_mid_defect(hi_mid, lo_mid, x, b, interpret=True)
    assert out is not None
    st = BTFFStencil(
        hi_left=hi_mid, hi_mid=hi_mid, hi_right=hi_mid,
        lo_left=lo_mid, lo_mid=lo_mid, lo_right=lo_mid, n=n,
    )
    ref = df64._ff_mid_defect(st, x, b, n)
    v_out = np.asarray(out.hi, np.float64) + np.asarray(out.lo, np.float64)
    v_ref = np.asarray(ref.hi, np.float64) + np.asarray(ref.lo, np.float64)
    np.testing.assert_allclose(
        v_out, v_ref, rtol=0, atol=1e-11 * float(np.abs(v_ref).max())
    )
