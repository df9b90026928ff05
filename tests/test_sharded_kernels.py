"""Fused smoother kernels inside shard_map must reproduce the single-device
results exactly: the ppermute ghost exchange + temporally-blocked Pallas
multisweep (interpret mode on CPU) and the halo-aware XLA fallback are both
checked against the global unsharded formulation.

The reference is a serial solver (SURVEY §2: no distributed code); these tests
pin the TPU-native scaling path (BASELINE.json north star) instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agglomerationmultigrid1d_tpu.models.problems import poisson_dg_hierarchy
from agglomerationmultigrid1d_tpu.models.solvers import multigrid, v_cycle
from agglomerationmultigrid1d_tpu.ops.block_tridiag import BlockTridiag, bt_matvec
from agglomerationmultigrid1d_tpu.ops.pallas import chebyshev_coefficients
from agglomerationmultigrid1d_tpu.ops.pallas.block_kernels import multisweep_shapes_ok
from agglomerationmultigrid1d_tpu.parallel import (
    fused_shard_spec,
    make_solver_mesh,
    shard_hierarchy,
    sharded_chebyshev_multisweep,
    sharded_multisweep,
)
from agglomerationmultigrid1d_tpu.parallel.distributed import shard_vector
from agglomerationmultigrid1d_tpu.smoothers.smoother import (
    BlockJacobiSmoother,
    apply_smoother,
)


def _random_system(rng, bs, n, dtype):
    """Diagonally dominant block-tridiagonal system + block-Jacobi inverse."""
    diag = rng.normal(size=(bs, bs, n)) + 6.0 * np.eye(bs)[:, :, None]
    lower = 0.3 * rng.normal(size=(bs, bs, n))
    upper = 0.3 * rng.normal(size=(bs, bs, n))
    lower[:, :, 0] = 0.0
    upper[:, :, -1] = 0.0
    a = BlockTridiag(*(jnp.asarray(m, dtype) for m in (lower, diag, upper)))
    inv = jnp.asarray(
        np.linalg.inv(np.moveaxis(diag, -1, 0)).transpose(1, 2, 0), dtype
    )
    x = jnp.asarray(rng.normal(size=(bs, n)), dtype)
    b = jnp.asarray(rng.normal(size=(bs, n)), dtype)
    return a, inv, x, b


def _reference_sweeps(a, inv, x, b, n_sweeps, alpha):
    sm = BlockJacobiSmoother(inv=inv)
    for _ in range(n_sweeps):
        x = x + apply_smoother(sm, b - bt_matvec(a, x), alpha=alpha)
    return x


def _reference_cheb(a, inv, x, b, coef, degree):
    d = jnp.zeros_like(x)
    cf = coef.astype(x.dtype)
    for s in range(degree):
        z = jnp.einsum("ijn,jn->in", inv, b - bt_matvec(a, x))
        d = cf[s, 0] * d + cf[s, 1] * z
        x = x + d
    return x


@pytest.mark.parametrize("emit_residual", [False, True])
def test_sharded_multisweep_xla_fallback_matches(rng, emit_residual):
    """f64 (parity dtype) takes the halo-aware XLA path per shard."""
    bs, n = 3, 256
    a, inv, x, b = _random_system(rng, bs, n, jnp.float64)
    mesh = make_solver_mesh(8)
    out = sharded_multisweep(
        mesh, "x", a, inv, x, b, n_sweeps=3, alpha=2.0 / 3.0,
        emit_residual=emit_residual, use_pallas=False,
    )
    ref = _reference_sweeps(a, inv, x, b, 3, 2.0 / 3.0)
    if emit_residual:
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref), rtol=1e-13)
        np.testing.assert_allclose(
            np.asarray(out[1]), np.asarray(b - bt_matvec(a, ref)), atol=1e-12
        )
    else:
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-13)


@pytest.mark.parametrize("emit_residual", [False, True])
def test_sharded_multisweep_pallas_ghosts_match(rng, emit_residual):
    """f32 shapes the kernel accepts run the ghosted Pallas multisweep
    (interpret mode on CPU) — the shard ghosts must make the result identical
    to the global unsharded sweeps."""
    bs, n = 4, 8 * 16384  # per-shard n=16384: tile=8192, two tiles per shard
    assert multisweep_shapes_ok(bs, n // 8, jnp.float32, 3)
    a, inv, x, b = _random_system(rng, bs, n, jnp.float32)
    mesh = make_solver_mesh(8)
    out = sharded_multisweep(
        mesh, "x", a, inv, x, b, n_sweeps=3, alpha=2.0 / 3.0,
        emit_residual=emit_residual, use_pallas=True, interpret=True,
    )
    ref = _reference_sweeps(a, inv, x, b, 3, 2.0 / 3.0)
    x_new = out[0] if emit_residual else out
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(ref), rtol=2e-5, atol=2e-5)
    if emit_residual:
        np.testing.assert_allclose(
            np.asarray(out[1]), np.asarray(b - bt_matvec(a, ref)), atol=5e-4
        )


def test_sharded_cheb_pallas_ghosts_match(rng):
    bs, n = 4, 8 * 16384
    degree = 3
    a, inv, x, b = _random_system(rng, bs, n, jnp.float32)
    coef = chebyshev_coefficients(0.2, 2.0, degree)
    mesh = make_solver_mesh(8)
    out, r = sharded_chebyshev_multisweep(
        mesh, "x", a, inv, x, b, coef, degree=degree,
        emit_residual=True, use_pallas=True, interpret=True,
    )
    ref = _reference_cheb(a, inv, x, b, coef, degree)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(r), np.asarray(b - bt_matvec(a, ref)), atol=5e-3
    )


@pytest.mark.parametrize("emit_residual", [False, True])
def test_overlap_schedule_matches_blocking(rng, emit_residual):
    """The overlapped halo schedule (zero-ghost full pass + ghost-exact edge
    strips, ppermutes concurrent) must equal the blocking schedule (ghosts
    before the kernel) to f32 rounding of the recomputed edge columns."""
    bs, n = 4, 8 * 16384
    a, inv, x, b = _random_system(rng, bs, n, jnp.float32)
    mesh = make_solver_mesh(8)
    kw = dict(n_sweeps=3, alpha=2.0 / 3.0, emit_residual=emit_residual,
              use_pallas=True, interpret=True)
    out_o = sharded_multisweep(mesh, "x", a, inv, x, b, overlap=True, **kw)
    out_b = sharded_multisweep(mesh, "x", a, inv, x, b, overlap=False, **kw)
    if not emit_residual:
        out_o, out_b = (out_o,), (out_b,)
    for yo, yb in zip(out_o, out_b):
        np.testing.assert_allclose(np.asarray(yo), np.asarray(yb), atol=2e-5)

    coef = chebyshev_coefficients(0.2, 2.0, 3)
    co = sharded_chebyshev_multisweep(
        mesh, "x", a, inv, x, b, coef, degree=3, use_pallas=True,
        interpret=True, overlap=True,
    )
    cb = sharded_chebyshev_multisweep(
        mesh, "x", a, inv, x, b, coef, degree=3, use_pallas=True,
        interpret=True, overlap=False,
    )
    np.testing.assert_allclose(np.asarray(co), np.asarray(cb), atol=2e-5)


def test_sharded_cheb_xla_fallback_matches(rng):
    bs, n = 3, 256
    a, inv, x, b = _random_system(rng, bs, n, jnp.float64)
    coef = chebyshev_coefficients(0.2, 2.0, 4)
    mesh = make_solver_mesh(8)
    out = sharded_chebyshev_multisweep(
        mesh, "x", a, inv, x, b, coef, degree=4, use_pallas=False
    )
    ref = _reference_cheb(a, inv, x, b, coef, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)


def test_fused_v_cycle_matches_auto_spmd():
    """The fused shard_map smoother path must give the same V-cycle as XLA's
    automatic partitioning (here the small shapes take the halo-aware XLA local
    function — the code path under test is the shard_map routing itself)."""
    prob = poisson_dg_hierarchy(n=128, max_p=4, n_dg=3)
    ref = v_cycle(prob.hierarchy, jnp.zeros_like(prob.b), prob.b)

    mesh = make_solver_mesh(8)
    h = shard_hierarchy(prob.hierarchy, mesh, min_blocks_per_device=4)
    shard = fused_shard_spec(h, mesh)
    assert any(shard[2]), "expected at least one sharded block level"
    b = shard_vector(prob.b, mesh)
    out = jax.jit(
        lambda hh, bb: v_cycle(hh, jnp.zeros_like(bb), bb, shard=shard)
    )(h, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12, atol=1e-13)


def test_fused_multigrid_matches_single():
    """Full multigrid driver with fused shard_map smoothers: iteration parity +
    identical residual histories vs the single-device solve."""
    prob = poisson_dg_hierarchy(n=128, max_p=4, n_dg=3)
    res_ref = multigrid(prob.hierarchy, jnp.zeros_like(prob.b), prob.b, 50, 1e-10)

    mesh = make_solver_mesh(8)
    h = shard_hierarchy(prob.hierarchy, mesh, min_blocks_per_device=4)
    shard = fused_shard_spec(h, mesh)
    b = shard_vector(prob.b, mesh)
    res = multigrid(h, jnp.zeros_like(b), b, 50, 1e-10, shard=shard)

    assert int(res.iterations) == int(res_ref.iterations)
    it = int(res.iterations)
    np.testing.assert_allclose(
        np.asarray(res.res_history)[:it], np.asarray(res_ref.res_history)[:it], rtol=1e-9
    )
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_ref.x), atol=1e-9)
