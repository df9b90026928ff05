"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: damped block-Jacobi smoother sweep throughput (nnz/s/chip) on a
large 1D DG p=3 Poisson operator — the hot loop of every V-cycle
(BASELINE.json metric).  ``vs_baseline`` is the ratio against the same sweep
executed with vectorized host NumPy (the closest stand-in for the reference's
serial-CPU execution model; the reference itself publishes no numbers).

Extra fields report the V-cycle time-to-1e-8-residual on a mid-size DG
hierarchy.  Set AGGMG_BENCH_SMALL=1 for a quick smoke run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from agglomerationmultigrid1d_tpu.assembly import dg_flux_operators
from agglomerationmultigrid1d_tpu.mesh import BoundaryCondition, create_uniform_mesh, make_dg_mesh
from agglomerationmultigrid1d_tpu.models.hierarchy import _schur_stiffness
from agglomerationmultigrid1d_tpu.ops import bt_matvec
from agglomerationmultigrid1d_tpu.smoothers import BlockJacobiSmoother, apply_smoother, dg_smoother
from agglomerationmultigrid1d_tpu.utils.host import on_host, to_accelerator

SMALL = bool(os.environ.get("AGGMG_BENCH_SMALL"))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_smoother_problem(n_el: int, p: int = 3):
    """Real DG p=3 Schur stiffness + block-Jacobi smoother at n_el elements."""
    with on_host():
        mesh = create_uniform_mesh(n_el, 0.0, 1.0)
        dg = make_dg_mesh(mesh, p)
        bc = BoundaryCondition(("neu", 0.0), ("dir", 1.0))
        g, d, c = dg_flux_operators(dg, bc, 1000.0 * n_el)
        a = _schur_stiffness(g, d, c, dg.mass_inv)
        s = dg_smoother(a, "blockJac")
        b = jnp.sin(jnp.linspace(0.0, 3.0, (p + 1) * n_el)).reshape(n_el, p + 1).T
    return to_accelerator((a, s, b))


def sweep(a, s, x, b, alpha=2.0 / 3.0):
    """One damped block-Jacobi smoother application: x + alpha * S (b - A x)."""
    return x + apply_smoother(s, b - bt_matvec(a, x), alpha=alpha)


def sweep_nnz(n_el: int, bs: int) -> int:
    """Nonzeros processed per sweep: the 3 block diagonals of A plus the inverse
    diagonal blocks of S (matching how the reference's sweep touches A and its
    block LU factors)."""
    nnz_a = bs * bs * (3 * n_el - 2)
    nnz_s = bs * bs * n_el
    return nnz_a + nnz_s


def bench_smoother(n_el: int, p: int = 3, iters: int = 50):
    a, s, b = build_smoother_problem(n_el, p)
    x0 = jnp.zeros_like(b)

    # operators are jit ARGUMENTS, not closure constants — closed-over arrays
    # would be embedded in the HLO module (gigabytes through remote compile)
    step = jax.jit(sweep)
    t0 = time.time()
    x = step(a, s, x0, b)
    x.block_until_ready()
    log(f"smoother compile+first run: {time.time() - t0:.1f}s")

    # steady-state timing
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = step(a, s, x, b)
    x.block_until_ready()
    dt = (time.time() - t0) / iters
    nnz = sweep_nnz(n_el, p + 1)
    log(f"smoother sweep: {dt*1e3:.2f} ms/sweep, {nnz/dt/1e9:.2f} GNNZ/s")
    return nnz / dt


def bench_smoother_numpy(n_el: int, p: int = 3, iters: int = 5):
    """The same sweep with vectorized host NumPy (serial-CPU baseline)."""
    a, s, b = jax.tree_util.tree_map(np.asarray, build_smoother_problem(n_el, p))
    x = np.zeros_like(b)

    def np_sweep(x):
        r = b.copy()
        r -= np.einsum("ijn,jn->in", a.diag, x)
        r[:, 1:] -= np.einsum("ijn,jn->in", a.lower[:, :, 1:], x[:, :-1])
        r[:, :-1] -= np.einsum("ijn,jn->in", a.upper[:, :, :-1], x[:, 1:])
        return x + (2.0 / 3.0) * np.einsum("ijn,jn->in", s.inv, r)

    np_sweep(x)  # warm
    t0 = time.time()
    for _ in range(iters):
        x = np_sweep(x)
    dt = (time.time() - t0) / iters
    nnz = sweep_nnz(n_el, p + 1)
    log(f"numpy sweep ({n_el} elements): {dt*1e3:.2f} ms/sweep, {nnz/dt/1e9:.3f} GNNZ/s")
    return nnz / dt


def bench_vcycle_time_to_tol(n: int):
    from agglomerationmultigrid1d_tpu.models.problems import poisson_dg_hierarchy
    from agglomerationmultigrid1d_tpu.models.solvers import multigrid

    prob = poisson_dg_hierarchy(n=n, max_p=4, n_dg=3)
    b = prob.b
    norm_b = float(jnp.linalg.norm(b.T.reshape(-1)))
    t0 = time.time()
    res = multigrid(prob.hierarchy, jnp.zeros_like(b), b, 40, 1e-8, compute_error=False)
    res.x.block_until_ready()
    log(f"v-cycle compile+solve: {time.time() - t0:.1f}s, iters={int(res.iterations)}")
    # timed steady-state solve (recompiled graph is cached in-process)
    t0 = time.time()
    res = multigrid(prob.hierarchy, jnp.zeros_like(b), b, 40, 1e-8, compute_error=False)
    res.x.block_until_ready()
    dt = time.time() - t0
    it = int(res.iterations)
    r = float(np.asarray(res.res_history)[max(it - 1, 0)])
    log(f"v-cycle solve to res<1e-8||b|| ({r/norm_b:.1e} rel): {dt:.3f}s in {it} cycles")
    return dt, it


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    n_el = 1 << 14 if SMALL else 1 << 20  # 1M elements = 4.2M DoF at p=3
    tpu_nnz_s = bench_smoother(n_el)

    np_el = 1 << 14 if SMALL else 1 << 18
    cpu_nnz_s = bench_smoother_numpy(np_el)

    try:
        vc_time, vc_iters = bench_vcycle_time_to_tol(256 if SMALL else 4096)
    except Exception as e:  # pragma: no cover
        log(f"v-cycle bench failed: {e}")
        vc_time, vc_iters = None, None

    result = {
        "metric": "block-Jacobi smoother sweep throughput, 1D DG p=3 Poisson (f64)",
        "value": round(tpu_nnz_s / 1e9, 4),
        "unit": "GNNZ/s/chip",
        "vs_baseline": round(tpu_nnz_s / cpu_nnz_s, 3),
        "baseline": "same sweep, vectorized host NumPy (serial-CPU stand-in; reference publishes no numbers)",
        "problem_dof": n_el * 4,
        "vcycle_time_to_1e-8_s": vc_time if vc_time is None else round(vc_time, 3),
        "vcycle_iterations": vc_iters,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
