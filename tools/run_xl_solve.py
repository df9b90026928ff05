"""Run the north-star XL solve exactly as bench.py's XL stage does
(split-program guarded refinement + progressive-precision continuation).

Usage: python tools/run_xl_solve.py [n_el] [tol]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from agglomerationmultigrid1d_tpu.models.solvers import _mixed_eager_outer
from agglomerationmultigrid1d_tpu.models.stencil_setup import (
    build_xl_problem,
    default_stencil_factor,
)
from agglomerationmultigrid1d_tpu.ops.df64 import FF
from agglomerationmultigrid1d_tpu.utils.config import HierarchySpec


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n_el = int(sys.argv[1]) if len(sys.argv) > 1 else 3 << 24
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-8
    p_fine = 1
    n_agg = max(int(np.ceil(np.log2(max(n_el / 12288, 4)) / 2)), 1)
    spec = HierarchySpec(
        cg_orders=(), dg_orders=(p_fine,), n_agg_levels=n_agg, p_agg=1,
        agg_factor=4, c_dir=1000.0 * n_el,
    )
    t0 = time.time()
    h32, ffops, b_ff, norm_b = build_xl_problem(
        spec, n_el, z=default_stencil_factor(spec, n_el), slim_fine=True,
        ff_levels=True,
    )
    jax.block_until_ready(h32.levels[0].a)
    log(f"setup: {time.time()-t0:.1f}s dof={n_el*(p_fine+1):.4g} levels={h32.n_levels}")

    thr = 1 << 22
    cut = sum(1 for lv in h32.levels[:-1] if lv.a.n_blocks >= thr)
    kw = dict(
        maxiter=100, tol=tol, inner_tol=3.0e-5, max_inner=20,
        n_pre=3, n_post=3, alpha=2.0 / 3.0, use_pallas=thr,
        eager_inner=True, eager_cut=cut, ffops=ffops,
    )
    zero = jnp.zeros_like(b_ff.hi)
    x_ff = FF(zero, zero)
    inv_nb = jnp.asarray(1.0 / norm_b, jnp.float32)
    t0 = time.time()
    res = _mixed_eager_outer(h32, ffops.a_ffs[0], x_ff, b_ff, inv_nb, **kw)
    rel = float(np.asarray(res[3])[int(res[1]) - 1])
    log(f"[SOLVE] compile+run: {time.time()-t0:.1f}s, outers={int(res[1])}, "
        f"cycles={int(res[2])}, rel={rel:.2e} (cut={cut})")
    del res
    t0 = time.time()
    res = _mixed_eager_outer(h32, ffops.a_ffs[0], x_ff, b_ff, inv_nb, **kw)
    jax.block_until_ready(res[0].hi)
    rel = float(np.asarray(res[3])[int(res[1]) - 1])
    log(f"[SOLVE] steady: {time.time()-t0:.2f}s, outers={int(res[1])}, "
        f"cycles={int(res[2])}, rel={rel:.2e}")
    hist = np.asarray(res[3])[: int(res[1])]
    log("history:", " ".join(f"{v:.1e}" for v in hist))
    log("done")


if __name__ == "__main__":
    main()
