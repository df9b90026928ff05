"""Progressive-precision-only solve at the north-star size: split-program ff
cycles from x = 0, no guarded f32 refinement phase.

Usage: python tools/run_xl_progressive.py [n_el] [tol]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from agglomerationmultigrid1d_tpu.models.solvers import _progressive_true_eager
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
    cheb = (sys.argv[3] != "0") if len(sys.argv) > 3 else True
    p_fine = 1
    n_agg = max(int(np.ceil(np.log2(max(n_el / 12288, 4)) / 2)), 1)
    spec = HierarchySpec(
        cg_orders=(), dg_orders=(p_fine,), n_agg_levels=n_agg, p_agg=1,
        agg_factor=4, c_dir=1000.0 * n_el,
    )
    t0 = time.time()
    h32, ffops, b_ff, norm_b = build_xl_problem(
        spec, n_el, z=default_stencil_factor(spec, n_el), slim_fine=True,
        ff_levels=True, chebyshev=cheb,
    )
    jax.block_until_ready(h32.levels[0].a)
    log(f"setup: {time.time()-t0:.1f}s dof={n_el*(p_fine+1):.4g} levels={h32.n_levels} cheb={cheb}")

    thr = 1 << 22
    cut = sum(1 for lv in h32.levels[:-1] if lv.a.n_blocks >= thr)
    kw = dict(maxiter=40, tol=tol, cut=cut, n_pre=3, n_post=3, alpha=2.0 / 3.0)
    zero = jnp.zeros_like(b_ff.hi)
    x0 = FF(zero, zero)
    inv_nb = jnp.asarray(1.0 / norm_b, jnp.float32)
    t0 = time.time()
    x, it, hist = _progressive_true_eager(h32, ffops, x0, b_ff, inv_nb, **kw)
    rel = float(hist[it - 1])
    log(f"[PROG] compile+run: {time.time()-t0:.1f}s, cycles={it}, rel={rel:.2e} (cut={cut})")
    del x
    t0 = time.time()
    x, it, hist = _progressive_true_eager(h32, ffops, x0, b_ff, inv_nb, **kw)
    jax.block_until_ready(x.hi)
    rel = float(hist[it - 1])
    log(f"[PROG] steady: {time.time()-t0:.2f}s, cycles={it}, rel={rel:.2e}")
    log("history:", " ".join(f"{v:.1e}" for v in hist[:it]))
    log("done")


if __name__ == "__main__":
    main()
