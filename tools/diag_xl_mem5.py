"""Stage-5: memory-account the split-program XL solve.

diag3e: all fine-level split programs compile in ~2 s and the solve runs —
but at 1.006e8 DoF the first inner cycle dies with a runtime HBM
ResourceExhausted.  Here: (a) run the whole solve at HALF size to prove the
path end-to-end, then (b) at full size, step the first cycle program by
program printing device memory stats to find the allocation spike.

Usage: python tools/diag_xl_mem5.py [n_el] [half_first=1]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from agglomerationmultigrid1d_tpu.models.solvers import (
    _ff_rel_defect,
    _level_correct_program,
    _level_postsmooth_program,
    _level_pre_program,
    _mixed_eager_outer,
    _tail_cycle_program,
    _tail_hierarchy,
)
from agglomerationmultigrid1d_tpu.models.stencil_setup import (
    build_xl_problem,
    default_stencil_factor,
)
from agglomerationmultigrid1d_tpu.ops.df64 import FF
from agglomerationmultigrid1d_tpu.utils.config import HierarchySpec


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def mem(tag):
    try:
        st = jax.local_devices()[0].memory_stats()
        used = st.get("bytes_in_use", 0) / 1e9
        peak = st.get("peak_bytes_in_use", 0) / 1e9
        log(f"[MEM] {tag}: in_use={used:.2f}GB peak={peak:.2f}GB")
    except Exception as e:
        live = sum(x.nbytes for x in jax.live_arrays()) / 1e9
        log(f"[MEM] {tag}: live_logical={live:.2f}GB (memory_stats: {e})")


def build(n_el, p_fine=1):
    n_agg = max(int(np.ceil(np.log2(max(n_el / 12288, 4)) / 2)), 1)
    spec = HierarchySpec(
        cg_orders=(), dg_orders=(p_fine,), n_agg_levels=n_agg, p_agg=1,
        agg_factor=4, c_dir=1000.0 * n_el,
    )
    z = default_stencil_factor(spec, n_el)
    return build_xl_problem(spec, n_el, z=z, slim_fine=True)


def solve(h32, a_ff, b_ff, norm_b, tag):
    thr = 1 << 22
    cut = sum(1 for lv in h32.levels[:-1] if lv.a.n_blocks >= thr)
    kw = dict(
        maxiter=100, tol=1e-8, inner_tol=3.0e-5, max_inner=20,
        n_pre=3, n_post=3, alpha=2.0 / 3.0, use_pallas=thr,
        eager_inner=True, eager_cut=cut,
    )
    zero = jnp.zeros_like(b_ff.hi)
    x_ff = FF(zero, zero)
    inv_nb = jnp.asarray(1.0 / norm_b, jnp.float32)
    t0 = time.time()
    res = _mixed_eager_outer(h32, a_ff, x_ff, b_ff, inv_nb, **kw)
    rel = float(np.asarray(res[3])[int(res[1]) - 1])
    log(f"[SOLVE {tag}] compile+run: {time.time()-t0:.1f}s, outers={int(res[1])}, "
        f"cycles={int(res[2])}, rel={rel:.2e} (cut={cut})")
    del res
    t0 = time.time()
    res = _mixed_eager_outer(h32, a_ff, x_ff, b_ff, inv_nb, **kw)
    jax.block_until_ready(res[0].hi)
    rel = float(np.asarray(res[3])[int(res[1]) - 1])
    log(f"[SOLVE {tag}] steady: {time.time()-t0:.2f}s, outers={int(res[1])}, "
        f"cycles={int(res[2])}, rel={rel:.2e}")


def stepped_first_cycle(h32, a_ff, b_ff, norm_b):
    thr = 1 << 22
    kwp = dict(n_pre=3, alpha=2.0 / 3.0, use_pallas=thr)
    kws = dict(n_post=3, alpha=2.0 / 3.0, use_pallas=thr)
    zero = jnp.zeros_like(b_ff.hi)
    x_ff = FF(zero, zero)
    inv_nb = jnp.asarray(1.0 / norm_b, jnp.float32)
    mem("start")
    r_ff, rel = _ff_rel_defect(a_ff, x_ff, b_ff, inv_nb)
    jax.block_until_ready(r_ff.hi)
    mem("after ff defect")
    r = r_ff.hi
    del r_ff
    e = jnp.zeros_like(r)
    u0, rhs1 = _level_pre_program(h32, e, r, k=0, zero_init=False, **kwp)
    jax.block_until_ready(u0)
    mem("after L0 pre")
    u1, rhs2 = _level_pre_program(h32, rhs1, rhs1, k=1, zero_init=True, **kwp)
    jax.block_until_ready(u1)
    mem("after L1 pre")
    h_tail = _tail_hierarchy(h32, 2)
    uc = _tail_cycle_program(h_tail, rhs2, n_pre=3, **kws)
    jax.block_until_ready(uc)
    mem("after tail")
    u1b = _level_correct_program(h32, u1, uc, k=1, use_pallas=thr)
    u1c = _level_postsmooth_program(h32, u1b, rhs1, k=1, emit_norm=False, **kws)
    jax.block_until_ready(u1c)
    mem("after L1 post")
    u0b = _level_correct_program(h32, u0, u1c, k=0, use_pallas=thr)
    jax.block_until_ready(u0b)
    mem("after L0 correct")
    u0c, nrm = _level_postsmooth_program(h32, u0b, r, k=0, emit_norm=True, **kws)
    jax.block_until_ready(u0c)
    mem("after L0 post")
    log(f"first-cycle residual norm: {float(nrm):.3e}")


def main():
    n_el = int(sys.argv[1]) if len(sys.argv) > 1 else 3 << 24
    half_first = (sys.argv[2] != "0") if len(sys.argv) > 2 else True
    if half_first:
        h32, a_ff, b_ff, norm_b = build(n_el // 2)
        mem("half-size built")
        solve(h32, a_ff, b_ff, norm_b, f"{n_el//2}el")
        del h32, a_ff, b_ff
    h32, a_ff, b_ff, norm_b = build(n_el)
    mem("full-size built")
    stepped_first_cycle(h32, a_ff, b_ff, norm_b)
    mem("stepped cycle done")
    solve(h32, a_ff, b_ff, norm_b, f"{n_el}el")
    log("done")


if __name__ == "__main__":
    main()
