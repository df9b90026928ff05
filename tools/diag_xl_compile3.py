"""Stage-3: validate the split-program XL solve end-to-end at 1.006e8 DoF.

diag2 findings: any fused module CONTAINING a BlockProlong at >= ~1.3e7 output
columns compiles pathologically (407 s at 1.26e7) or SIGKILLs the remote
compile helper (5e7, with or without Pallas); smooth+restrict programs and the
Pallas-free tail from level 2 compile fine.  Here we compile the three split
fine-level programs individually, then run the full split-program guarded
solve (`_mixed_eager_outer(eager_inner=True, eager_cut=2)`) and report its
wall time and residual.
"""

from __future__ import annotations

import functools
import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

from agglomerationmultigrid1d_tpu.models.solvers import (
    _level_correct_program,
    _level_postsmooth_program,
    _level_pre_program,
    _mixed_eager_outer,
)
from agglomerationmultigrid1d_tpu.models.stencil_setup import (
    build_xl_problem,
    default_stencil_factor,
)
from agglomerationmultigrid1d_tpu.ops.df64 import FF
from agglomerationmultigrid1d_tpu.utils.config import HierarchySpec


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def try_compile(name, jitted, *args, **kw):
    t0 = time.time()
    try:
        jitted.lower(*args, **kw).compile()
        log(f"[OK] {name}: {time.time()-t0:.1f}s")
        return True
    except Exception as e:
        log(f"[FAIL] {name} after {time.time()-t0:.1f}s: {str(e)[:300]}")
        log(traceback.format_exc()[-1200:])
        return False


def main():
    n_el = int(sys.argv[1]) if len(sys.argv) > 1 else 3 << 24
    p_fine = 1
    n_agg = max(int(np.ceil(np.log2(max(n_el / 12288, 4)) / 2)), 1)
    spec = HierarchySpec(
        cg_orders=(), dg_orders=(p_fine,), n_agg_levels=n_agg, p_agg=1,
        agg_factor=4, c_dir=1000.0 * n_el,
    )
    z = default_stencil_factor(spec, n_el)
    t0 = time.time()
    h32, a_ff, b_ff, norm_b = build_xl_problem(spec, n_el, z=z, slim_fine=True)
    jax.block_until_ready(h32.levels[0].a)
    log(f"setup: {time.time()-t0:.1f}s")

    thr = 1 << 22
    r = b_ff.hi
    n1 = h32.levels[1].a.n_blocks
    rhs1 = jnp.zeros((h32.levels[1].a.block_size, n1), jnp.float32)

    ok = try_compile(
        "level0_pre", _level_pre_program, h32, r, r,
        k=0, zero_init=False, n_pre=3, alpha=2.0 / 3.0, use_pallas=thr,
    )
    ok &= try_compile(
        "level0_correct", _level_correct_program, h32, r, rhs1, k=0, use_pallas=thr
    )
    ok &= try_compile(
        "level0_postsmooth_norm", _level_postsmooth_program, h32, r, r,
        k=0, emit_norm=True, n_post=3, alpha=2.0 / 3.0, use_pallas=thr,
    )
    if not ok:
        log("split programs failed — not attempting the full solve")
        return

    cut = sum(1 for lv in h32.levels[:-1] if lv.a.n_blocks >= thr)
    kw = dict(
        maxiter=100, tol=1e-8, inner_tol=3.0e-5, max_inner=20,
        n_pre=3, n_post=3, alpha=2.0 / 3.0, use_pallas=thr,
        eager_inner=True, eager_cut=cut,
    )
    x_ff = FF(jnp.zeros_like(r), jnp.zeros_like(r))
    inv_nb = jnp.asarray(1.0 / norm_b, jnp.float32)
    t0 = time.time()
    res = _mixed_eager_outer(h32, a_ff, x_ff, b_ff, inv_nb, **kw)
    rel = float(np.asarray(res[3])[int(res[1]) - 1])
    log(f"[SOLVE] compile+run: {time.time()-t0:.1f}s, outers={int(res[1])}, "
        f"cycles={int(res[2])}, rel={rel:.2e} (cut={cut})")
    t0 = time.time()
    res = _mixed_eager_outer(h32, a_ff, x_ff, b_ff, inv_nb, **kw)
    jax.block_until_ready(res[0].hi)
    rel = float(np.asarray(res[3])[int(res[1]) - 1])
    log(f"[SOLVE] steady: {time.time()-t0:.2f}s, outers={int(res[1])}, "
        f"cycles={int(res[2])}, rel={rel:.2e}")

    # curiosity probe LAST (a failure here must not cost the solve number):
    # with the transpose+reshape prolong, does the fully-fused whole-cycle
    # module now compile at this size?
    import functools as _ft

    from agglomerationmultigrid1d_tpu.models.solvers import _inner_cycle_step

    try_compile(
        "inner_cycle_step(full, new prolong)",
        jax.jit(_ft.partial(
            _inner_cycle_step, n_pre=3, n_post=3, alpha=2.0 / 3.0, use_pallas=thr
        )),
        h32, jnp.zeros_like(r), r,
    )
    log("done")


if __name__ == "__main__":
    main()
