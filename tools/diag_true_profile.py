"""Steady-state per-stage timing of the TRUE-precision cycle at 1e8 DoF."""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from agglomerationmultigrid1d_tpu.models.solvers import (
    _f64_rel_defect,
    _ff_add_program,
    _true_level_correct_program,
    _true_level_postsmooth_program,
    _true_level_pre_program,
    _true_tail_cycle_program,
)
from agglomerationmultigrid1d_tpu.models.stencil_setup import (
    build_xl_problem,
    default_stencil_factor,
)
from agglomerationmultigrid1d_tpu.ops.df64 import FF
from agglomerationmultigrid1d_tpu.utils.config import HierarchySpec


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, reps=5):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    log(f"  {name}: {(time.time()-t0)/reps*1e3:.0f} ms")
    return out


def main():
    n_el = int(sys.argv[1]) if len(sys.argv) > 1 else 3 << 24
    n_agg = max(int(np.ceil(np.log2(max(n_el / 12288, 4)) / 2)), 1)
    spec = HierarchySpec(
        cg_orders=(), dg_orders=(1,), n_agg_levels=n_agg, p_agg=1,
        agg_factor=4, c_dir=1000.0 * n_el,
    )
    t0 = time.time()
    h32, ffops, b_ff, norm_b = build_xl_problem(
        spec, n_el, z=default_stencil_factor(spec, n_el), slim_fine=True,
        ff_levels=True,
    )
    jax.block_until_ready(h32.levels[0].a)
    log(f"setup: {time.time()-t0:.1f}s")
    kwp = dict(n_pre=3, alpha=2.0 / 3.0)
    zero = jnp.zeros_like(b_ff.hi)
    x_ff = FF(zero, zero)
    inv_nb = jnp.asarray(1.0 / norm_b, jnp.float32)

    r_ff, _ = timeit("f64 outer defect", lambda: _f64_rel_defect(
        ffops.a_ffs[0], x_ff, b_ff, inv_nb))
    u0, rhs1 = timeit("L0 pre (3 ff defects + smooth)", lambda: _true_level_pre_program(
        h32, ffops, r_ff, k=0, **kwp))
    u1, rhs2 = timeit("L1 pre", lambda: _true_level_pre_program(
        h32, ffops, rhs1, k=1, **kwp))
    uc = timeit("tail cycle", lambda: _true_tail_cycle_program(
        h32, ffops, rhs2, cut=2, n_pre=3, n_post=3, alpha=2.0 / 3.0))
    u1b = timeit("L1 correct", lambda: _true_level_correct_program(
        h32, ffops, u1, uc, k=1))
    u1c = timeit("L1 post", lambda: _true_level_postsmooth_program(
        h32, ffops, u1b, rhs1, k=1, n_post=3, alpha=2.0 / 3.0))
    u0b = timeit("L0 correct (chunked prolong)", lambda: _true_level_correct_program(
        h32, ffops, u0, u1c, k=0))
    timeit("L0 post", lambda: _true_level_postsmooth_program(
        h32, ffops, u0b, r_ff, k=0, n_post=3, alpha=2.0 / 3.0))
    timeit("ff add", lambda: _ff_add_program(x_ff, u0))
    log("done")


if __name__ == "__main__":
    main()
