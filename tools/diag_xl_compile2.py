"""Stage-2 bisect of the XL compile ceiling (see diag_xl_compile.py).

Finding so far (1.006e8 DoF, PALLAS_MIN_BLOCKS = 1<<22):
  - ff defect, fine pre-smooth+restrict at FULL size: compile in seconds
  - tail V-cycle over levels 1..6 (2.5e7 DoF): compile helper SIGKILLed
Hypothesis: the Pallas (Mosaic) kernels of level 1 inside the fused tail
module are what OOMs the helper; a tail from level 2 (which carries no Pallas
under the threshold) should compile, with level 1 handled by its own split
pre/post programs (eager_cut=2).
"""

from __future__ import annotations

import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

import agglomerationmultigrid1d_tpu.models.solvers as solvers
from agglomerationmultigrid1d_tpu.models.solvers import (
    _level_post_program,
    _level_pre_program,
    _tail_cycle_program,
    _tail_hierarchy,
)
from agglomerationmultigrid1d_tpu.models.stencil_setup import (
    build_xl_problem,
    default_stencil_factor,
)
from agglomerationmultigrid1d_tpu.ops.coarse_solve import coarse_solve
from agglomerationmultigrid1d_tpu.utils.config import HierarchySpec


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def try_compile(name, jitted, *args, **kw):
    t0 = time.time()
    try:
        compiled = jitted.lower(*args, **kw).compile()
        log(f"[OK] {name}: {time.time()-t0:.1f}s")
        return compiled
    except Exception as e:
        log(f"[FAIL] {name} after {time.time()-t0:.1f}s: {str(e)[:300]}")
        log(traceback.format_exc()[-1500:])
        return None


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
    log(f"setup: {time.time()-t0:.1f}s, levels={h32.n_levels}, "
        f"sizes={[lv.a.n_blocks for lv in h32.levels]}")

    thr = 1 << 22
    kw = dict(n_pre=3, n_post=3, alpha=2.0 / 3.0, use_pallas=thr)
    r = b_ff.hi
    n1 = h32.levels[1].a.n_blocks
    bs1 = h32.levels[1].a.block_size
    rhs1 = jnp.zeros((bs1, n1), jnp.float32)
    n2 = h32.levels[2].a.n_blocks
    rhs2 = jnp.zeros((h32.levels[2].a.block_size, n2), jnp.float32)

    # 1. level-1 split pre program (Pallas smoother at 1.26e7 blocks)
    try_compile(
        "level1_pre", _level_pre_program, h32, rhs1, rhs1,
        k=1, zero_init=True, n_pre=3, alpha=2.0 / 3.0, use_pallas=thr,
    )
    # 2. level-1 split post program
    try_compile(
        "level1_post", _level_post_program, h32, rhs1, rhs2, rhs1,
        k=1, emit_norm=False, n_post=3, alpha=2.0 / 3.0, use_pallas=thr,
    )
    # 3. level-0 post program with the fused residual norm
    try_compile(
        "level0_post_norm", _level_post_program, h32, r, rhs1, r,
        k=0, emit_norm=True, n_post=3, alpha=2.0 / 3.0, use_pallas=thr,
    )
    # 4. the fused tail from level 2 (3.1e6 blocks, NO Pallas under thr)
    h_tail2 = _tail_hierarchy(h32, 2)
    try_compile("tail_from_2", _tail_cycle_program, h_tail2, rhs2, **kw)
    # 5. the coarse cyclic-reduction solve alone (12288 blocks) — root-cause
    nc = h32.levels[-1].a.n_blocks * h32.levels[-1].a.block_size
    vc = jnp.zeros((nc,), jnp.float32)
    try_compile("coarse_apply", jax.jit(coarse_solve), h32.coarse, vc)
    # 6. tail from level 1 WITHOUT Pallas — separates Pallas vs module size
    h_tail1 = _tail_hierarchy(h32, 1)
    kw_np = dict(kw, use_pallas=False)
    try_compile("tail_from_1_nopallas", _tail_cycle_program, h_tail1, rhs1, **kw_np)
    log("done")


if __name__ == "__main__":
    main()
