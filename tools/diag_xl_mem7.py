"""Stage-7: stepped memory accounting of the PROGRESSIVE cycle at 1e8 DoF
(from x = 0, no guarded phase): which ff program blows HBM?"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from agglomerationmultigrid1d_tpu.models.solvers import (
    _ff_add_program,
    _ff_level_correct_program,
    _ff_level_postsmooth_program,
    _ff_level_pre_program,
    _ff_rel_defect,
    _ff_tail_cycle_program,
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
    live = sum(x.nbytes for x in jax.live_arrays()) / 1e9
    log(f"[MEM] {tag}: live_logical={live:.2f}GB")


def main():
    n_el = int(sys.argv[1]) if len(sys.argv) > 1 else 3 << 24
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
    a_ffs = ffops.a_ffs
    jax.block_until_ready(h32.levels[0].a)
    log(f"setup: {time.time()-t0:.1f}s")
    mem("built")

    thr = 1 << 22
    kwp = dict(n_pre=3, alpha=2.0 / 3.0, use_pallas=thr)
    kws = dict(n_post=3, alpha=2.0 / 3.0, use_pallas=thr)
    zero = jnp.zeros_like(b_ff.hi)
    x_ff = FF(zero, zero)
    inv_nb = jnp.asarray(1.0 / norm_b, jnp.float32)

    t0 = time.time()
    r_ff, rel = _ff_rel_defect(a_ffs[0], x_ff, b_ff, inv_nb)
    jax.block_until_ready(r_ff.hi)
    log(f"ff defect: {time.time()-t0:.1f}s rel={float(rel):.3e}")
    mem("after ff defect")

    u0, rhs1 = _ff_level_pre_program(h32, a_ffs[0], r_ff, r_ff, k=0, zero_init=True, **kwp)
    jax.block_until_ready(u0.hi)
    mem("after ff L0 pre")
    u1, rhs2 = _ff_level_pre_program(h32, a_ffs[1], rhs1, rhs1, k=1, zero_init=True, **kwp)
    jax.block_until_ready(u1.hi)
    mem("after ff L1 pre")
    uc = _ff_tail_cycle_program(
        _tail_hierarchy(h32, 2), a_ffs[2:], rhs2, n_pre=3, **kws
    )
    jax.block_until_ready(uc.hi)
    mem("after ff tail")
    u1 = _ff_level_correct_program(h32, u1, uc, k=1)
    u1 = _ff_level_postsmooth_program(h32, a_ffs[1], u1, rhs1, k=1, **kws)
    jax.block_until_ready(u1.hi)
    mem("after ff L1 post")
    u0 = _ff_level_correct_program(h32, u0, u1, k=0)
    jax.block_until_ready(u0.hi)
    mem("after ff L0 correct")
    u0 = _ff_level_postsmooth_program(h32, a_ffs[0], u0, r_ff, k=0, **kws)
    jax.block_until_ready(u0.hi)
    mem("after ff L0 post")
    x_ff = _ff_add_program(x_ff, u0)
    _, rel = _ff_rel_defect(a_ffs[0], x_ff, b_ff, inv_nb)
    log(f"after 1 progressive cycle: rel={float(rel):.3e}")
    mem("cycle done")
    log("done")


if __name__ == "__main__":
    main()
