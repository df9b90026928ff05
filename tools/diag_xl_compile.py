"""Diagnose the XL-scale remote-compile ceiling (VERDICT r4 items 1-2).

Reproduces the exact bench_xl_solve configuration (1.006e8 DoF, slim fine
level, PALLAS_MIN_BLOCKS gating) and AOT-compiles each candidate program unit
SEPARATELY, smallest risk first, capturing the full failure text:

  1. _ff_rel_defect        — float-float stencil defect + norm (full size)
  2. fine pre-smooth+restrict (the proposed split's biggest unit)
  3. rest-of-hierarchy V-cycle (levels 1..end, 1/4 of the DoF)
  4. fine prolong + post-smooth
  5. _inner_cycle_step     — the r4-failing full V-cycle unit

Usage:  python tools/diag_xl_compile.py [n_el]   (default 3<<24)
"""

from __future__ import annotations

import functools
import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

import agglomerationmultigrid1d_tpu.models.solvers as solvers
from agglomerationmultigrid1d_tpu.models.hierarchy import Hierarchy
from agglomerationmultigrid1d_tpu.models.solvers import (
    _ff_rel_defect,
    _inner_cycle_step,
    _smooth_n,
    _smooth_n_residual,
    transfer_prolong,
    transfer_restrict,
    _crop_cg,
    _pad_cg,
)
from agglomerationmultigrid1d_tpu.models.stencil_setup import (
    build_xl_problem,
    default_stencil_factor,
)
from agglomerationmultigrid1d_tpu.ops.df64 import FF
from agglomerationmultigrid1d_tpu.utils.config import HierarchySpec


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def try_compile(name, fn, *args, **kw):
    t0 = time.time()
    try:
        lowered = jax.jit(fn, **kw).lower(*args)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_comp = time.time() - t0
        mem = ""
        try:
            ma = compiled.memory_analysis()
            mem = (f" temp={ma.temp_size_in_bytes/1e9:.2f}GB "
                   f"arg={ma.argument_size_in_bytes/1e9:.2f}GB "
                   f"out={ma.output_size_in_bytes/1e9:.2f}GB")
        except Exception:
            pass
        log(f"[OK] {name}: lower {t_lower:.1f}s compile {t_comp:.1f}s{mem}")
        return compiled
    except Exception as e:
        log(f"[FAIL] {name} after {time.time()-t0:.1f}s:")
        log(traceback.format_exc())
        log(f"[FAIL-STR] {name}: {e}")
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
    log(f"n_el={n_el} dof={n_el*(p_fine+1):.4g} n_agg={n_agg} z={z}")
    t0 = time.time()
    h32, a_ff, b_ff, norm_b = build_xl_problem(spec, n_el, z=z, slim_fine=True)
    jax.block_until_ready(h32.levels[0].a)
    log(f"setup: {time.time()-t0:.1f}s, levels={h32.n_levels}")

    solvers.PALLAS_MIN_BLOCKS = 1 << 22
    kw = dict(n_pre=3, n_post=3, alpha=2.0 / 3.0, use_pallas=True)
    x_ff = FF(jnp.zeros_like(b_ff.hi), jnp.zeros_like(b_ff.hi))
    inv_nb = jnp.asarray(1.0 / norm_b, jnp.float32)
    r = b_ff.hi

    # 1. float-float defect + norm at full size
    try_compile("ff_rel_defect", _ff_rel_defect, a_ff, x_ff, b_ff, inv_nb)

    # 2. fine pre-smooth + restrict
    fine = h32.levels[0]
    t0f = h32.transfers[0]
    lvl1 = h32.levels[1]

    def fine_pre(h, u0, rhs0):
        lv, tr, lc = h.levels[0], h.transfers[0], h.levels[1]
        u0, r0 = _smooth_n_residual(lv, u0, rhs0, 3, 2.0 / 3.0, True)
        return u0, _pad_cg(lc, transfer_restrict(tr, _crop_cg(lv, r0)))

    try_compile("fine_pre_restrict", fine_pre, h32, jnp.zeros_like(r), r)

    # 3. rest-of-hierarchy V-cycle (levels 1..end)
    h_rest = Hierarchy(levels=h32.levels[1:], transfers=h32.transfers[1:], coarse=h32.coarse)
    n1 = lvl1.a.n_blocks
    bs1 = lvl1.a.block_size
    rhs1 = jnp.zeros((bs1, n1), jnp.float32)

    def rest_cycle(h, rhs):
        return solvers.v_cycle(h, jnp.zeros_like(rhs), rhs, **kw)

    try_compile("rest_v_cycle", rest_cycle, h_rest, rhs1)

    # 4. fine prolong + post-smooth
    def fine_post(h, u0, u1, rhs0):
        lv, tr, lc = h.levels[0], h.transfers[0], h.levels[1]
        u0 = u0 + _pad_cg(lv, transfer_prolong(tr, _crop_cg(lc, u1)))
        return _smooth_n(lv, u0, rhs0, 3, 2.0 / 3.0, True)

    try_compile("fine_post", fine_post, h32, jnp.zeros_like(r), rhs1, r)

    # 5. the r4-failing full unit
    try_compile(
        "inner_cycle_step(full)",
        functools.partial(_inner_cycle_step, **kw),
        h32, jnp.zeros_like(r), r,
    )
    log("done")


if __name__ == "__main__":
    main()
