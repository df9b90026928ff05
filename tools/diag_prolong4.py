"""Probe XLA prolong-interleave formulations at north-star size (5e7 fine
columns) against the remote TPU compiler.  No problem build needed — random
operands of the exact shapes bp_prolong sees at 1.006e8 DoF."""

import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def try_compile(name, fn, *args):
    t0 = time.time()
    try:
        jax.jit(fn).lower(*args).compile()
        log(f"[OK] {name}: {time.time()-t0:.1f}s")
        return True
    except Exception as e:
        log(f"[FAIL] {name} after {time.time()-t0:.1f}s: {str(e)[:200]}")
        log(traceback.format_exc()[-800:])
        return False


def main():
    n_c = int(sys.argv[1]) if len(sys.argv) > 1 else 12582912  # 1.26e7
    r, bs_f, bs_c = 4, 2, 2
    blocks = jnp.zeros((r, bs_f, bs_c, n_c), jnp.float32)
    xc = jnp.zeros((bs_c, n_c), jnp.float32)
    u = jnp.zeros((bs_f, r * n_c), jnp.float32)

    def v_pad(blocks, xc, u):  # current bp_prolong (interior-dilated pads)
        zero = jnp.zeros((), xc.dtype)
        out = None
        for j in range(r):
            oj = jnp.einsum("ibn,bn->in", blocks[j], xc)
            pj = jax.lax.pad(oj, zero, [(0, 0, 0), (j, r - 1 - j, r - 1)])
            out = pj if out is None else out + pj
        return u + out

    def v_transpose(blocks, xc, u):  # stack -> transpose -> reshape
        t = jnp.einsum("jibn,bn->jin", blocks, xc)  # (r, bs_f, n_c)
        return u + t.transpose(1, 2, 0).reshape(bs_f, r * n_c)

    def v_pad_barrier(blocks, xc, u):  # pads fenced from each other
        zero = jnp.zeros((), xc.dtype)
        out = u
        for j in range(r):
            oj = jnp.einsum("ibn,bn->in", blocks[j], xc)
            pj = jax.lax.pad(oj, zero, [(0, 0, 0), (j, r - 1 - j, r - 1)])
            (pj,) = jax.lax.optimization_barrier((pj,))
            out = out + pj
        return out

    def v_dus(blocks, xc, u):  # scatter via strided dynamic_update_slice? no —
        # single-shot: build (bs_f, n_c, r) then reshape (the layout XLA pads)
        t = jnp.einsum("jibn,bn->inj", blocks, xc)
        return u + t.reshape(bs_f, r * n_c)

    del v_pad  # known: SIGKILLs the helper after ~470 s (diag_xl_compile3)
    try_compile("transpose+reshape", v_transpose, blocks, xc, u)
    try_compile("pad+barrier", v_pad_barrier, blocks, xc, u)
    try_compile("inj-einsum+reshape", v_dus, blocks, xc, u)
    log("done")


if __name__ == "__main__":
    main()
