"""Zero-padded shifts along the trailing (element / node) axis.

These are the only "communication" primitive the whole framework needs on a
single chip: every operator is (block-)tridiagonal, so a matvec touches at most
the +-1 neighbor.  The distributed versions (halo exchange via ``lax.ppermute``)
live in ``parallel.halo`` and share this calling convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def shift(x: jax.Array, d: int) -> jax.Array:
    """``out[..., k] = x[..., k + d]`` with zero fill outside the range.

    ``d = +1`` pulls the right neighbor, ``d = -1`` the left neighbor.
    """
    if d == 0:
        return x
    n = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1)
    if d > 0:
        return jnp.pad(x[..., d:], pad + [(0, d)])
    return jnp.pad(x[..., :n + d], pad + [(-d, 0)])
