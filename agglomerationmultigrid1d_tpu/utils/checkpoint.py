"""Solver-state checkpointing.

The reference has no checkpoint facility (SURVEY §5); multigrid state is one
vector plus the iteration counter, so we persist exactly that (plus histories)
to an ``.npz``.  Restarting continues the outer iteration bit-for-bit because
the hierarchy setup is deterministic.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def save_solver_state(path: str, x, iteration: int, res_history=None, err_history=None):
    np.savez(
        path,
        x=np.asarray(x),
        iteration=int(iteration),
        res_history=np.asarray(res_history) if res_history is not None else np.array([]),
        err_history=np.asarray(err_history) if err_history is not None else np.array([]),
    )


def load_solver_state(path: str):
    data = np.load(path)
    return (
        jnp.asarray(data["x"]),
        int(data["iteration"]),
        jnp.asarray(data["res_history"]),
        jnp.asarray(data["err_history"]),
    )
