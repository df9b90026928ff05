"""Host-side setup execution.

Hierarchy construction is thousands of tiny eager array ops; dispatching those
to a (possibly remote) TPU one by one is pathologically slow and pays a
compilation round-trip per op.  All setup therefore runs on the JAX CPU backend
and only the finished operator pytrees are transferred to the accelerator —
mirroring how the reference does all assembly in plain serial Julia before the
solve.
"""

from __future__ import annotations

import contextlib
import functools

import jax


def cpu_device():
    return jax.local_devices(backend="cpu")[0]


@contextlib.contextmanager
def on_host():
    """Run eager jnp ops on the CPU backend inside this context."""
    with jax.default_device(cpu_device()):
        yield


def to_accelerator(tree, device=None):
    """Move an array pytree to the default accelerator (no-op on CPU-only)."""
    if device is None:
        device = jax.devices()[0]
    return jax.device_put(tree, device)


def host_setup(fn):
    """Decorator: run ``fn`` on the CPU backend (results stay on CPU; move what
    you need with :func:`to_accelerator`)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with on_host():
            return fn(*args, **kwargs)

    return wrapper


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache.

    Hierarchy setup triggers ~100 small CPU compiles and the fused solver
    programs cost 60-90 s of TPU compilation through the remote toolchain; the
    persistent cache amortizes both across processes.  Call once at program
    start (bench.py and the driver entry points do)."""
    import os

    if path is None:
        path = os.environ.get(
            "AGGMG_COMPILE_CACHE", os.path.expanduser("~/.cache/aggmg_jax_cache")
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
