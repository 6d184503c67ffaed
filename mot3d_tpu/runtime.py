"""Runtime/session helpers: compilation cache, device info, profiling hooks.

The TPU in this environment compiles remotely (slow first compile, ~200s for
the ResNet-50 backward alone), so the persistent compilation cache is
essential: every entry point calls `enable_compilation_cache()` first.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

_DEFAULT_CACHE = os.path.expanduser("~/.cache/jax")


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_CACHE)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags


@contextlib.contextmanager
def step_timer(name: str, log_every: int = 1):
    """Wall-clock step timing (the reference only had ad-hoc timers,
    SURVEY.md §5.1)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    print(f"[{name}] {dt * 1e3:.1f} ms", flush=True)


@contextlib.contextmanager
def profile(logdir: str | None):
    """jax.profiler trace wrapper; no-op when logdir is None."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
