"""Runtime/session helpers: compilation cache, device info, profiling hooks.

The TPU in this environment compiles remotely (slow first compile, ~200s for
the ResNet-50 backward alone), so the persistent compilation cache is
essential: every entry point calls `enable_compilation_cache()` first.
"""

from __future__ import annotations

import contextlib
import functools
import hashlib
import os
import platform
import time

import jax

_DEFAULT_CACHE = os.path.expanduser("~/.cache/jax")


@functools.lru_cache(maxsize=1)
def machine_fingerprint() -> str:
    """Short stable hash of this host's CPU identity (arch + model + ISA
    feature flags).

    XLA:CPU persistent-cache entries embed ahead-of-time code specialised
    to the *compiling* host's CPU features, but JAX's cache key does not
    include them: an entry written on one machine loads on another with
    `cpu_aot_loader` warnings ("+prefer-no-gather is not supported on the
    host machine ... could lead to execution errors such as SIGILL") and
    can silently change numerics.  Keying the cache directory by this
    fingerprint makes foreign-host entries invisible instead of dangerous.
    """
    bits = [platform.machine()]
    try:
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features",
                                    "CPU implementer", "CPU part")):
                    if line not in seen:
                        seen.add(line)
                        bits.append(line.strip())
    except OSError:
        bits.append(platform.processor() or "unknown")
    return hashlib.sha256("\n".join(bits).encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_CACHE)
    # Per-machine subdirectory: see machine_fingerprint() — entries written
    # by a different CPU type must never be loaded here.
    path = os.path.join(path, f"m-{machine_fingerprint()}")
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


def require_backend(timeout_s: float = 180.0):
    """Initialise the JAX backend with a hard timeout.

    The TPU here sits behind a relay whose failure mode is an indefinite
    hang inside PJRT client creation (not an error), which would wedge any
    caller — including unattended benchmark runs.  Backend init runs in a
    daemon thread; on timeout the process exits with a diagnostic instead
    of hanging forever.  Returns jax.devices() on success.
    """
    import sys
    import threading

    out: list = []

    def _init():
        out.append(jax.devices())

    th = threading.Thread(target=_init, daemon=True)
    th.start()
    th.join(timeout_s)
    if not out:
        print(f"FATAL: JAX backend init did not complete within "
              f"{timeout_s:.0f}s — the TPU tunnel is likely down "
              f"(PJRT make_c_api_client hang). Retry later or run with "
              f"jax.config.update('jax_platforms', 'cpu').",
              file=sys.stderr, flush=True)
        os._exit(3)
    return out[0]
