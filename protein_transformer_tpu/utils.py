"""Framework utilities: compilation cache, profiling hooks.

TPU (re)compilation of the fused train step is expensive (tens of seconds);
the persistent compilation cache makes every process after the first start
in milliseconds per executable. Enabled by default for all framework entry
points (trainer CLI, bench, predict); JAX_COMPILATION_CACHE_DIR overrides
the location.
"""
from __future__ import annotations

import contextlib
import os

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax
    if jax.default_backend() != "tpu":
        # XLA:CPU AOT artifacts are machine-feature-specific; a cache entry
        # compiled elsewhere can SIGILL. Only TPU executables are portable
        # enough to cache here.
        _CACHE_ENABLED = True
        return
    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/ptt_jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _CACHE_ENABLED = True


@contextlib.contextmanager
def maybe_profile(profile_dir: str | None):
    """jax.profiler trace capture when a directory is configured
    (the reference has only throughput counters, SURVEY 5.1)."""
    if not profile_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
