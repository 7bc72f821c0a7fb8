"""Persistent XLA compilation cache setup.

The axon-tunnelled TPU pays minutes of remote compile per executable, so the
persistent cache is the difference between a 2-minute and a 2-second process
start.  This jax build does NOT honor the JAX_COMPILATION_CACHE_DIR
environment variable (config.compilation_cache_dir stays None), so every
entry point must enable the cache programmatically via jax.config.update —
that is what enable_persistent_cache() does.  Call it before the first jit
compilation; calling it again is a no-op.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")

_enabled = False
_applied_dir: str | None = None


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 0.5) -> str:
    """Point jax's persistent compilation cache at cache_dir (default:
    <repo>/.jax_cache).  Returns the directory actually in effect: a second
    call cannot re-point the cache, so it returns (and warns about) the
    directory applied by the first call."""
    global _enabled, _applied_dir
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    if _enabled:
        if _applied_dir is not None and path != _applied_dir:
            import warnings

            warnings.warn(
                "enable_persistent_cache: cache already enabled at "
                f"{_applied_dir!r}; ignoring new request for {path!r}")
        return _applied_dir or path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    _applied_dir = path
    return path
