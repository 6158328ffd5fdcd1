"""Persistent XLA compilation cache setup.

Remote-TPU compiles take 30-160s per process; the persistent cache cuts
a cold CLI run's first batch to a few seconds of deserialization.  The
cache is keyed by HLO, so it is safe across processes and sessions.

Disable with ``BARBELL_JAX_CACHE=0``; an explicit
``JAX_COMPILATION_CACHE_DIR`` wins over the default location.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    if os.environ.get("BARBELL_JAX_CACHE", "1") in ("", "0"):
        return
    try:
        import jax
    except Exception:  # pragma: no cover - jax-less oracle use
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it via env
    path = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "barbell_tpu",
        "jax",
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a requirement
