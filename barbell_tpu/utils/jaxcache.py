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
        # The cache key hashes the lowered module INCLUDING the MLIR
        # location tracebacks, which embed the CALLER's file:line — so
        # any new entry script (or an edit shifting line numbers in the
        # call chain) silently forced a full remote recompile
        # (~5-6 min) despite a warm cache.  Dropping tracebacks from
        # locations makes the key depend only on the computation.
        # Set BARBELL_JAX_DEBUG_LOCS=1 to keep full locations when
        # debugging compiler errors.
        if os.environ.get("BARBELL_JAX_DEBUG_LOCS", "") in ("", "0"):
            jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:
        pass  # cache is an optimization, never a requirement
