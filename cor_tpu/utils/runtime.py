"""Process-level JAX runtime setup shared by the CLI entry points."""

from __future__ import annotations

import os
from pathlib import Path


def default_cache_dir() -> str:
    """JAX_COMPILATION_CACHE_DIR if set, else a per-user cache directory
    (XDG_CACHE_HOME-aware) — NOT a hardcoded checkout path, so pip-installed
    console scripts cache correctly on any machine."""
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    base = os.environ.get("XDG_CACHE_HOME") or str(Path.home() / ".cache")
    return str(Path(base) / "cor_tpu" / "jax_cache")


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache.

    Full-model compiles take minutes over a remote-compile relay; caching
    makes repeat runs (resume, eval after train, repeated benchmarks)
    near-instant. Safe no-op if the config knobs are unavailable or the
    directory cannot be created.
    """
    import jax

    try:
        path = path or default_cache_dir()
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
