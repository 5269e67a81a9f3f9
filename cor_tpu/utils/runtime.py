"""Process-level JAX runtime setup shared by the CLI entry points."""

from __future__ import annotations


def enable_compile_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Persistent XLA compilation cache.

    Full-model compiles take minutes over a remote-compile relay; caching
    makes repeat runs (resume, eval after train, repeated benchmarks)
    near-instant. Safe no-op if the config knobs are unavailable.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
