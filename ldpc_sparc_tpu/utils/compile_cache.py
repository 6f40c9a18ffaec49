"""Persistent XLA compilation cache setup.

First compiles over the TPU tunnel cost tens of seconds per program; the
persistent cache makes every CLI invocation / example / benchmark after
the first reuse them (jax_compilation_cache_dir). One helper so the CLI,
the examples, and the benchmark scripts all share one cache location.
"""

from __future__ import annotations

import os


def enable_persistent_cache(root: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at <repo>/.jax_cache/<backend>
    (or `root` if given). Safe to call multiple times; returns the cache
    directory, or None if the backend/config rejected it."""
    import jax
    if root is None:
        root = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    try:
        path = os.path.join(root, jax.default_backend())
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except (AttributeError, ValueError, RuntimeError) as e:
        # config rejected (old jax / unknown option): visible, not silent
        import warnings
        warnings.warn(f"persistent compile cache disabled: {e!r}")
        return None
