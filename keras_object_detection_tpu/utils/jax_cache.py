"""Persistent XLA compilation cache setup.

The flagship train step takes ~18 minutes to compile through this
environment's remote-compile tunnel; the persistent cache turns subsequent
process startups into millisecond cache hits. Called by bench.py, the CLIs,
and __graft_entry__ (not by package import — libraries shouldn't mutate
global config implicitly).
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags — harmless
