"""Persistent XLA compilation cache setup.

The production keystream graph cold-compiles in minutes (remote compile over
the axon tunnel); every entry point (bench, tools, tests) shares one on-disk
cache at ``<repo>/.jax_cache`` so only changed HLO recompiles.  Call
``enable()`` BEFORE the first jit compilation.  Set ``HHE_NO_CACHE=1`` to
disable (e.g. to measure cold-compile time itself).
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    if os.environ.get("HHE_NO_CACHE"):
        return
    import jax

    if cache_dir is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.path.join(repo, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
