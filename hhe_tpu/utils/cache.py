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
    _force_cache_on_axon()


def _force_cache_on_axon() -> None:
    """Force the persistent cache on for the axon TPU backend.

    jax's ``compilation_cache.is_cache_used`` gates the cache behind a
    platform allowlist ["tpu", "gpu", "cpu", "neuron"]; the tunneled TPU
    backend reports platform "axon" and was therefore silently paying a
    full remote compile of every graph in every process (~400 s of bench
    setup, measured tools/probe_setup.py round 4).  The executable
    (de)serialization the cache needs is a PJRT-level capability the
    axon plugin provides; both jax cache paths (_cache_read/_cache_write)
    wrap errors and degrade to a plain compile, so force-marking the
    cache usable is safe even if a serialize call fails."""
    try:
        from jax._src import compilation_cache as cc

        if not cc._is_cache_enabled():
            return
        with cc._cache_initialized_mutex:
            cc._cache_checked = True
            cc._cache_used = True
    except Exception as e:  # pragma: no cover — best-effort, never fatal
        # LOUD degradation (advisor round-4): a jax upgrade renaming these
        # private attrs would silently reintroduce ~400 s of remote compile
        # per process; tests/test_utils.py asserts the attrs exist.
        import warnings

        warnings.warn(
            f"hhe_tpu.utils.cache: could not force the persistent compile "
            f"cache on the axon backend ({type(e).__name__}: {e}); expect "
            f"full remote compiles (~minutes per graph)."
        )
