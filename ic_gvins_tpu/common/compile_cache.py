"""Persistent XLA compilation cache (repo-local).

The engine compiles a few dozen programs on first run (~20-40 s each on a
tunneled TPU); the persistent cache makes every later process start warm —
long-run restarts, checkpoint resumes, the driver's bench, CI. Keyed by
backend + flags, so CPU test runs and TPU runs coexist in one directory.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None, tag: str = "cpu") -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``<repo>/.jax_cache/<tag>`` or ``$IC_GVINS_CACHE/<tag>``). Safe to
    call more than once; returns the directory used.

    ``tag`` partitions the cache by process flavor: XLA:CPU AOT artifacts
    bake in target "features" that differ between a pure-CPU process and
    one with the TPU plugin initialized (the plugin adds
    ``+prefer-no-gather/scatter``); cross-loading triggers the loader's
    machine-mismatch path (warns, can SIGILL — the segfault previous
    rounds observed). One directory per flavor keeps every load exact."""
    import jax

    if os.environ.get("IC_GVINS_NO_CACHE"):
        return ""
    if path is None:
        path = os.path.join(
            os.environ.get(
                "IC_GVINS_CACHE",
                os.path.join(
                    os.path.dirname(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__)))),
                    ".jax_cache",
                ),
            ),
            tag,
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that takes meaningful compile time; tiny programs
    # are cheaper to recompile than to hash+read
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
