"""Persistent XLA compile cache, repo-local and gitignored.

The analogue of the reference's shader binary cache (ShaderManager disk
cache + metadata, ShaderManager.cpp:410-416): compiled pipeline programs
persist across processes so reconstructs are near-free. Measured on the
axon TPU (round 5): a cached compile drops 2.2 s -> 0.3 s on a toy program,
and full-frame pipeline compiles (20 s - 4 min each through the
remote-compile relay, DEVNOTES) become near-free on repeat — which is what
lets the whole BASELINE table + per-pass timings fit the bench driver's
900 s budget.

Disable with ARKTPU_COMPILE_CACHE=0; point elsewhere with
ARKTPU_COMPILE_CACHE=<dir>. Must be called before the first compile.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Enable the persistent cache; returns the cache dir (None if off)."""
    d = os.environ.get("ARKTPU_COMPILE_CACHE")
    if d is None:
        # <repo>/.jax_cache — two levels up from arkoserenderer_tpu/utils/.
        d = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    if d in ("", "0"):
        return None
    try:
        import jax

        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return d
    except Exception as e:  # an optimization, never a hard failure
        print(f"# compile cache disabled: {e}", flush=True)
        return None
