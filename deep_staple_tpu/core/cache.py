"""Persistent XLA compile cache for the CLI entry points.

TPU compiles of the full fused train step take minutes (remote compile over
the accelerator tunnel); XLA's persistent compilation cache makes every
invocation after the first start in seconds. The reference has no analogue
(torch eager mode compiles nothing); for this framework the cache is part of
the production surface: `main`, `pipeline`, `serve` and `consensus` all
enable it before touching the backend.

Resolution order:
  1. ``JAX_COMPILATION_CACHE_DIR`` env var — honored by JAX itself; we leave
     it alone so deployments can point every job at a shared cache.
  2. the repo-local ``.jax_cache`` next to ``bench.py`` when the source tree
     is writable — ONE cache shared by the CLIs, bench and the probes, so a
     step compiled by any of them is warm for all.
  3. ``$XDG_CACHE_HOME/deep_staple_tpu/jax_cache`` (or
     ``~/.cache/deep_staple_tpu/jax_cache``) otherwise (installed package on
     a read-only tree).
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_persistent_compile_cache(min_compile_secs: float = 10.0) -> str | None:
    """Enable XLA's persistent compilation cache; returns the directory used.

    Safe to call multiple times and before/after backend init; failures
    (read-only filesystem, old jax) degrade to a no-op rather than break the
    entry point.
    """
    try:
        # Every CLI entry point passes through here before touching the
        # backend — the right moment to repair a stale JAX_PLATFORMS left by
        # a box re-image (core/platform.py). No-op on cpu and memoized.
        from .platform import normalize_jax_platforms

        normalize_jax_platforms()
    except Exception:
        pass
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    repo_local = Path(__file__).resolve().parents[2] / ".jax_cache"
    base = os.environ.get("XDG_CACHE_HOME") or str(Path.home() / ".cache")
    xdg = Path(base) / "deep_staple_tpu" / "jax_cache"
    for cache_dir in (repo_local, xdg):
        try:
            cache_dir.mkdir(parents=True, exist_ok=True)
            import jax

            jax.config.update("jax_compilation_cache_dir", str(cache_dir))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", min_compile_secs
            )
            return str(cache_dir)
        except Exception:
            continue
    return None
