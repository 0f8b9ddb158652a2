"""Process-level runtime knobs: the persistent compilation cache.

First compiles of the render/backward kernels cost tens of seconds on TPU
(XLA + Mosaic); the persistent cache makes every later process start warm.
Opt-in per process (library code must not write to disk behind the
caller's back): call :func:`enable_persistent_cache` early, or use the
CLI's ``--compile-cache`` flag. The cache key covers the jaxpr, the
compile options, and the runtime version — stale entries are never reused.
"""

from __future__ import annotations

import os
from pathlib import Path

DEFAULT_CACHE_DIR = os.environ.get(
    "RM_TPU_COMPILE_CACHE",
    str(Path.home() / ".cache" / "ray_marching_tpu" / "jax_cache"),
)


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing) and return the directory used.

    ``min_compile_secs`` skips caching trivial compiles; the big render /
    fused-backward programs (30-70 s first compile through a TPU tunnel)
    all clear it.
    """
    import jax

    path = path or DEFAULT_CACHE_DIR
    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return str(path)
