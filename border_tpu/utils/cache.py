"""Persistent-compilation-cache setup shared by examples and benchmarks.

On the tunneled TPU, first compiles of big fused programs take minutes;
the persistent cache turns reruns into seconds.  The cache dir is derived
from the REPO CHECKOUT that holds this package (ADVICE r4: examples
previously hardcoded /root/repo, silently no-opping for any other
checkout location), overridable via $BORDER_TPU_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compilation_cache(subdir: str = ".jax_cache") -> str:
    """Point jax's persistent compilation cache at ``<repo>/<subdir>``.

    Returns the cache path.  Call AFTER ``import jax`` and before the
    first compilation.  ``subdir=".jax_cache_cpu"`` keeps CPU-backend
    programs in a separate cache (a CPU run must never poison the TPU
    cache or vice versa — the two backends produce incompatible entries).
    """
    import jax

    root = os.environ.get("BORDER_TPU_CACHE_DIR")
    if root is None:
        # <repo>/border_tpu/utils/cache.py → <repo>
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    path = os.path.join(root, subdir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
