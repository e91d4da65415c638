"""Persistent XLA compilation cache setup.

The composed fold program (projection + distance + Pallas linkage +
multi-cut scoring + wMetaC) takes minutes to compile cold on TPU; the
persistent cache makes that a one-time cost per shape class.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "sharp_tpu", "xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
