"""Persistent XLA compilation cache for the framework's entry points.

The tunneled axon TPU compiles the full pipeline in 45-105 s; JAX's
persistent compilation cache (`jax_compilation_cache_dir`) serializes the
compiled executables to disk and cuts a fresh process's first call to ~6 s
(measured 2026-08-18, config0 `segment_image`: 104.6 s -> 6.2 s cold
start). The CLI, `bench.py`, and the eval harness enable it; the library
itself never mutates global jax config on import.

Environment:
  GCIS_COMPILE_CACHE=0       disable
  GCIS_COMPILE_CACHE=<path>  override the cache directory
  (default: ~/.cache/gabor_color_image_segmentation_tpu/xla)
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache() -> Optional[str]:
    """Point jax at the persistent executable cache; returns the dir used
    (None when disabled via GCIS_COMPILE_CACHE=0 or an unwritable path)."""
    env = os.environ.get("GCIS_COMPILE_CACHE", "")
    if env == "0":
        return None
    path = env or os.path.join(
        os.path.expanduser("~"),
        ".cache",
        "gabor_color_image_segmentation_tpu",
        "xla",
    )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # only persist compilations that actually cost something
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
