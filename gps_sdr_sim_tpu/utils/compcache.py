"""Persistent XLA compilation cache.

TPU (Mosaic) kernel compiles are expensive — O(minutes) through a remote
compile service — while every program in this framework is shape-stable
across runs (epoch batches are padded to fixed sizes precisely so the
compile count is O(1) per configuration). Caching compiled executables on
disk makes every run after the first start instantly.

Enabled by the CLI, bench harness, and driver entry points; opt out with
GPS_SDR_SIM_TPU_NO_CACHE=1 or redirect with GPS_SDR_SIM_TPU_CACHE_DIR.
"""

from __future__ import annotations

import os
import pathlib

_DEFAULT = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
_done = False


def enable():
    global _done
    if _done or os.environ.get("GPS_SDR_SIM_TPU_NO_CACHE") == "1":
        return
    _done = True
    import jax

    path = os.environ.get("GPS_SDR_SIM_TPU_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
