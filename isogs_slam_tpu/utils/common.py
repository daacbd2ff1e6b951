"""Seeding and small host utilities (utils/common_utils.py analog)."""
from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 42):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    print(f"Seed set to: {seed}")


def params2cpu(params: dict) -> dict:
    return {k: np.asarray(v) for k, v in params.items()}


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache — compiles of the big SLAM programs
    are expensive (and highly variable through the remote-compile tunnel);
    cached executables make every later process start fast. Called by all
    CLI entry points; override the location with $JAX_COMPILATION_CACHE_DIR
    or disable with ISOGS_NO_COMP_CACHE=1."""
    if os.environ.get("ISOGS_NO_COMP_CACHE") == "1":
        return
    import jax
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/isogs_jax_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # older jax without the knob
        print(f"[cache] compilation cache unavailable: {e}")
