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


_TPU_LOCK_FD = None  # keep the fd alive for the process lifetime


def acquire_tpu_lock(timeout_s: float | None = None) -> bool:
    """Serialize TPU processes on this host via a lifetime flock.

    There is ONE tunneled TPU chip; two concurrent processes corrupt each
    other's measurements (and jax.profiler traces capture device-wide
    activity, so even "successful" overlapping runs produce garbage
    profiles). Every TPU entry point (bench.py, tools/profile_map, the
    splatam CLI) calls this before touching the backend. No-op when JAX
    resolves to CPU. The lock auto-releases when the process exits (flock
    semantics), so stale locks cannot happen.

    Blocks up to `timeout_s` (default $ISOGS_TPU_LOCK_TIMEOUT or 3600 s),
    then proceeds WITH A LOUD WARNING rather than dying — the driver's
    round-end bench must never be wedged forever by a hung run. Returns
    True if the lock was actually acquired.
    """
    global _TPU_LOCK_FD
    if _TPU_LOCK_FD is not None:
        return True
    plats = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in plats:
        return True  # explicit CPU run — nothing to serialize
    import fcntl
    import time
    if timeout_s is None:
        timeout_s = float(os.environ.get("ISOGS_TPU_LOCK_TIMEOUT", 3600))
    fd = open("/tmp/isogs_tpu.lock", "a+")
    t0 = time.monotonic()
    warned = False
    while True:
        try:
            fcntl.flock(fd.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
            _TPU_LOCK_FD = fd
            return True
        except OSError:
            if time.monotonic() - t0 > timeout_s:
                print("[tpu-lock] WARNING: another TPU process still holds "
                      "/tmp/isogs_tpu.lock after "
                      f"{timeout_s:.0f}s — proceeding UNSERIALIZED; "
                      "results may be corrupted", flush=True)
                fd.close()
                return False
            if not warned:
                print("[tpu-lock] waiting for another TPU process to "
                      "finish (/tmp/isogs_tpu.lock)...", flush=True)
                warned = True
            time.sleep(5.0)


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
