"""Persistent XLA compilation cache (VERDICT r4 #9: compile+burst <= 150s).

The 7B/32L serving program costs ~245s to compile on this host; with the
persistent cache a repeat run loads the executable in <1s (measured on the
axon TPU client: 2.04s -> 0.05s on a probe program).  The cache key hashes
the HLO + compile options + jaxlib version, so code changes invalidate
entries naturally; env-var A/Bs (ATOM_TPU_NO_RP etc.) change the traced HLO
and therefore key separately.

Call ``enable()`` before building any jitted program.  Default location
survives across bench runs within a machine lifetime; override with
``ATOM_TPU_CACHE_DIR`` (or disable with ``ATOM_TPU_CACHE_DIR=off``).
"""
from __future__ import annotations

import os

DEFAULT_DIR = "/root/jax_cache"


def enable(path: str | None = None) -> str | None:
    path = path or os.environ.get("ATOM_TPU_CACHE_DIR", DEFAULT_DIR)
    if path == "off":
        return None
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # old jaxlib or read-only fs: cache is an optimization
        return None
    return path
