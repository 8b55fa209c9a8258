"""Runtime kernel-dispatch flags.

``FORCE_INTERPRET`` routes every Pallas kernel through the interpreter — the
way the full serving path runs on CPU (tests, the virtual multi-chip dry run).
Read at TRACE time; set it before the first jitted call (the test conftest
does).  On TPU it stays False and kernels lower through Mosaic.
"""
from __future__ import annotations

import jax

_FORCE_INTERPRET = False


def set_force_interpret(value: bool) -> None:
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = value


def interpret_default(flag: bool = False) -> bool:
    """True if Pallas kernels must run interpreted (explicit flag, forced
    globally, or no TPU backend present)."""
    if flag or _FORCE_INTERPRET:
        return True
    return jax.default_backend() not in ("tpu", "axon")
