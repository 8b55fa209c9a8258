"""Native (C++) serving runtime: page allocator + FCFS batch scheduler.

Compiled on first use with the system toolchain (``g++ -O2 -shared -fPIC``)
and bound through ctypes — the TPU analog of the reference's C++ host layer
(its CUDA bindings + Python bookkeeping).  The engine uses this when
available and falls back to the pure-Python ``serving.kvpool`` bookkeeping.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "scheduler.cc")
_LIB = os.path.join(_HERE, "libatomserve.so")

_lib = None


def _build() -> str:
    if (not os.path.exists(_LIB)) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
        )
    return _LIB


def load_native():
    """ctypes handle to the native runtime (builds it on first use)."""
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build())
    i32 = ctypes.c_int32
    p32 = ctypes.POINTER(ctypes.c_int32)
    lib.atom_sched_create.restype = ctypes.c_void_p
    lib.atom_sched_create.argtypes = [i32, i32, i32, i32]
    lib.atom_sched_destroy.argtypes = [ctypes.c_void_p]
    lib.atom_sched_free_pages.restype = i32
    lib.atom_sched_free_pages.argtypes = [ctypes.c_void_p]
    lib.atom_sched_admit.restype = i32
    lib.atom_sched_admit.argtypes = [ctypes.c_void_p, i32, i32, i32]
    lib.atom_sched_admit_hold.restype = i32
    lib.atom_sched_admit_hold.argtypes = [ctypes.c_void_p, i32, i32, i32]
    lib.atom_sched_activate.argtypes = [ctypes.c_void_p, i32, i32]
    lib.atom_sched_release.argtypes = [ctypes.c_void_p, i32]
    lib.atom_sched_table_row.argtypes = [ctypes.c_void_p, i32, p32]
    lib.atom_sched_decode_step.restype = i32
    lib.atom_sched_decode_step.argtypes = [ctypes.c_void_p, p32, p32, p32]
    lib.atom_sched_active.restype = i32
    lib.atom_sched_active.argtypes = [ctypes.c_void_p]
    lib.atom_sched_seqlen.restype = i32
    lib.atom_sched_seqlen.argtypes = [ctypes.c_void_p, i32]
    _lib = lib
    return lib


class NativeScheduler:
    """Python facade over the C++ scheduler (zero-copy numpy buffers)."""

    def __init__(
        self, batch_size: int, n_pages: int, page_size: int, max_pages: int
    ):
        self._lib = load_native()
        self._h = self._lib.atom_sched_create(
            batch_size, n_pages, page_size, max_pages
        )
        self.batch_size = batch_size
        self.max_pages = max_pages
        # step-path buffers, reused every call
        self._table = np.zeros((batch_size, max_pages), np.int32)
        self._lens = np.zeros((batch_size,), np.int32)
        self._finished = np.zeros((batch_size,), np.int32)
        self._row = np.zeros((max_pages,), np.int32)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.atom_sched_destroy(self._h)
            self._h = None

    @property
    def num_free_pages(self) -> int:
        return self._lib.atom_sched_free_pages(self._h)

    @property
    def num_active(self) -> int:
        return self._lib.atom_sched_active(self._h)

    def admit(self, request_id: int, prompt_len: int, output_len: int) -> int:
        """Returns the slot, or -1 (no slot) / -2 (pool exhausted) /
        -3 (prompt+output exceeds max_pages_per_seq — request unservable)."""
        return self._lib.atom_sched_admit(
            self._h, request_id, prompt_len, output_len
        )

    def admit_hold(self, request_id: int, prompt_len: int,
                   output_len: int) -> int:
        """Admit with pages allocated but decoding HELD (chunked prefill
        in flight); activate() starts decode steps for the slot."""
        return self._lib.atom_sched_admit_hold(
            self._h, request_id, prompt_len, output_len
        )

    def activate(self, slot: int, remaining: int) -> None:
        self._lib.atom_sched_activate(self._h, slot, remaining)

    def release(self, slot: int) -> None:
        self._lib.atom_sched_release(self._h, slot)

    def table_row(self, slot: int) -> np.ndarray:
        self._lib.atom_sched_table_row(
            self._h, slot, self._row.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        return self._row

    def seqlen(self, slot: int) -> int:
        return self._lib.atom_sched_seqlen(self._h, slot)

    def decode_step(self) -> Tuple[np.ndarray, np.ndarray, List[int]]:
        """(page_table [B, MP], seq_lens [B], finished request ids)."""
        p32 = ctypes.POINTER(ctypes.c_int32)
        n = self._lib.atom_sched_decode_step(
            self._h,
            self._table.ctypes.data_as(p32),
            self._lens.ctypes.data_as(p32),
            self._finished.ctypes.data_as(p32),
        )
        if n == -2:
            raise RuntimeError("KV pool exhausted during decode step")
        if n == -3:
            raise RuntimeError(
                "sequence outgrew max_pages_per_seq during decode step"
            )
        return self._table, self._lens, self._finished[:n].tolist()
