"""Native C++ scheduler == Python KvPool/engine bookkeeping."""
import shutil

import numpy as np
import pytest

if shutil.which("g++") is None:  # pragma: no cover
    pytest.skip("no C++ toolchain", allow_module_level=True)

from atom_tpu.native import NativeScheduler
from atom_tpu.serving.kvpool import KvPool, SeqKvCache, batch_page_table


def test_native_matches_python_bookkeeping():
    rng = np.random.Generator(np.random.PCG64(0))
    B, PAGES, S, MP = 4, 40, 128, 8
    nat = NativeScheduler(B, PAGES, S, MP)
    pool = KvPool(2, PAGES, 2, S, 128)

    # admit 4 requests
    reqs = [(i, int(rng.integers(10, 300)), int(rng.integers(3, 20))) for i in range(4)]
    py_seqs = {}
    for rid, p, o in reqs:
        slot = nat.admit(rid, p, o)
        assert slot >= 0
        py_seqs[slot] = [SeqKvCache(pool, p), o, rid]
        assert nat.seqlen(slot) == p
        # prefill row matches (same free-stack discipline)
        row = nat.table_row(slot)
        want = np.zeros((MP,), np.int32)
        want[: len(py_seqs[slot][0].page_ids)] = py_seqs[slot][0].page_ids
        np.testing.assert_array_equal(row, want)

    assert nat.num_free_pages == pool.num_free_pages

    # run decode steps until everything retires, comparing each step
    finished_py = set()
    finished_nat = set()
    for _ in range(64):
        if nat.num_active == 0:
            break
        # python side
        for slot, entry in list(py_seqs.items()):
            entry[0].acquire_one()
        table_py, lens_py = batch_page_table(
            [py_seqs[s][0] if s in py_seqs else None for s in range(B)], MP
        )
        table, lens, done = nat.decode_step()
        np.testing.assert_array_equal(table, table_py)
        np.testing.assert_array_equal(lens, lens_py)
        # python retire
        for slot, entry in list(py_seqs.items()):
            entry[1] -= 1
            if entry[1] <= 0:
                finished_py.add(entry[2])
                entry[0].release()
                del py_seqs[slot]
        finished_nat.update(done)
        assert finished_nat == finished_py
        assert nat.num_free_pages == pool.num_free_pages
    assert nat.num_active == 0 and not py_seqs
    assert nat.num_free_pages == PAGES - 1


def test_native_rejects_overflow():
    nat = NativeScheduler(2, 6, 128, 8)  # 5 usable pages
    assert nat.admit(0, 300, 5) >= 0   # takes 3 pages
    assert nat.admit(1, 300, 5) == -2  # needs 3, only 2 free
    assert nat.admit(1, 50, 5) >= 0    # 1 page fits
    assert nat.admit(2, 50, 5) == -1   # no slot left


def test_native_rejects_unservable_request():
    """prompt+output needing more than max_pages_per_seq pages -> -3 (the
    table-row buffers are sized to max_pages_per_seq; admitting would
    overflow them mid-generation)."""
    nat = NativeScheduler(2, 40, 128, 4)  # max 4*128 = 512 tokens/seq
    assert nat.admit(0, 500, 100) == -3          # 600 tokens > 512
    assert nat.admit(1, 400, 100) >= 0           # 500 tokens fits
    # pool has plenty of pages, so only the bound rejects
    assert nat.admit(2, 513, 1) == -3
