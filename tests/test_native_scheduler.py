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


def test_engine_native_parity():
    """TextGenEngine(native=True) == TextGenEngine(native=False): identical
    page assignment order means identical tables, hence identical tokens."""
    import jax
    import numpy as np

    from atom_tpu.config import QuantSpec
    from atom_tpu.models.configs import Arch, ModelConfig
    from atom_tpu.serving.engine import TextGenConfig, TextGenEngine
    from atom_tpu.serving.model import (
        init_serving_params, make_mixed_step_fns, make_serving_state,
        make_step_fns,
    )
    from atom_tpu.serving.workload import RequestSet

    cfg = ModelConfig(
        arch=Arch.LLAMA, vocab_size=256, hidden_size=1024,
        intermediate_size=2048, num_layers=2, num_heads=8, num_kv_heads=8,
        head_dim=128,
    )
    spec = QuantSpec(weight_channel_group=1)
    page = 128
    params = init_serving_params(jax.random.PRNGKey(1), cfg, spec)
    rng = np.random.Generator(np.random.PCG64(9))
    prompts = [
        rng.integers(1, cfg.vocab_size, int(rng.integers(40, 300))).astype(np.int32)
        for _ in range(4)
    ]
    rs = RequestSet(
        prompts=prompts,
        prompt_lens=np.asarray([len(p) for p in prompts]),
        output_lens=np.asarray([5, 8, 36, 1]),
    )
    tg = TextGenConfig(batch_size=2, page_size=page, max_seq_len=512,
                       prefill_buckets=(128, 256, 512))
    n_pool = 24

    def run(native, mixed):
        pool = KvPool(cfg.num_layers, n_pool, cfg.num_kv_heads, page, cfg.head_dim)
        state = make_serving_state(
            cfg.num_layers, n_pool, tg.batch_size, cfg.num_kv_heads, page,
            cfg.head_dim,
        )
        if mixed:
            pre, dec, chunk = make_mixed_step_fns(params, cfg, spec)
            eng = TextGenEngine(tg, pool, pre, dec, state, chunk_fn=chunk,
                                native=native)
        else:
            eng = TextGenEngine(tg, pool, *make_step_fns(params, cfg, spec),
                                state, native=native)
        if native:
            assert eng.nat is not None
            res = eng.run(rs, record=True)
            assert eng.nat.num_free_pages == n_pool - 1
            assert eng.nat.num_active == 0
        else:
            res = eng.run(rs, record=True)
            assert pool.num_free_pages == n_pool - 1
        return res

    for mixed in (False, True):
        res_py = run(native=False, mixed=mixed)
        res_nat = run(native=True, mixed=mixed)
        assert res_nat["tokens"] == res_py["tokens"], f"mixed={mixed}"
