#!/usr/bin/env python
"""Measure the engine's per-step host scheduling tax: Python vs native C++.

VERDICT r2 #9: the native scheduler's benefit was asserted, never measured.
This drives the SAME workload through ``TextGenEngine`` twice (native="auto"
vs native=False) at batch 32 with a full-size page pool and reports
``host_sched_ms_per_step`` — admission + page/table assembly + retirement
bookkeeping, excluding jitted dispatch.  A tiny model keeps device time out
of the way; the host tax depends only on batch size / pool geometry.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/measure_host_tax.py
"""
from __future__ import annotations

import jax
import numpy as np


def run(native, batch=32, n_requests=40):
    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.models.configs import Arch, ModelConfig
    from atom_tpu.serving import (
        KvPool, TextGenConfig, TextGenEngine, synth_requests,
    )
    from atom_tpu.serving.model import (
        init_serving_params, make_serving_state, make_step_fns,
    )

    cfg = ModelConfig(
        arch=Arch.LLAMA, vocab_size=512, hidden_size=512,
        intermediate_size=1024, num_layers=2, num_heads=4, num_kv_heads=4,
        head_dim=128,
    )
    spec = ATOM_W4A4
    params = init_serving_params(jax.random.PRNGKey(0), cfg, spec)
    tg = TextGenConfig(batch_size=batch, max_seq_len=2048, page_size=256,
                       prefill_buckets=(128, 256, 512))
    n_pool = batch * tg.max_seq_len // tg.page_size + 16
    pool = KvPool(cfg.num_layers, n_pool, cfg.num_kv_heads, tg.page_size,
                  cfg.head_dim)
    state = make_serving_state(
        cfg.num_layers, n_pool, batch, cfg.num_kv_heads, tg.page_size,
        cfg.head_dim,
    )
    engine = TextGenEngine(tg, pool, *make_step_fns(params, cfg, spec),
                           state, native=native)
    if native and engine.nat is None:
        raise RuntimeError("native scheduler unavailable")
    rs = synth_requests(n_requests, cfg.vocab_size, maxlen=220)
    res = engine.run(rs)
    return res


def micro(batch=32, max_seq_len=2048, page_size=256, iters=2000):
    """Isolated per-step assembly cost (no engine, no device upload):
    python KvPool acquire+batch_page_table vs native decode_step."""
    import time

    from atom_tpu.native import NativeScheduler
    from atom_tpu.serving.kvpool import KvPool, SeqKvCache, batch_page_table

    max_pages = -(-(300 + iters) // page_size) + 1
    n_pool = batch * max_pages + 16

    pool = KvPool(1, n_pool, 1, page_size, 128)
    seqs = [SeqKvCache(pool, 300) for _ in range(batch)]
    t0 = time.perf_counter()
    for _ in range(iters):
        for s in seqs:
            s.acquire_one()
        table, lens = batch_page_table(seqs, max_pages)
    py_ms = (time.perf_counter() - t0) / iters * 1e3
    for s in seqs:
        s.release()

    nat = NativeScheduler(batch, n_pool, page_size, max_pages)
    for i in range(batch):
        slot = nat.admit(i, 300, iters + 10)
        assert slot == i
    t0 = time.perf_counter()
    for _ in range(iters):
        table, lens, fin = nat.decode_step()
    nat_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"micro (bs{batch}, assembly only): python {py_ms:.3f} ms/step, "
          f"native {nat_ms:.3f} ms/step -> {py_ms/max(nat_ms,1e-9):.1f}x less host time")
    return py_ms, nat_ms


def main():
    micro()
    rows = {}
    for mode, native in (("python", False), ("native", "auto")):
        res = run(native)
        rows[mode] = res
        print(f"{mode:7s} ({res['scheduler']}): "
              f"host {res['host_sched_ms_per_step']:.3f} ms/step "
              f"over {res['decode_steps']} steps")
    py = rows["python"]["host_sched_ms_per_step"]
    nat = rows["native"]["host_sched_ms_per_step"]
    print(f"engine (incl. device upload of table/lens): {nat/py:.2f}x "
          f"({py:.3f} -> {nat:.3f} ms/step, {py-nat:+.3f} ms/step saved)")


if __name__ == "__main__":
    main()
