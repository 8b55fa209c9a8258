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


def main():
    rows = {}
    for mode, native in (("python", False), ("native", "auto")):
        res = run(native)
        rows[mode] = res
        print(f"{mode:7s} ({res['scheduler']}): "
              f"host {res['host_sched_ms_per_step']:.3f} ms/step "
              f"over {res['decode_steps']} steps")
    py = rows["python"]["host_sched_ms_per_step"]
    nat = rows["native"]["host_sched_ms_per_step"]
    print(f"native/python host tax: {nat/py:.2f}x "
          f"({py:.3f} -> {nat:.3f} ms/step, {py-nat:+.3f} ms/step saved)")


if __name__ == "__main__":
    main()
