#!/usr/bin/env python
"""Decompose the burst step time: non-flush steps vs the ring-flush step.

The in-situ phase prediction (17.1 ms unfused at ctx 512) sits ~1.8 ms
under the measured burst step (18.90 ms).  Suspects: (a) the W-th step's
ring flush (32 layers of `flush_hot_pallas` — if XLA copies the page pool
instead of aliasing it, that is catastrophic amortized), (b) fori_loop
iteration boundaries.  This probe slope-times, at bench geometry:

  nf32    32 chained decode steps at CONSTANT lens (no flush, no growth)
  win32   one production ring window (31 nf steps + 1 flush step)

flush-step cost = t(win32) - t(nf32) (the +1-lens growth inside one
window is noise at ctx 512).  Run with defaults and with
ATOM_TPU_FUSED_MLP=1 to see both configurations.

    python scripts/ab_flush_cost.py [--layers 32]
"""
import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=512)
    args = ap.parse_args()

    from atom_tpu.utils.compile_cache import enable

    enable()
    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.models.configs import Arch, ModelConfig
    from atom_tpu.ops.kv_hot import HOT_W
    from atom_tpu.serving.kvpool import KvPool
    from atom_tpu.serving.model import (
        decode_step,
        init_serving_params,
        make_serving_state,
    )

    cfg = ModelConfig(
        arch=Arch.LLAMA, vocab_size=32000, hidden_size=4096,
        intermediate_size=11008, num_layers=args.layers, num_heads=32,
        num_kv_heads=32, head_dim=128, max_position_embeddings=2048,
    )
    spec = ATOM_W4A4
    b, ctx, page = args.batch, args.ctx, 256
    max_pages = 4
    params = init_serving_params(jax.random.PRNGKey(0), cfg, spec)
    from atom_tpu.serving.model import quantize_lm_head

    params = quantize_lm_head(params, bits=8)
    pool = KvPool(cfg.num_layers, b * max_pages + 1, cfg.num_kv_heads, page,
                  cfg.head_dim)
    table = np.zeros((b, max_pages), np.int32)
    for i in range(b):
        table[i] = np.asarray(pool.alloc(max_pages), np.int32)
    table = jnp.asarray(table)

    def fresh_state(hot_lag=0):
        # hot_lag: constant ring-suffix length for the constant-lens probe
        # (production n_hot averages W/2; 0 would understate the nf cost)
        st = make_serving_state(
            cfg.num_layers, b * max_pages + 1, b, cfg.num_kv_heads, page,
            cfg.head_dim,
        )
        return st._replace(flushed=jnp.full((b,), ctx - hot_lag, jnp.int32))

    w = HOT_W

    @jax.jit
    def nf32(state, ids, n):
        # n repeats of: W decode steps at CONSTANT lens (never flush)
        lens = jnp.full((b,), ctx, jnp.int32)

        def rep(_, carry):
            ids_, state_ = carry

            def body(_, c):
                i_, s_ = c
                i_, s_ = decode_step(
                    params, s_, i_, table, lens, cfg, spec, flush=False
                )
                return i_, s_

            return jax.lax.fori_loop(0, w, body, (ids_, state_))

        ids, state = jax.lax.fori_loop(0, n, rep, (ids, state))
        return ids, state

    @jax.jit
    def win32(state, ids, n):
        # n production ring windows (31 nf + 1 flush), lens growing
        lens0 = jnp.full((b,), ctx, jnp.int32)

        def rep(k, carry):
            ids_, state_, lens_ = carry

            def body(_, c):
                i_, s_, l_ = c
                l2 = l_ + 1
                i_, s_ = decode_step(
                    params, s_, i_, table, l2, cfg, spec, flush=False
                )
                return i_, s_, l2

            ids_, state_, lens_ = jax.lax.fori_loop(
                0, w - 1, body, (ids_, state_, lens_)
            )
            l2 = lens_ + 1
            ids_, state_ = decode_step(
                params, state_, ids_, table, l2, cfg, spec, flush=True
            )
            return ids_, state_, l2

        ids, state, _ = jax.lax.fori_loop(0, n, rep, (ids, state, lens0))
        return ids, state

    ids0 = jnp.ones((b,), jnp.int32)
    for name, fn, lag in (("nf32", nf32, 16), ("win32", win32, 0)):
        # slope between 1 and 3 window-equivalents, fresh state per call
        times = {}
        for n in (1, 3):
            st = fresh_state(lag)
            out = fn(st, ids0, jnp.int32(n))
            float(jnp.sum(out[0]))  # compile + barrier
            best = 1e9
            for _ in range(2):
                st = fresh_state(lag)
                jax.block_until_ready(st.hot[0].k)
                t0 = time.perf_counter()
                out = fn(st, ids0, jnp.int32(n))
                float(jnp.sum(out[0]))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        per_step = (times[3] - times[1]) / (2 * w)
        print(f"  {name}: {per_step*1e3:.3f} ms/step "
              f"(t1 {times[1]:.3f}s t3 {times[3]:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
