"""Benchmark entry point — prints ONE JSON line for the driver.

Metric: real-kernel W4A4 serving DECODE throughput on Llama-2-7B geometry
(full 32 layers, batch 32, context 512+), per chip.  This is the same quantity
as the reference's headline decode rate (15.60 ms/token at batch 32 on an
RTX 4090 => 2052.8 tok/s, ``e2e/punica-atom/README.md:22-27``), measured on
our stack's real Pallas path: packed 4-bit dual-path GEMMs, fused o4 KV
quantization, paged INT4 KV cache, fused-dequant decode attention.

Protocol (tunnel-safe, dispatch-latency-free): ``decode_burst`` chains N decode
steps inside ONE compiled program with a dynamic trip count; throughput is the
slope between two trip counts, so compile time and the per-call round-trip
cancel.  Everything runs ON the chip; only a scalar comes back.
"""
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_DECODE_TOK_S = 2052.8  # reference e2e, RTX 4090, bs=32


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from atom_tpu.utils.compile_cache import enable as enable_compile_cache

    cache_dir = enable_compile_cache()
    if cache_dir:
        log(f"compilation cache: {cache_dir}")
    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.models.configs import Arch, ModelConfig
    from atom_tpu.serving.kvpool import KvPool
    from atom_tpu.serving.model import (
        decode_burst,
        init_serving_params,
        make_serving_state,
    )

    n_layers = int(os.environ.get("BENCH_LAYERS", "32"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    ctx = 512
    page = 256

    cfg = ModelConfig(
        arch=Arch.LLAMA,
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_layers=n_layers,
        num_heads=32,
        num_kv_heads=32,
        head_dim=128,
        max_position_embeddings=2048,
    )
    spec = ATOM_W4A4
    log(f"devices: {jax.devices()}  layers={n_layers} batch={batch}")

    t0 = time.perf_counter()
    params = init_serving_params(jax.random.PRNGKey(0), cfg, spec)
    head = os.environ.get("BENCH_HEAD", "w8a16")
    if head != "bf16":
        # Default: per-column INT8 weight-only lm_head — halves head HBM per
        # step at ~0.7% logits noise (97% argmax agreement even on the
        # iid-gaussian worst case; see test_w4a16_head_logits_delta).
        from atom_tpu.serving.model import quantize_lm_head

        params = quantize_lm_head(params, bits=4 if head == "w4a16" else 8)
    jax.block_until_ready(params.layers[-1].wdown.body_packed)
    log(f"param init: {time.perf_counter() - t0:.1f}s")

    # Pre-allocated page tables covering ctx + the whole burst series.
    max_pages = 4  # 1024 tokens
    pool = KvPool(n_layers, batch * max_pages + 1, cfg.num_kv_heads, page, cfg.head_dim)
    table = np.zeros((batch, max_pages), np.int32)
    for b in range(batch):
        table[b] = np.asarray(pool.alloc(max_pages), np.int32)
    table = jnp.asarray(table)
    lens = jnp.full((batch,), ctx, jnp.int32)
    ids = jnp.ones((batch,), jnp.int32)
    state = make_serving_state(
        n_layers, batch * max_pages + 1, batch, cfg.num_kv_heads, page,
        cfg.head_dim,
    )
    state = state._replace(flushed=jnp.full((batch,), ctx, jnp.int32))

    def burst(state_, ids_, lens_, n):
        ids_, state_, lens_ = decode_burst(
            params, state_, ids_, table, lens_, jnp.int32(n), cfg, spec
        )
        return ids_, state_, lens_

    # decode_burst counts whole ring WINDOWS (W=32 steps each).
    from atom_tpu.ops.kv_hot import HOT_W

    n_lo, n_hi = 1, 4
    t0 = time.perf_counter()
    ids, state, lens = burst(state, ids, lens, n_lo)
    _ = float(jnp.sum(ids))
    log(f"compile + first burst: {time.perf_counter() - t0:.1f}s")

    # Pin the measurement to the STATED context (round 5): lens/flushed reset
    # to ctx before every burst, so slope steps run at lens in
    # [ctx+W, ctx+4W] = [544, 640] instead of drifting to 1024 across the
    # sample series (r02-r04 protocol) — attention HBM traffic is
    # proportional to lens, so the drift overstated the ctx-512 step time by
    # ~1.5 ms/step at 32L.  Timing is content-independent (argmax feeds the
    # next step either way); ring bookkeeping stays consistent because every
    # burst is whole ring windows (row returns to 0, flushed == lens).
    def timed(n):
        nonlocal ids, state, lens
        # fresh buffers each call: state is DONATED into the burst, so the
        # reset arrays are consumed (and lens must not alias state.flushed)
        state = state._replace(flushed=jnp.full((batch,), ctx, jnp.int32))
        lens = jnp.full((batch,), ctx, jnp.int32)
        jax.block_until_ready(lens)
        t0 = time.perf_counter()
        ids, state, lens = burst(state, ids, lens, n)
        _ = float(jnp.sum(ids))
        return time.perf_counter() - t0

    samples = []
    for _ in range(3):
        t_lo = timed(n_lo)
        t_hi = timed(n_hi)
        samples.append((t_hi - t_lo) / ((n_hi - n_lo) * HOT_W))
        log(f"  step time sample: {samples[-1]*1e3:.2f} ms")
    per_step = min(samples)
    tok_s = batch / per_step

    # Scale to the full model if benching a slice (layer-dominated runtime).
    scale = 32 / n_layers
    tok_s_full = tok_s / scale if scale != 1 else tok_s

    print(
        json.dumps(
            {
                "metric": "llama7b_w4a4_decode_tokens_per_s_per_chip_bs32",
                "value": round(tok_s_full, 1),
                "unit": "tok/s",
                "vs_baseline": round(tok_s_full / BASELINE_DECODE_TOK_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
