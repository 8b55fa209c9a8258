"""End-to-end text-generation benchmark across serving stacks.

The analog of the reference's ``bench_textgen.py`` / ``bench_textgen_all.py``
(SURVEY.md §2.3): the same seeded synthetic ShareGPT-like workload through the
same continuous-batching engine, for each stack:

  * ``w4a4``  — Atom W4A4: packed 4-bit GEMMs + INT4 paged KV (this repo's
    headline path);
  * ``bf16``  — bf16 weights/KV (the punica-fp16 analog);
  * ``w8a8``  — SmoothQuant-style INT8 (the punica-int8 analog).

Two modes:
  * ``--engine``: the full FCFS engine loop (includes host scheduling; on the
    tunneled dev TPU this is dispatch-latency-bound — use on real hardware);
  * default: steady-state decode burst throughput (dispatch-free, the decode
    rate the reference reports as ms/token at batch 32).

    python -m atom_tpu.benchmarks.bench_textgen --stacks w4a4 bf16 --layers 8
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from atom_tpu.config import ATOM_W4A4
from atom_tpu.models.configs import Arch, ModelConfig


def model_cfg(name: str, layers: int) -> ModelConfig:
    geom = {
        "7b": dict(hidden_size=4096, intermediate_size=11008, num_heads=32,
                   num_kv_heads=32),
        "13b": dict(hidden_size=5120, intermediate_size=13824, num_heads=40,
                    num_kv_heads=40),
        # Llama-2-70B per-layer geometry (GQA, 8 kv heads); full model needs
        # TP over multiple chips — bench a layer slice single-chip
        "70b": dict(hidden_size=8192, intermediate_size=28672, num_heads=64,
                    num_kv_heads=8),
    }[name]
    return ModelConfig(
        arch=Arch.LLAMA,
        vocab_size=32000,
        num_layers=layers,
        head_dim=128,
        max_position_embeddings=2048,
        **geom,
    )


def burst_throughput_w4a4(cfg, batch, ctx, n_steps=32, head="bf16"):
    from atom_tpu.serving.kvpool import KvPool
    from atom_tpu.serving.model import (
        decode_burst,
        init_serving_params,
        make_serving_state,
    )

    spec = ATOM_W4A4
    params = init_serving_params(jax.random.PRNGKey(0), cfg, spec)
    if head != "bf16":
        from atom_tpu.serving.model import quantize_lm_head

        params = quantize_lm_head(params, bits=4 if head == "w4a16" else 8)
    from atom_tpu.ops.kv_hot import HOT_W

    # Size the page table for the TOTAL steps the timing loop will advance:
    # _slope_tok_s runs warmup(2 windows) + 3 rounds of (2 + n_hi) windows,
    # each window = HOT_W decode steps.  decode_burst requires the table to
    # pre-cover the whole burst (KV writes clamp into the last page otherwise).
    n_hi = max(n_steps // HOT_W, 2) + 2
    total_steps = (2 + 3 * (2 + n_hi)) * HOT_W
    page, maxp = 256, -(-(ctx + total_steps + 64) // 256)
    pool = KvPool(cfg.num_layers, batch * maxp + 1, cfg.num_kv_heads, page, cfg.head_dim)
    table = np.zeros((batch, maxp), np.int32)
    for b in range(batch):
        table[b] = np.asarray(pool.alloc(maxp), np.int32)
    table = jnp.asarray(table)
    mstate = make_serving_state(
        cfg.num_layers, batch * maxp + 1, batch, cfg.num_kv_heads, page,
        cfg.head_dim,
    )._replace(flushed=jnp.full((batch,), ctx, jnp.int32))
    state = [mstate, jnp.ones((batch,), jnp.int32), jnp.full((batch,), ctx, jnp.int32)]

    def run(n):  # n = ring WINDOWS of HOT_W steps each
        ids, st, lens = decode_burst(
            params, state[0], state[1], table, state[2], jnp.int32(n), cfg, spec
        )
        state[0], state[1], state[2] = st, ids, lens
        return float(jnp.sum(ids))

    tok_s, per_window = _slope_tok_s(run, batch * HOT_W, max(n_steps // HOT_W, 2) + 2)
    return tok_s, per_window / HOT_W


def burst_throughput_moe(batch, ctx, n_steps=32, layers=8):
    """Real-kernel Mixtral-8x7B-geometry decode burst (MoE serving path).

    Full Mixtral-8x7B does not fit one v5e (8 experts x 47B total params even
    at 4 bits ~ 23 GB), so this benches a layer slice single-chip — the EP
    path shards experts+heads across chips for the full model.
    """
    from atom_tpu.ops.kv_hot import HOT_W
    from atom_tpu.serving.kvpool import KvPool
    from atom_tpu.serving.model import make_serving_state
    from atom_tpu.serving.moe import decode_burst_moe, init_moe_serving_params

    cfg = ModelConfig(
        arch=Arch.MIXTRAL, vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_layers=layers, num_heads=32,
        num_kv_heads=8, head_dim=128, num_experts=8, num_experts_per_tok=2,
    )
    spec = ATOM_W4A4
    params = init_moe_serving_params(jax.random.PRNGKey(0), cfg, spec)
    n_hi = max(n_steps // HOT_W, 2) + 2
    total_steps = (2 + 3 * (2 + n_hi)) * HOT_W
    page, maxp = 256, -(-(ctx + total_steps + 64) // 256)
    pool = KvPool(cfg.num_layers, batch * maxp + 1, cfg.num_kv_heads, page, cfg.head_dim)
    table = np.zeros((batch, maxp), np.int32)
    for b in range(batch):
        table[b] = np.asarray(pool.alloc(maxp), np.int32)
    table = jnp.asarray(table)
    state = [make_serving_state(
        cfg.num_layers, batch * maxp + 1, batch, cfg.num_kv_heads, page,
        cfg.head_dim,
    )._replace(flushed=jnp.full((batch,), ctx, jnp.int32)),
        jnp.ones((batch,), jnp.int32), jnp.full((batch,), ctx, jnp.int32)]

    def run(n):  # n = ring WINDOWS of HOT_W steps (dispatch-free burst)
        ids, st, lens = decode_burst_moe(
            params, state[0], state[1], table, state[2], jnp.int32(n), cfg, spec
        )
        state[0], state[1], state[2] = st, ids, lens
        return float(jnp.sum(ids))

    tok_s, per_window = _slope_tok_s(run, batch * HOT_W, n_hi)
    return tok_s, per_window / HOT_W


def burst_throughput_lora(cfg, batch, ctx, n_steps=32, rank=16, head="w8a16"):
    """W4A4 + per-request LoRA decode burst (the reference's ``bench_lora.py``
    scenario: every request carries a DISTINCT rank-r adapter, the worst case
    for adapter traffic).  Reported next to the plain w4a4 row, the delta is
    the cost of multi-tenant adapters on the quantized stack.  ``head`` must
    match the w4a4 row's lm_head precision or the ratio conflates head cost
    with adapter cost."""
    from atom_tpu.ops.kv_hot import HOT_W
    from atom_tpu.serving.kvpool import KvPool
    from atom_tpu.serving.lora import init_llama_lora, lora_decode_burst
    from atom_tpu.serving.model import init_serving_params, make_serving_state

    spec = ATOM_W4A4
    params = init_serving_params(jax.random.PRNGKey(0), cfg, spec)
    if head != "bf16":
        from atom_tpu.serving.model import quantize_lm_head

        params = quantize_lm_head(params, bits=4 if head == "w4a16" else 8)
    lw = init_llama_lora(jax.random.PRNGKey(1), cfg, capacity=batch, rank=rank)
    adapters = jnp.arange(batch, dtype=jnp.int32)
    n_hi = max(n_steps // HOT_W, 2) + 2
    total_steps = (2 + 3 * (2 + n_hi)) * HOT_W
    page, maxp = 256, -(-(ctx + total_steps + 64) // 256)
    pool = KvPool(cfg.num_layers, batch * maxp + 1, cfg.num_kv_heads, page,
                  cfg.head_dim)
    table = np.zeros((batch, maxp), np.int32)
    for b in range(batch):
        table[b] = np.asarray(pool.alloc(maxp), np.int32)
    table = jnp.asarray(table)
    state = [make_serving_state(
        cfg.num_layers, batch * maxp + 1, batch, cfg.num_kv_heads, page,
        cfg.head_dim,
    )._replace(flushed=jnp.full((batch,), ctx, jnp.int32)),
        jnp.ones((batch,), jnp.int32), jnp.full((batch,), ctx, jnp.int32)]

    def run(n):  # n = ring WINDOWS of HOT_W steps (dispatch-free burst)
        ids, st, lens = lora_decode_burst(
            params, lw, state[0], state[1], table, state[2], jnp.int32(n),
            adapters, cfg, spec,
        )
        state[0], state[1], state[2] = st, ids, lens
        return float(jnp.sum(ids))

    tok_s, per_window = _slope_tok_s(run, batch * HOT_W, n_hi)
    return tok_s, per_window / HOT_W


def _slope_tok_s(run, batch, n_hi):
    run(2)  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); run(2); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); run(n_hi); t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - 2))
    return batch / best, best


def burst_throughput_baseline(cfg, batch, ctx, kind, n_steps=32):
    from atom_tpu.serving.baselines import (
        bf16_decode_burst,
        init_bf16_params,
        init_w4a16_params,
        init_w8_params,
        make_dense_kv,
        w4a16_decode_burst,
        w8a8_decode_burst,
    )

    max_t = ctx + n_steps * 3 + 64
    # w8a8 stores 8-bit KV (punica-int8 keeps an fp8 decode-attention
    # variant); bf16/w4a16 use bf16 KV like punica-fp16/awq.
    kv_dtype = jnp.int8 if kind == "w8a8" else jnp.bfloat16
    kvs = make_dense_kv(cfg.num_layers, batch, max_t, cfg.num_kv_heads,
                        cfg.head_dim, dtype=kv_dtype)
    if kind == "bf16":
        params = init_bf16_params(jax.random.PRNGKey(0), cfg)
        burst = bf16_decode_burst
    elif kind == "w4a16":
        params = init_w4a16_params(jax.random.PRNGKey(0), cfg)
        burst = w4a16_decode_burst
    else:
        params = init_w8_params(jax.random.PRNGKey(0), cfg)
        burst = w8a8_decode_burst
    state = [kvs, jnp.ones((batch,), jnp.int32), jnp.full((batch,), ctx, jnp.int32)]

    def run(n):
        ids, kvs_, lens = burst(params, state[0], state[1], state[2], jnp.int32(n), cfg)
        state[0], state[1], state[2] = kvs_, ids, lens
        return float(jnp.sum(ids))

    return _slope_tok_s(run, batch, n_steps)


def engine_run(cfg, batch, n_requests, stack="w4a4", sched="mixed"):
    """``sched``: "mixed" gives w4a4 chunked-prefill scheduling (its
    production mode); "serial" forces whole-prompt prefills for EVERY stack
    so cross-stack engine ratios compare quantization schemes, not
    schedulers (the baselines only have serial prefill, like the
    reference's one-ragged-step stacks)."""
    from atom_tpu.serving import (
        KvPool, TextGenConfig, TextGenEngine, synth_requests,
    )
    from atom_tpu.serving.workload import RequestSet

    tg = TextGenConfig(batch_size=batch, max_seq_len=1024, page_size=256,
                       prefill_buckets=(128, 256, 512))
    n_pool = batch * tg.max_seq_len // tg.page_size + 16
    pool = KvPool(
        cfg.num_layers, n_pool, cfg.num_kv_heads, tg.page_size, cfg.head_dim,
    )
    if stack == "moe":
        raise ValueError(
            "engine mode has no moe stack (burst-only row); drop --engine"
        )
    chunk_fn = None
    lora = stack == "lora"
    if stack == "w4a4":
        from atom_tpu.serving.model import (
            init_serving_params, make_mixed_step_fns, make_serving_state,
        )

        spec = ATOM_W4A4
        params = init_serving_params(jax.random.PRNGKey(0), cfg, spec)
        state = make_serving_state(
            cfg.num_layers, n_pool, batch, cfg.num_kv_heads, tg.page_size,
            cfg.head_dim,
        )
        # mixed scheduling: prompts ride the decode batch in page chunks
        pre, dec, chunk_fn = make_mixed_step_fns(params, cfg, spec)
        if sched == "serial":
            chunk_fn = None
        step_fns = (pre, dec)
    elif lora:
        from atom_tpu.serving.lora import init_llama_lora, make_lora_step_fns
        from atom_tpu.serving.model import (
            init_serving_params, make_serving_state,
        )

        spec = ATOM_W4A4
        params = init_serving_params(jax.random.PRNGKey(0), cfg, spec)
        lw = init_llama_lora(jax.random.PRNGKey(1), cfg, capacity=batch,
                             rank=16)
        state = make_serving_state(
            cfg.num_layers, n_pool, batch, cfg.num_kv_heads, tg.page_size,
            cfg.head_dim,
        )
        step_fns = make_lora_step_fns(params, lw, cfg, spec)
    else:
        from atom_tpu.serving.baselines import (
            init_bf16_params, init_w4a16_params, init_w8_params,
            make_baseline_step_fns, make_dense_kv,
        )

        init = {"bf16": init_bf16_params, "w8a8": init_w8_params,
                "w4a16": init_w4a16_params}[stack]
        params = init(jax.random.PRNGKey(0), cfg)
        state = make_dense_kv(
            cfg.num_layers, batch, tg.max_seq_len, cfg.num_kv_heads,
            cfg.head_dim,
            dtype=jnp.int8 if stack == "w8a8" else jnp.bfloat16,
        )
        step_fns = make_baseline_step_fns(params, cfg, stack)
    engine = TextGenEngine(tg, pool, *step_fns, state, chunk_fn=chunk_fn,
                           lora=lora)
    rs = synth_requests(n_requests, cfg.vocab_size, maxlen=900)
    if lora:  # round-robin distinct adapters (the bench_lora scenario)
        rs = RequestSet(
            rs.prompt_lens, rs.output_lens, rs.prompts,
            adapter_ids=(np.arange(len(rs)) % batch).astype(np.int32),
        )
    return engine.run(rs, progress=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["7b", "13b", "70b"], default="7b")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--stacks", nargs="*",
                    choices=["w4a4", "bf16", "w8a8", "w4a16", "moe", "lora"],
                    default=["w4a4", "bf16", "w8a8", "w4a16"])
    ap.add_argument("--lora_rank", type=int, default=16)
    ap.add_argument("--engine", action="store_true")
    ap.add_argument("--head", choices=["bf16", "w8a16", "w4a16"],
                    default="w8a16",
                    help="lm_head precision for the w4a4 stack (w8a16 is the "
                         "production default; see test_w4a16_head_logits_delta)")
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--sched", choices=["mixed", "serial"], default="mixed",
                    help="engine mode only: w4a4 prefill scheduling "
                         "(serial = fair cross-stack comparison)")
    args = ap.parse_args(argv)

    cfg = model_cfg(args.model, args.layers)
    print(f"devices: {jax.devices()}  model={args.model} L={args.layers} "
          f"batch={args.batch} ctx={args.ctx}", flush=True)

    if args.engine:
        for stack in args.stacks:
            print(f"--- engine: {stack} ---", flush=True)
            res = engine_run(cfg, args.batch, args.requests, stack,
                             sched=args.sched)
            for k, v in res.items():
                print(f"  {k}: {v}")
        return

    results = {}
    for stack in args.stacks:
        t0 = time.perf_counter()
        if stack == "w4a4":
            tok_s, per_step = burst_throughput_w4a4(
                cfg, args.batch, args.ctx, head=args.head
            )
        elif stack == "moe":
            tok_s, per_step = burst_throughput_moe(
                args.batch, args.ctx, layers=args.layers
            )
        elif stack == "lora":
            tok_s, per_step = burst_throughput_lora(
                cfg, args.batch, args.ctx, rank=args.lora_rank, head=args.head
            )
        else:
            tok_s, per_step = burst_throughput_baseline(
                cfg, args.batch, args.ctx, stack
            )
        results[stack] = tok_s
        print(
            f"{stack:6s} decode: {per_step*1e3:8.3f} ms/step  "
            f"{tok_s:8.1f} tok/s  (setup+compile {time.perf_counter()-t0:.0f}s)",
            flush=True,
        )
    if "w4a4" in results:
        for base in ("bf16", "w8a8", "w4a16"):
            if base in results:
                print(f"w4a4 vs {base}: {results['w4a4']/results[base]:.2f}x")
        if "lora" in results:
            print(f"lora vs w4a4: {results['lora']/results['w4a4']:.2f}x "
                  f"(multi-tenant adapter cost)")


if __name__ == "__main__":
    main()
