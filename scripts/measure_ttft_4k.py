#!/usr/bin/env python
"""TTFT of a 4k prompt arriving into a loaded mixed-scheduling engine (TPU).

VERDICT r2 #5's engine clause: the mixed engine chunks the long prompt into
page-size pieces that ride the decode batch, so the measurement shows both
the 4k prompt's TTFT and how much the resident decodes slow down while it
streams in (vs the same workload without the long prompt).

    python scripts/measure_ttft_4k.py [--layers 16 --prompt 4000]
"""
from __future__ import annotations

import argparse

import numpy as np

import jax


def build_engine(cfg, spec, tg, n_pages):
    from atom_tpu.serving import KvPool, TextGenEngine
    from atom_tpu.serving.model import (
        init_serving_params,
        make_mixed_step_fns,
        make_serving_state,
    )

    params = init_serving_params(jax.random.PRNGKey(0), cfg, spec)
    pool = KvPool(
        cfg.num_layers, n_pages, cfg.num_kv_heads, tg.page_size, cfg.head_dim
    )
    state = make_serving_state(
        cfg.num_layers, n_pages, tg.batch_size, cfg.num_kv_heads,
        tg.page_size, cfg.head_dim,
    )
    prefill_fn, decode_fn, chunk_fn = make_mixed_step_fns(params, cfg, spec)
    return TextGenEngine(tg, pool, prefill_fn, decode_fn, state,
                         chunk_fn=chunk_fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--prompt", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.models.configs import LLAMA2_7B
    from atom_tpu.serving import TextGenConfig
    from atom_tpu.serving.workload import RequestSet

    cfg = LLAMA2_7B.replace(
        num_layers=args.layers, vocab_size=32000,
        max_position_embeddings=8192,
    )
    spec = ATOM_W4A4
    tg = TextGenConfig(
        batch_size=args.batch, page_size=256,
        max_seq_len=args.prompt + 640,
        prefill_buckets=(512,),
    )
    # pool: background seqs ~2-3 pages each + the long seq + slack
    n_pages = args.batch * 4 + (args.prompt + 640) // 256 + 8
    print(f"devices: {jax.devices()}  layers={args.layers} "
          f"pool={n_pages} pages", flush=True)
    engine = build_engine(cfg, spec, tg, n_pages)

    at = args.batch  # long prompt arrives after the first batch is resident

    def workload(with_long: bool) -> RequestSet:
        # IDENTICAL background both runs: fresh generator per call (a shared
        # stream would give the two runs different background lengths and the
        # baseline-vs-4k delta would partly measure sampling noise)
        rng = np.random.Generator(np.random.PCG64(7))
        n_bg = 2 * args.batch  # enough to keep the batch full throughout
        plens = rng.integers(200, 480, n_bg).astype(np.int32)
        olens = rng.integers(96, 160, n_bg).astype(np.int32)
        prompts = [
            rng.integers(1, cfg.vocab_size, int(p)).astype(np.int32)
            for p in plens
        ]
        if with_long:
            plens = np.insert(plens, at, args.prompt)
            olens = np.insert(olens, at, 64)
            prompts.insert(
                at, rng.integers(1, cfg.vocab_size, args.prompt).astype(np.int32)
            )
        return RequestSet(plens, olens, prompts)

    # Warmup: compile every program the timed runs dispatch (bucket prefill,
    # decode step at both flush parities, and the chunked mixed step via a
    # prompt over the largest bucket) so no compile lands inside a timed run.
    warm_rng = np.random.Generator(np.random.PCG64(11))
    warm_plens = np.asarray([256, 600], np.int32)  # 600 > bucket 512 -> mixed
    warm = RequestSet(
        warm_plens,
        np.asarray([40, 40], np.int32),  # > HOT_W=32: both flush parities
        [warm_rng.integers(1, cfg.vocab_size, int(p)).astype(np.int32)
         for p in warm_plens],
    )
    engine.run(warm)
    print("warmup done", flush=True)

    scale = 32 / args.layers
    for name, with_long in (("baseline (no 4k)", False), ("with 4k", True)):
        res = engine.run(workload(with_long), record=True)
        line = (f"{name}: output {res['output_tok_s']:.1f} tok/s "
                f"ttft_avg {res['ttft_avg_s']:.3f}s "
                f"p90 {res['ttft_p90_s']:.3f}s mixed_steps {res['mixed_steps']}")
        if with_long:
            ttft = res["ttft_per_request"][at]  # by insertion position (a
            # background request can share the same prompt LENGTH)
            line += (f"  |  4k-prompt TTFT {ttft:.3f}s "
                     f"(x{scale:.0f} layers ~ {ttft*scale:.3f}s at 32L)")
        print(line, flush=True)


if __name__ == "__main__":
    main()
