#!/usr/bin/env python
"""Generate text with the real-kernel W4A4 engine from an exported checkpoint.

The qualitative end of the calibrate -> serve loop: load ServingParams written
by ``python -m atom_tpu.main byte-lm corpus --use_gptq --export_serving DIR``
(or any :func:`atom_tpu.utils.checkpoint.save_serving` output), feed byte-level
prompts through the continuous-batching engine, and print the generated text.
The reference has no equivalent — its serving stacks generate from random
weights (``e2e/punica-atom/benchmarks/bench_textgen.py:78-86``).

    PYTHONPATH=/root/repo PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/generate.py --serving_dir /tmp/byte_lm_serving \
        --prompt "The captain stood on the deck" --tokens 160
"""
import argparse

import numpy as np

import jax  # noqa: F401  (backend init before engine imports)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--serving_dir", required=True,
                    help="dir written by main.py --export_serving")
    ap.add_argument("--prompt", action="append", default=None,
                    help="repeatable; default: one built-in prompt")
    ap.add_argument("--tokens", type=int, default=160,
                    help="bytes to generate per prompt")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    from atom_tpu.models.configs import Arch
    from atom_tpu.serving import (
        KvPool,
        RequestSet,
        TextGenConfig,
        TextGenEngine,
    )
    from atom_tpu.serving.model import make_serving_state, make_step_fns
    from atom_tpu.utils import bytetok
    from atom_tpu.utils.checkpoint import load_serving

    params, cfg, spec = load_serving(args.serving_dir)
    if cfg.arch == Arch.MIXTRAL:
        from atom_tpu.serving.moe import make_moe_step_fns as make_step_fns  # noqa: F811
    print(f"loaded {args.serving_dir}: L={cfg.num_layers} d={cfg.hidden_size} "
          f"W{spec.wbits}A{spec.abits} gptq={spec.use_gptq}", flush=True)

    prompts = args.prompt or ["The captain stood on the deck and "]
    enc = [bytetok.encode(p) for p in prompts]

    page = 256
    ecfg = TextGenConfig(
        batch_size=args.batch,
        page_size=page,
        max_seq_len=max(len(e) for e in enc) + args.tokens + page,
        prefill_buckets=(128, 256, 512, 1024),
    )
    npages = (
        args.batch * (-(-ecfg.max_seq_len // page)) + ecfg.pool_slack_pages
    )
    pool = KvPool(cfg.num_layers, npages, cfg.num_kv_heads, page, cfg.head_dim)
    state = make_serving_state(
        cfg.num_layers, npages, args.batch, cfg.num_kv_heads, page,
        cfg.head_dim,
    )
    prefill_fn, decode_fn = make_step_fns(params, cfg, spec)
    engine = TextGenEngine(ecfg, pool, prefill_fn, decode_fn, state)

    rs = RequestSet(
        np.asarray([len(e) for e in enc], np.int32),
        np.full((len(enc),), args.tokens, np.int32),
        [e.astype(np.int32) for e in enc],
    )
    result = engine.run(rs, record=True)
    print(f"{result['throughput_tok_s']:.1f} tok/s "
          f"({result['output_tokens']} bytes generated)\n", flush=True)
    for i, p in enumerate(prompts):
        text = bytetok.decode(result["tokens"][i])
        print(f"--- prompt {i}: {p!r}")
        print(p + text)
        print()


if __name__ == "__main__":
    main()
