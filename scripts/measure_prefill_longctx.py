#!/usr/bin/env python
"""Long-context prefill throughput: one-pass vs scanned, 2k/4k/8k (TPU).

VERDICT r2 #5: the scanned flash-style prefill path was correctness-only.
This measures single-chip prefill tok/s at 2k/4k/8k for both attention
paths (one-pass [H,T,T] softmax vs ``key_block``-scanned online softmax),
on a reduced layer stack (per-layer cost is uniform; tok/s scales as
32/layers), so the scan-vs-one-pass crossover and any gap worth a Pallas
flash-prefill kernel (``flashinfer/prefill.cuh:79`` analog) are visible.

    python scripts/measure_prefill_longctx.py --layers 4 --ctx 2048 4096 8192
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def measure(cfg, spec, t, key_block, n_iters=3, kernel=False):
    """Seconds per full prefill of t tokens through cfg.num_layers layers."""
    import atom_tpu.serving.model as SM
    from atom_tpu.ops.kv_layout import make_kv_pages_kernel

    params = SM.init_serving_params(jax.random.PRNGKey(0), cfg, spec)
    page = 256
    n_pages = t // page + 2
    table_row = jnp.arange(1, n_pages + 1, dtype=jnp.int32)
    pages = [
        make_kv_pages_kernel(n_pages + 2, cfg.num_kv_heads, page, cfg.head_dim)
        for _ in range(cfg.num_layers)
    ]
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, t), jnp.int32
    )

    # monkey-select the attention path via the module thresholds
    old_thr, old_blk = SM.PREFILL_SCAN_THRESHOLD, SM.PREFILL_KEY_BLOCK
    old_krn = SM.PREFILL_KERNEL_THRESHOLD
    SM.PREFILL_SCAN_THRESHOLD = 0 if key_block else 10**9
    SM.PREFILL_KEY_BLOCK = key_block or old_blk
    SM.PREFILL_KERNEL_THRESHOLD = 0 if kernel else 10**9

    # Slope timing (the bench_op protocol): N prefills chained INSIDE one
    # jitted program through the page carry (each iteration's appends depend
    # on the previous pages, so nothing can be hoisted or elided), then the
    # slope between two trip counts — a single wall-clocked dispatch would
    # count the ~30 ms tunnel round-trip as layer work and skew the
    # one-pass/scanned/kernel comparison this script exists to make.
    @jax.jit
    def chained(n, pages):
        def body(_, pgs):
            _, new_pgs = SM.prefill_hidden(
                params, pgs, ids, table_row, cfg, spec
            )
            return new_pgs
        pgs = jax.lax.fori_loop(0, n, body, pages)
        return jnp.sum(pgs[0].params.astype(jnp.float32))

    n_lo, n_hi = jnp.int32(1), jnp.int32(1 + n_iters)
    try:
        float(chained(n_lo, pages))  # compile + barrier
        float(chained(n_hi, pages))
        t_lo = min(
            _walltime(lambda: float(chained(n_lo, pages))) for _ in range(2)
        )
        t_hi = min(
            _walltime(lambda: float(chained(n_hi, pages))) for _ in range(2)
        )
        best = max(t_hi - t_lo, 1e-9) / n_iters
    finally:
        SM.PREFILL_SCAN_THRESHOLD, SM.PREFILL_KEY_BLOCK = old_thr, old_blk
        SM.PREFILL_KERNEL_THRESHOLD = old_krn
    return best


def _walltime(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--ctx", type=int, nargs="*", default=[2048, 4096, 8192])
    ap.add_argument("--key_block", type=int, default=1024)
    args = ap.parse_args()

    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.models.configs import LLAMA2_7B

    cfg = LLAMA2_7B.replace(num_layers=args.layers, vocab_size=32000,
                            max_position_embeddings=8192)
    spec = ATOM_W4A4
    scale = 32 / args.layers  # extrapolate to full model
    print(f"devices: {jax.devices()}  layers={args.layers} "
          f"(tok/s figures extrapolated to 32 layers)")
    for t in args.ctx:
        row = {"ctx": t}
        variants = (
            ("one-pass", 0, False),
            ("scanned", args.key_block, False),
            ("kernel", 0, True),
        )
        for name, kb, krn in variants:
            if name == "one-pass" and t > 4096:
                row[name] = None  # [H,T,T] f32 scores: 8k = 8.6 GB/layer
                continue
            try:
                dt = measure(cfg, spec, t, kb, kernel=krn)
                row[name] = t / (dt * scale)
            except Exception as e:  # OOM etc.
                print(f"  ctx {t} {name}: FAILED ({type(e).__name__})")
                import traceback

                traceback.print_exc()
                row[name] = None
        parts = [
            f"{k}: {v:8.0f} tok/s" if v else f"{k}: {'—':>8}"
            for k, v in row.items() if k != "ctx"
        ]
        print(f"ctx {t:5d}  " + "  ".join(parts), flush=True)


if __name__ == "__main__":
    main()
