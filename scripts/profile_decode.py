"""Capture an xprof/TensorBoard trace of the W4A4 decode step.

The TPU analog of the reference's NVTX + nsys flow (SURVEY.md §5 — the
serving model brackets each phase with ``torch.cuda.nvtx.range_push/pop``,
e2e/punica-atom/.../llama.py): the decode step is annotated with
``jax.named_scope`` per layer and per phase (qkv / ring_write / ring_flush /
paged_attention / ring_attention / o_mlp), so the trace viewer groups ops the
same way nsys ranges do.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_decode.py \
        --layers 4 --batch 32 --outdir /tmp/xprof

Then: tensorboard --logdir /tmp/xprof  (or xprof's trace_viewer on the
captured .trace.json.gz).  On the tunneled dev TPU the host-side trace still
shows dispatch gaps; device-side ranges need a locally-attached chip.
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--outdir", default="/tmp/xprof")
    args = ap.parse_args()

    from atom_tpu.benchmarks.bench_textgen import model_cfg
    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.serving.kvpool import KvPool
    from atom_tpu.serving.model import (
        decode_step,
        init_serving_params,
        make_serving_state,
    )

    cfg = model_cfg("7b", args.layers)
    spec = ATOM_W4A4
    params = init_serving_params(jax.random.PRNGKey(0), cfg, spec)
    page = 256
    maxp = -(-(args.ctx + args.steps + 64) // page)
    batch = args.batch
    pool = KvPool(cfg.num_layers, batch * maxp + 1, cfg.num_kv_heads, page,
                  cfg.head_dim)
    table = np.zeros((batch, maxp), np.int32)
    for b in range(batch):
        table[b] = np.asarray(pool.alloc(maxp), np.int32)
    table = jnp.asarray(table)
    state = make_serving_state(
        cfg.num_layers, batch * maxp + 1, batch, cfg.num_kv_heads, page,
        cfg.head_dim,
    )._replace(flushed=jnp.full((batch,), args.ctx, jnp.int32))
    ids = jnp.ones((batch,), jnp.int32)
    lens = jnp.full((batch,), args.ctx, jnp.int32)

    # warm/compile outside the trace
    ids, state = decode_step(params, state, ids, table, lens, cfg, spec)
    _ = int(jnp.sum(ids))

    with jax.profiler.trace(args.outdir):
        for i in range(args.steps):
            lens = lens + 1
            ids, state = decode_step(
                params, state, ids, table, lens, cfg, spec,
                flush=((i + 1) % 32 == 0),
            )
        _ = int(jnp.sum(ids))  # barrier inside the trace
    print(f"trace written under {args.outdir}")


if __name__ == "__main__":
    main()
