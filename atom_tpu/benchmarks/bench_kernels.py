"""Kernel micro-benchmarks — the NVBench-driver analog (SURVEY.md §2.2).

Prints one table row per (kernel, shape): time, achieved bandwidth, and
int-op throughput, using dispatch-free in-graph timing
(``atom_tpu.utils.timing.bench_op``).

    python -m atom_tpu.benchmarks.bench_kernels [--quick]

Mirrors the reference's sweeps: GEMM over batch {16..4096} x hidden
{4096, 11008} (``bench_dense_layer_gemm_i4_o16.cu:64-68``), the fused quant
epilogues, and paged decode attention over context lengths.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from atom_tpu.config import ATOM_W4A4
from atom_tpu.ops import reference as R
from atom_tpu.ops.formats import (
    pack_for_kernel,
    quantize_activation_packed,
    quantize_weight_packed,
)
from atom_tpu.ops.kv_layout import make_kv_pages_kernel
from atom_tpu.ops.pallas_decode import paged_decode_attention_rotated
from atom_tpu.ops.pallas_gemm_packed import quant_gemm_packed
from atom_tpu.utils.timing import bench_op

SPEC = ATOM_W4A4


def row(name, dt, bytes_=None, intops=None):
    parts = [f"{name:44s} {dt*1e6:9.1f} us"]
    if bytes_:
        parts.append(f"{bytes_/dt/1e9:7.0f} GB/s")
    if intops:
        parts.append(f"{intops/dt/1e12:7.1f} Tops/s")
    print("  ".join(parts), flush=True)


def bench_gemm(quick: bool):
    key = jax.random.PRNGKey(0)
    batches = (16, 32, 128) if quick else (16, 32, 128, 512, 2048, 4096)
    shapes = ((4096, 4096), (4096, 12288), (4096, 22016), (11008, 4096))

    import functools

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def mkw(k, i, o):
        w = jax.random.normal(k, (i, o), jnp.float32) * (i ** -0.5)
        return pack_for_kernel(quantize_weight_packed(w, SPEC))

    for k_dim, n_dim in shapes:
        kw = mkw(key, k_dim, n_dim)
        for m in batches:
            x = jax.random.normal(key, (m, k_dim), jnp.float32)
            qa = jax.jit(lambda x_: quantize_activation_packed(x_, SPEC))(x)
            dt = bench_op(
                lambda s: quant_gemm_packed(qa._replace(body_scale=s), kw),
                [qa.body_scale],
                iters=30,
            )
            bytes_ = m * k_dim + k_dim * n_dim // 2 + 2 * m * n_dim
            row(f"w4a4_gemm M={m} K={k_dim} N={n_dim}", dt, bytes_,
                2 * m * k_dim * n_dim)


def bench_epilogues(quick: bool):
    key = jax.random.PRNGKey(1)
    for t in (32, 256):
        x = jax.random.normal(key, (t, 4096), jnp.bfloat16)
        w = jnp.ones((4096,), jnp.bfloat16)
        idx = jnp.arange(4096, dtype=jnp.int32)
        dt = bench_op(
            lambda x_: R.rmsnorm_reorder_quant(x_, w, idx, SPEC).body, [x], iters=50
        )
        row(f"rmsnorm+reorder+quant T={t} d=4096", dt, t * 4096 * 3)
        dt = bench_op(lambda x_: R.reorder_quant(x_, idx, SPEC).body, [x], iters=50)
        row(f"reorder+quant T={t} d=4096", dt, t * 4096 * 3)
        g = jax.random.normal(key, (t, 11008), jnp.float32)
        dt = bench_op(lambda g_: R.silu_mul_quant(g_, g_, SPEC).body, [g], iters=50)
        row(f"silu_mul+quant T={t} inter=11008", dt, t * 11008 * 9)


def bench_decode(quick: bool):
    key = jax.random.PRNGKey(2)
    B, H, D, S = 32, 32, 128, 256
    ctxs = (512,) if quick else (512, 1024, 2048)
    for ctx in ctxs:
        maxp = ctx // S
        n_pages = B * maxp + 1
        pages = make_kv_pages_kernel(n_pages, H, S, D)
        pages = pages._replace(
            k_pages=jax.random.randint(key, pages.k_pages.shape, -128, 127, jnp.int8),
            v_pages=jax.random.randint(key, pages.v_pages.shape, -128, 127, jnp.int8),
            params=jax.random.uniform(
                key, pages.params.shape, jnp.float32, 0.01, 0.1
            ).astype(jnp.bfloat16),
        )
        table = jnp.arange(1, n_pages).reshape(B, maxp).astype(jnp.int32)
        lens = jnp.full((B,), ctx, jnp.int32)
        q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
        dt = bench_op(
            lambda q_: paged_decode_attention_rotated(q_, pages, table, lens),
            [q], iters=30,
        )
        kv_bytes = B * ctx * H * D + B * ctx * H * 8  # 4-bit K+V + bf16 params
        row(f"paged_decode_attn B={B} H={H} ctx={ctx}", dt, kv_bytes)


def bench_lora(quick: bool):
    """Per-request adapter gather+einsum — the BGMV op analog
    (``punica/ops/__init__.py:90-110``, ``benchmarks/bench_ops.py``).
    Bytes = the B gathered [r, d_in] + [d_out, r] adapter blocks (bf16),
    identical to what the CUDA BGMV kernel streams."""
    from atom_tpu.models.configs import Arch, ModelConfig
    from atom_tpu.serving.lora import add_lora, init_llama_lora

    cfg = ModelConfig(
        arch=Arch.LLAMA, vocab_size=32000, hidden_size=4096,
        intermediate_size=11008, num_layers=1, num_heads=32,
        num_kv_heads=32, head_dim=128,
    )
    key = jax.random.PRNGKey(3)
    b = 32
    ranks = (16,) if quick else (8, 16, 64)
    for r in ranks:
        lw = init_llama_lora(key, cfg, capacity=b, rank=r)
        idx = jnp.arange(b, dtype=jnp.int32)  # distinct adapter per request
        x = jax.random.normal(key, (b, 4096), jnp.float32)
        dt = bench_op(
            lambda x_: add_lora(x_, lw.q, idx, layer=0, scale=1.0), [x],
            iters=50,
        )
        bytes_ = b * r * (4096 + 4096) * 2  # wa + wb bf16 gathers
        row(f"add_lora B={b} r={r} d=4096->4096", dt, bytes_)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--only", choices=["gemm", "epilogue", "decode", "lora"], default=None
    )
    args = ap.parse_args(argv)
    print(f"devices: {jax.devices()}")
    if args.only in (None, "gemm"):
        bench_gemm(args.quick)
    if args.only in (None, "epilogue"):
        bench_epilogues(args.quick)
    if args.only in (None, "decode"):
        bench_decode(args.quick)
    if args.only in (None, "lora"):
        bench_lora(args.quick)


if __name__ == "__main__":
    main()
