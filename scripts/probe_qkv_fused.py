#!/usr/bin/env python
"""Bisect the fused-QKV-prologue divergence (pre-existing, CPU-reproducible).

tests/test_serving.py::test_fused_decode_hidden_matches_unfused fails with
ONLY ATOM_TPU_NO_FUSED_QKV unset, so the defect is in the float-input
``packed_w4_gemm_qkv_ring_fused`` path (in-kernel norm + dual-path quant
prologue), not the fused o_proj / fused MLP.  This script compares q and the
ring contents between

  unfused:  rmsnorm_reorder_quant -> assemble_activation
            -> packed_w4_gemm_qkv_ring          (int-input ring kernel)
  fused:    gather -> packed_w4_gemm_qkv_ring_fused   (norm+quant in-kernel)

at a GQA geometry (the failing test's) and at 7B geometry.

    python scripts/probe_qkv_fused.py [--d 512 --heads 8 --kv 4]
"""
import argparse

import numpy as np

import jax
import jax.numpy as jnp

from atom_tpu.config import ATOM_W4A4
from atom_tpu.ops import reference as R
from atom_tpu.ops.formats import pack_for_kernel, quantize_weight_packed
from atom_tpu.ops.kv_hot import make_hot
from atom_tpu.ops.pallas_gemm_packed import (
    assemble_activation,
    packed_w4_gemm_qkv_ring,
    packed_w4_gemm_qkv_ring_fused,
)

SPEC = ATOM_W4A4


def report(name, got, want):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    diff = np.abs(got - want)
    print(
        f"  [{name}] moved>0.05: {np.mean(diff > 0.05):.4%}  "
        f"max|d|: {diff.max():.4f}  bitwise: {np.mean(got == want):.4%}",
        flush=True,
    )


def run(d, heads, kv, dh=128, b=32, row=3):
    n_q, n_kv = heads * dh, kv * dh
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    w = jax.random.normal(ks[0], (d, n_q + 2 * n_kv), jnp.float32) * 0.03
    kw = pack_for_kernel(quantize_weight_packed(w, SPEC))
    sw = jnp.concatenate(
        [kw.body_scale, kw.keeper_scale[None, :]], axis=0
    )
    x = (jax.random.normal(ks[2], (b, d), jnp.float32) * 0.5).astype(
        jnp.bfloat16
    )
    ln_w = 1.0 + 0.1 * jax.random.normal(ks[3], (d,), jnp.float32)
    ridx = jax.random.permutation(ks[4], d).astype(jnp.int32)
    cos = jnp.cos(jnp.arange(dh, dtype=jnp.float32))[None, :].repeat(b, 0)
    sin = jnp.sin(jnp.arange(dh, dtype=jnp.float32))[None, :].repeat(b, 0)
    hot = make_hot(b, kv, dh, 32)
    row_ = jnp.int32(row)

    def unfused(x_, hot_):
        h_in = R.rmsnorm_reorder_quant(x_, ln_w, ridx, SPEC)
        a, sa = assemble_activation(h_in)
        return packed_w4_gemm_qkv_ring(
            a, kw.body_packed, kw.keeper, sa, sw, cos, sin,
            hot_.k_codes, hot_.prm, hot_.v_codes, row_,
            n_q=n_q, n_kv=n_kv, head_dim=dh,
        )

    wg = jnp.take(ln_w, ridx)

    def fused(x_, hot_):
        y = jnp.take(x_, ridx, axis=-1)
        return packed_w4_gemm_qkv_ring_fused(
            y, wg, kw.body_packed, kw.keeper, sw, cos, sin,
            hot_.k_codes, hot_.prm, hot_.v_codes, row_,
            n_q=n_q, n_kv=n_kv, head_dim=dh,
            abits=SPEC.abits, a_clip=SPEC.a_clip_ratio,
        )

    print(f"geometry d={d} heads={heads} kv={kv}:", flush=True)
    qa, kca, pra, vca = jax.jit(unfused)(x, hot)
    qb, kcb, prb, vcb = jax.jit(fused)(x, hot)
    report("q", qb, qa)
    report("k_codes", kcb.astype(np.int32), kca.astype(np.int32))
    report("prm", prb, pra)
    report("v_codes", vcb.astype(np.int32), vca.astype(np.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=0)
    ap.add_argument("--heads", type=int, default=0)
    ap.add_argument("--kv", type=int, default=0)
    args = ap.parse_args()
    if args.d:
        run(args.d, args.heads, args.kv)
        return
    run(512, 8, 4)      # the failing test's GQA geometry
    run(1024, 8, 8)     # MHA control
    run(4096, 32, 32)   # 7B geometry


if __name__ == "__main__":
    main()
