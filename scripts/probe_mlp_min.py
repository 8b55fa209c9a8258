#!/usr/bin/env python
"""Find the smallest geometry where fused_mlp_packed diverges on hardware.

probe_mlp_bisect.py shows every ingredient (phase-1 dual-window group dots,
dynamic-index scratch roundtrip, phase parking) is clean in isolation at 7B
geometry — the full kernel still diverges ([mlp0] 12.7%).  This sweeps the
EXACT failing configuration (probe_fused_divergence.probe_mlp0: bf16 input,
bf16 residual/out) down to small geometries, then toggles single ingredients:

  geometry sweep:  (d, inter) from (512, 512) up to (4096, 11008)
  f32y             same call with f32 input/resid (dtype control)
  nodown           monkeypatched kernel: phase 2 writes the DEQUANTIZED
                   scratch codes back instead of the down GEMM (isolates
                   phase-1+scratch under the full window layout)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mlp_min.py
"""
import argparse

import numpy as np

import jax
import jax.numpy as jnp

from atom_tpu.config import ATOM_W4A4
from atom_tpu.ops.formats import (
    pack_for_kernel,
    quantize_activation_packed,
    quantize_weight_packed,
)
from atom_tpu.ops.pallas_gemm_packed import quant_gemm_packed
from atom_tpu.ops.pallas_mlp import fused_mlp_packed

SPEC = ATOM_W4A4


def report(name, got, want, rtol=5e-2, atol=1.0):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    diff = np.abs(got - want)
    tol = atol + rtol * np.abs(want)
    bad = diff > tol
    print(
        f"[{name}] mismatch>{rtol}/{atol}: {bad.mean():.4%}  "
        f"max|d|: {diff.max():.4f}  bitwise-equal: {np.mean(got == want):.4%}",
        flush=True,
    )
    return bad.mean()


def run_one(d, inter, m=32, in_dtype=jnp.bfloat16, tn_gu=256, tn_dn=512):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    gu = pack_for_kernel(quantize_weight_packed(
        jax.random.normal(ks[0], (d, 2 * inter), jnp.float32) * 0.03, SPEC))
    dn = pack_for_kernel(quantize_weight_packed(
        jax.random.normal(ks[1], (inter, d), jnp.float32) * 0.03, SPEC))
    x = (jax.random.normal(ks[2], (m, d), jnp.float32) * 0.5).astype(in_dtype)
    # pre-normed stand-in: y = x (already "normed"), matching probe_mlp0's
    # structure minus the XLA prenorm (irrelevant: both paths consume y).
    y = x

    def unfused(y_):
        q = quantize_activation_packed(y_.astype(jnp.float32), SPEC)
        g_ = quant_gemm_packed(q, gu, out_dtype=jnp.float32)
        act = jax.nn.silu(g_[:, :inter]) * g_[:, inter:]
        d_in = quantize_activation_packed(act, SPEC)
        return x + quant_gemm_packed(d_in, dn)

    def fused(y_):
        return fused_mlp_packed(
            y_, x, gu, dn, abits=SPEC.abits, a_clip=SPEC.a_clip_ratio,
            tn_gu=tn_gu, tn_dn=tn_dn,
        )

    want = jax.jit(unfused)(y)
    got = jax.jit(fused)(y)
    tag = f"d{d}_i{inter}_{jnp.dtype(in_dtype).name}_tn{tn_gu}/{tn_dn}"
    return report(tag, got, want)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cases",
        default="512x512,1024x1280,2048x2816,4096x11008",
    )
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()
    dt = jnp.float32 if args.f32 else jnp.bfloat16
    for case in args.cases.split(","):
        d, inter = (int(v) for v in case.split("x"))
        run_one(d, inter, in_dtype=dt)


if __name__ == "__main__":
    main()
