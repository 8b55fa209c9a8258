#!/usr/bin/env python
"""Roofline ladder for the packed W4A4 decode GEMM (round 5).

Phases show every decode kernel running 2-4x above its HBM floor (e.g.
gate/up 104 us vs ~56 us of weight bytes).  This probe times the SAME
grid/BlockSpecs as ``_gemm_packed_kernel`` with the body stripped down, so
the gap decomposes into DMA / nibble-unpack / MXU-dot / scale-FMA:

  v0  stream-only (blocks DMA'd, near-zero compute)
  v1  v0 + per-group nibble unpack
  v2  v1 + the two depth-64 int8 dots per group (scale applied once at end)
  v3  the production kernel (per-group f32 scale-multiply-accumulate)

    python scripts/ab_kernel_roofline.py [--iters 200]
"""
import argparse
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128
HALF = 64


def _dot_i32(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _unpack(pb_i8):
    pb = pb_i8.astype(jnp.int32)
    lo = ((pb << 28) >> 28).astype(jnp.int8)
    hi = (pb >> 4).astype(jnp.int8)
    return lo, hi


def _kernel_v0(a_ref, wp_ref, wk_ref, sa_ref, sw_ref, out_ref, *, ng):
    # touch one row of each input so nothing is dead; all blocks still DMA
    out_ref[:] = (
        wp_ref[0:1, :].astype(jnp.float32)
        + wk_ref[0:1, :].astype(jnp.float32)
        + a_ref[:, 0:1].astype(jnp.float32)
        + sa_ref[:, 0:1]
        + sw_ref[0:1, :]
    )


def _kernel_v1(a_ref, wp_ref, wk_ref, sa_ref, sw_ref, out_ref, *, ng):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(ng):
        w_lo, w_hi = _unpack(wp_ref[g * HALF : (g + 1) * HALF, :])
        # i32 add: Mosaic has no vector<i8> arith.addi (toolchain check
        # 2026-08-20); the widen is part of consuming the unpack anyway
        acc += (
            w_lo[0 : out_ref.shape[0], :].astype(jnp.int32)
            + w_hi[0 : out_ref.shape[0], :].astype(jnp.int32)
        ).astype(jnp.float32)
    out_ref[:] = acc + a_ref[:, 0:1].astype(jnp.float32)


def _kernel_v2(a_ref, wp_ref, wk_ref, sa_ref, sw_ref, out_ref, *, ng):
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for g in range(ng):
        w_lo, w_hi = _unpack(wp_ref[g * HALF : (g + 1) * HALF, :])
        a_lo = a_ref[:, g * GROUP : g * GROUP + HALF]
        a_hi = a_ref[:, g * GROUP + HALF : (g + 1) * GROUP]
        acc += _dot_i32(a_lo, w_lo) + _dot_i32(a_hi, w_hi)
    acc += _dot_i32(a_ref[:, ng * GROUP : (ng + 1) * GROUP], wk_ref[:])
    out_ref[:] = acc.astype(jnp.float32) * sa_ref[:, 0:1] * sw_ref[0:1, :]


def _kernel_v3(a_ref, wp_ref, wk_ref, sa_ref, sw_ref, out_ref, *, ng):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(ng):
        w_lo, w_hi = _unpack(wp_ref[g * HALF : (g + 1) * HALF, :])
        a_lo = a_ref[:, g * GROUP : g * GROUP + HALF]
        a_hi = a_ref[:, g * GROUP + HALF : (g + 1) * GROUP]
        acc_g = _dot_i32(a_lo, w_lo) + _dot_i32(a_hi, w_hi)
        acc += (
            acc_g.astype(jnp.float32)
            * sa_ref[:, g : g + 1]
            * sw_ref[g : g + 1, :]
        )
    acc_k = _dot_i32(a_ref[:, ng * GROUP : (ng + 1) * GROUP], wk_ref[:])
    acc += (
        acc_k.astype(jnp.float32)
        * sa_ref[:, ng : ng + 1]
        * sw_ref[ng : ng + 1, :]
    )
    out_ref[:] = acc


def build(kernel_body, m, k, n, tn=512):
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(False)
    kb = k - GROUP
    ng = kb // GROUP
    kernel = functools.partial(kernel_body, ng=ng)
    tm = m

    def run(a, wp, wk, sa, sw):
        return pl.pallas_call(
            kernel,
            grid=(1, n // tn),
            in_specs=[
                pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kb // 2, tn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP, tn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, ng + 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ng + 1, tn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(a, wp, wk, sa, sw)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--m", type=int, default=32)
    args = ap.parse_args()
    from atom_tpu.utils.compile_cache import enable

    enable()
    from atom_tpu.utils.timing import bench_op

    m = args.m
    rng = np.random.default_rng(0)
    shapes = [
        ("o_proj  ", 4096, 4096),
        ("qkv     ", 4096, 12288),
        ("gateup  ", 4096, 22016),
        ("down    ", 11008, 4096),
    ]
    print(f"M={m}; times in us; floor = weight bytes / 800 GB/s")
    for name, k, n in shapes:
        kb = k - GROUP
        ng = kb // GROUP
        a = jnp.asarray(rng.integers(-7, 8, (m, k)), jnp.int8)
        wp = jnp.asarray(rng.integers(-128, 128, (kb // 2, n)), jnp.int8)
        wk = jnp.asarray(rng.integers(-128, 128, (GROUP, n)), jnp.int8)
        sa = jnp.asarray(rng.normal(size=(m, ng + 1)) ** 2, jnp.float32)
        sw = jnp.asarray(rng.normal(size=(ng + 1, n)) ** 2, jnp.float32)
        floor = (kb / 2 * n + GROUP * n) / 800e9 * 1e6
        row = [f"{name} K={k:5d} N={n:5d}  floor {floor:6.1f}"]
        for vn, body in (("v0", _kernel_v0), ("v1", _kernel_v1),
                         ("v2", _kernel_v2), ("v3", _kernel_v3)):
            fn = build(body, m, k, n)
            t = bench_op(fn, [a, wp, wk, sa, sw], perturb_arg=3,
                         iters=args.iters)
            row.append(f"{vn} {t*1e6:6.1f}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
