#!/usr/bin/env python
"""Probe: native jnp.int4 weight refs in Pallas vs the manual nibble unpack.

The GEMM roofline shows the decode GEMMs 2-4x above their weight-stream
floors; the manual unpack (`_unpack_nibbles`: widen i8->i32, two shifts,
narrow) plus depth-64 dots are the suspects.  Newer Mosaic versions accept
s4 vector refs directly and lower the widening cast in hardware, which
would (a) delete the unpack arithmetic and (b) restore full depth-128
dots without a scratch round-trip.  This probe checks, at the gate/up
decode shape [32, 4096] x [4096, 22016]:

  u4ref   int4-typed weight ref, in-kernel astype(int8), K=128 dots
  u4dot   int4-typed weight ref, dot directly in int4 (if lowerable)
  packed  the production nibble-plane kernel (baseline)

plus an XLA-level `lax.dot_general` on int4 operands outside Pallas.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_int4_native.py
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128


def _dot_i32(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _kernel_i4(a_ref, w_ref, sa_ref, sw_ref, out_ref, *, ng, cast):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(ng):
        wg = w_ref[g * GROUP : (g + 1) * GROUP, :]
        if cast:
            wg = wg.astype(jnp.int8)
        acc_g = _dot_i32(a_ref[:, g * GROUP : (g + 1) * GROUP], wg)
        acc += (
            acc_g.astype(jnp.float32)
            * sa_ref[:, g : g + 1]
            * sw_ref[g : g + 1, :]
        )
    out_ref[:] = acc


def build_i4(m, k, n, tn, cast):
    ng = k // GROUP
    kernel = functools.partial(_kernel_i4, ng=ng, cast=cast)

    def run(a, w4, sa, sw):
        return pl.pallas_call(
            kernel,
            grid=(1, n // tn),
            in_specs=[
                pl.BlockSpec((m, k), lambda i, j: (i, 0)),
                pl.BlockSpec((k, tn), lambda i, j: (0, j)),
                pl.BlockSpec((m, ng), lambda i, j: (i, 0)),
                pl.BlockSpec((ng, tn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((m, tn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(a, w4, sa, sw)

    return run


def main():
    from atom_tpu.utils.compile_cache import enable

    enable()
    
    
    from atom_tpu.utils.timing import bench_op

    m, k, n, tn = 32, 4096, 22016, 512
    ng = k // GROUP
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-7, 8, (m, k)), jnp.int8)
    wint = rng.integers(-7, 8, (k, n)).astype(np.int8)
    sa = jnp.asarray(rng.normal(size=(m, ng)) ** 2, jnp.float32)
    sw = jnp.asarray(rng.normal(size=(ng, n)) ** 2, jnp.float32)
    floor = (k / 2 * n) / 800e9 * 1e6
    print(f"gateup decode shape M={m} K={k} N={n}; floor ~{floor:.1f} us",
          flush=True)

    # --- int4-typed weights ---
    try:
        w4 = jnp.asarray(wint, jnp.int4)
        print(f"int4 array created: {w4.shape} {w4.dtype} "
              f"(nbytes {w4.nbytes})", flush=True)
    except Exception as e:
        print(f"int4 dtype unsupported at array level: {e!r}", flush=True)
        return

    for name, cast in (("u4ref(astype i8, K=128 dots)", True),
                       ("u4dot(native int4 dot)", False)):
        try:
            fn = build_i4(m, k, n, tn, cast)
            out = fn(a8, w4, sa, sw)
            ref = np.einsum(
                "mgk,gkn->gmn",
                np.asarray(a8, np.float32).reshape(m, ng, GROUP),
                wint.astype(np.float32).reshape(ng, GROUP, n),
            )
            want = np.einsum(
                "gmn,mg,gn->mn", ref, np.asarray(sa), np.asarray(sw)
            )
            got = np.asarray(out)
            ok = np.allclose(got, want, rtol=2e-5, atol=1e-2)
            t = bench_op(fn, [a8, w4, sa, sw], perturb_arg=2, iters=200)
            print(f"  {name}: {t*1e6:7.1f} us  numerics {'OK' if ok else 'BAD'}"
                  f" (max|d| {np.abs(got-want).max():.3g})", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"  {name}: FAILED {type(e).__name__}: {msg}", flush=True)

    # --- XLA-level int4 dot (outside Pallas) ---
    try:
        @jax.jit
        def xla_i4(a, w):
            return jax.lax.dot_general(
                a.astype(jnp.int8), w.astype(jnp.int8),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        t = bench_op(
            lambda a, w, s: xla_i4(a, w).astype(jnp.float32) * s,
            [a8, w4, jnp.float32(1.0)], perturb_arg=2, iters=200,
        )
        print(f"  xla int4->i8 dot: {t*1e6:7.1f} us", flush=True)
    except Exception as e:
        print(f"  xla int4 dot FAILED: {str(e).splitlines()[0][:160]}",
              flush=True)

    # production baseline at this shape: see ab_kernel_roofline.py v3
    # (gateup row) — run in the same queue, directly comparable.


if __name__ == "__main__":
    main()
