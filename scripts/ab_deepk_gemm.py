"""A/B harness for the deep-K packed GEMM (70B MLP shapes).

Variants:
  * grid      — the production K-blocked grid path (resident A at M=32)
  * inner     — emit_pipeline inner pipeline over the weight K stream with
                register accumulation (no per-k-step out_ref RMW)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_deepk_gemm.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import atom_tpu.ops.pallas_gemm_packed as G
from atom_tpu.config import ATOM_W4A4
from atom_tpu.ops.formats import (
    pack_for_kernel,
    quantize_activation_packed,
    quantize_weight_packed,
)
from atom_tpu.utils.timing import bench_op

GROUP, HALF = 128, 64


def make_inner(kb_g=16, tn=2048):
    """Outer grid (m, n); K walk via emit_pipeline with a VMEM accumulator."""

    def kernel(ak_ref, sak_ref, wk_ref, swk_ref,
               a_hbm, sa_hbm, wp_hbm, sw_hbm, out_ref, acc_ref, *, nk):
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(wp_ref, sw_ref, a_ref, sa_ref):
            acc = jnp.zeros(acc_ref.shape, jnp.float32)
            for g in range(kb_g):
                pb = wp_ref[g * HALF : (g + 1) * HALF, :].astype(jnp.int32)
                w_lo = ((pb << 28) >> 28).astype(jnp.int8)
                w_hi = (pb >> 4).astype(jnp.int8)
                a_g = a_ref[:, g * GROUP : (g + 1) * GROUP]
                acc_g = G._DOT_I32(a_g[:, :HALF], w_lo) + G._DOT_I32(
                    a_g[:, HALF:], w_hi
                )
                acc += (
                    acc_g.astype(jnp.float32)
                    * sa_ref[0, :, g : g + 1]
                    * sw_ref[g : g + 1, :]
                )
            acc_ref[:] += acc

        pipeline = pltpu.emit_pipeline(
            body,
            grid=(nk,),
            in_specs=[
                pl.BlockSpec((kb_g * HALF, tn), lambda g: (g, 0)),
                pl.BlockSpec((kb_g, tn), lambda g: (g, 0)),
                pl.BlockSpec((a_hbm.shape[0], kb_g * GROUP), lambda g: (0, g)),
                pl.BlockSpec((1, a_hbm.shape[0], 128), lambda g: (g, 0, 0)),
            ],
        )
        pipeline(wp_hbm, sw_hbm, a_hbm, sa_hbm)
        acc_k = G._DOT_I32(ak_ref[:], wk_ref[:])
        out_ref[:] = acc_ref[:] + (
            acc_k.astype(jnp.float32) * sak_ref[:, 0:1] * swk_ref[0:1, :]
        )

    @jax.jit
    def fn(a, wp, wk, sa, sw):
        m, ktot = a.shape
        n = wp.shape[1]
        kb = ktot - GROUP
        ng = kb // GROUP
        ngp = -(-ng // kb_g) * kb_g
        nk = ngp // kb_g
        ab = jnp.pad(a[:, :kb], ((0, 0), (0, (ngp - ng) * GROUP)))
        ak = a[:, kb:]
        sab = jnp.pad(sa[:, :ng], ((0, 0), (0, ngp - ng)))
        # [nk, m, 128]: leading-dim sliced, lane dim padded to the DMA tile
        sab = sab.reshape(m, nk, kb_g).transpose(1, 0, 2)
        sab = jnp.pad(sab, ((0, 0), (0, 0), (0, 128 - kb_g)))
        sak = sa[:, ng:]
        swb = jnp.pad(sw[:ng], ((0, ngp - ng), (0, 0)))
        swk = sw[ng:]
        wpb = jnp.pad(wp, ((0, (ngp - ng) * HALF), (0, 0)))
        out = pl.pallas_call(
            functools.partial(kernel, nk=nk),
            grid=(1, n // tn),
            in_specs=[
                pl.BlockSpec((m, GROUP), lambda i, j: (i, 0)),
                pl.BlockSpec((m, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((GROUP, tn), lambda i, j: (0, j)),
                pl.BlockSpec((1, tn), lambda i, j: (0, j)),
                # streams stay in HBM; the inner pipeline windows them
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((m, tn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((m, tn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(ak, sak, wk, swk, ab, sab, wpb, swb)
        return out

    return fn


def main():
    r = np.random.Generator(np.random.PCG64(0))
    k_in, n = 28672, 8192
    x = jnp.array(r.normal(size=(32, k_in)).astype(np.float32))
    w = jnp.array(r.normal(size=(k_in, n)).astype(np.float32) * 0.02)
    qa = quantize_activation_packed(x, ATOM_W4A4)
    kw = pack_for_kernel(quantize_weight_packed(w, ATOM_W4A4))
    a, sa = G.assemble_activation(qa)
    sw = jnp.concatenate([kw.body_scale, kw.keeper_scale[None, :]], axis=0)

    f_inner = make_inner()
    out_inner = f_inner(a, kw.body_packed, kw.keeper, sa, sw)
    out_grid = G.packed_w4_gemm(a, kw.body_packed, kw.keeper, sa, sw)
    err = np.abs(np.asarray(out_inner) - np.asarray(out_grid)).max()
    print(f"max |inner - grid| = {err}")

    best = {"grid": 1e9, "inner": 1e9}
    for rnd in range(4):
        best["grid"] = min(best["grid"], bench_op(
            lambda sa_: G.packed_w4_gemm(a, kw.body_packed, kw.keeper, sa_, sw),
            [sa], iters=150))
        best["inner"] = min(best["inner"], bench_op(
            lambda sa_: f_inner(a, kw.body_packed, kw.keeper, sa_, sw),
            [sa], iters=150))
    for t, dt in best.items():
        print(f"{t}: {dt*1e6:7.1f} us  {k_in*n//2/dt/1e9:.0f} GB/s(w)")


if __name__ == "__main__":
    main()
