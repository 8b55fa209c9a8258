#!/usr/bin/env python
"""A/B: decode-attention micro-variants over the production v2 kernel.

The v2 kernel (pallas_decode.py) measures ~155 us at bs32/ctx512 against a
~90 us DMA floor — compute (nibble unpack + 2 small dots per head) doesn't
hide behind the page DMAs.  Variants:

  v2      production kernel structure (baseline)
  u8      uint8 LOGICAL-shift unpack: hi = (u8 >> 4), lo = (u8 & 0xF) — the
          production path widens to int32 for the arithmetic-shift workaround,
          4x the vector work of the u8 form
  cat     concatenate k_lo/k_hi (and v_lo/v_hi) on the contraction dim and
          issue ONE dot per head instead of two — halves MXU issue count
  u8cat   both
  dma     DMA floor (no compute)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_decode_v3.py
     [--ctx 512] [--variants v2,u8,cat,u8cat,dma] [--hb 16]
Numerics: each variant is checked against the production kernel first.
"""
import argparse
import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atom_tpu.utils.timing import bench_op

B, H, D, S = 32, 32, 128, 256


def make_fn(hb: int = 16, u8: bool = False, cat: bool = False,
            dma_only: bool = False):
    def kern(pt_ref, sl_ref, q_ref, kp_ref, prm_ref, vp_ref,
             o_ref, mo_ref, lo_ref, acc_ref, m_ref, l_ref, sc_ref, pv_ref,
             *, head_block, page_size, sm_scale):
        b = pl.program_id(0)
        i = pl.program_id(2)
        n_blocks = pl.num_programs(2)
        seq_len = sl_ref[b]
        s = page_size

        @pl.when(i == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def unpack(x, out_dtype):
            if u8:
                xu = x.astype(jnp.uint8)
                lo = (xu & 0x0F).astype(out_dtype)
                hi = (xu >> 4).astype(out_dtype)
            else:
                lo = (x & 0x0F).astype(out_dtype)
                hi = ((x.astype(jnp.int32) >> 4) & 0x0F).astype(out_dtype)
            return lo, hi

        @pl.when(i * s < seq_len)
        def _proc():
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
            valid = (i * s + lane) < seq_len  # [1, S]

            q_all = q_ref[0]  # [hb, D] bf16 (G=1)
            dh = D // 2
            for hh in range(head_block):
                kb = kp_ref[0, hh]  # int8 [D/2, S]
                k_lo, k_hi = unpack(kb, jnp.bfloat16)
                q_h = q_all[hh:hh + 1, :]
                if cat:
                    kfull = jnp.concatenate([k_lo, k_hi], axis=0)  # [D, S]
                    sc_ref[hh:hh + 1, :] = jax.lax.dot_general(
                        q_h, kfull, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    sc_ref[hh:hh + 1, :] = jax.lax.dot_general(
                        q_h[:, :dh], k_lo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        q_h[:, dh:], k_hi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

            prm = prm_ref[0].astype(jnp.float32)  # [4, hb, S]
            k_scale, k_zero, v_scale, v_zero = prm[0], prm[1], prm[2], prm[3]
            q_sum = jnp.sum(q_all.astype(jnp.float32), axis=1, keepdims=True)
            scores = (sc_ref[:] * k_scale + q_sum * k_zero) * sm_scale
            scores = jnp.where(valid, scores, -1e30)

            m_prev = m_ref[:, 0:1]
            l_prev = l_ref[:, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

            pw = p * v_scale
            half = s // 2
            for hh in range(head_block):
                vb = vp_ref[0, hh]  # int8 [S/2, D]
                v_lo, v_hi = unpack(vb, jnp.float32)
                pw_h = pw[hh:hh + 1, :]
                if cat:
                    vfull = jnp.concatenate([v_lo, v_hi], axis=0)  # [S, D]
                    pv_ref[hh:hh + 1, :] = jax.lax.dot_general(
                        pw_h, vfull, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    pv_ref[hh:hh + 1, :] = jax.lax.dot_general(
                        pw_h[:, :half], v_lo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        pw_h[:, half:], v_hi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            z_corr = jnp.sum(p * v_zero, axis=1, keepdims=True)
            acc_ref[:] = acc_ref[:] * alpha + pv_ref[:] + z_corr
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(i == n_blocks - 1)
        def _fin():
            l = jnp.maximum(l_ref[:, 0:1], 1e-20)
            o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
            mo_ref[0] = m_ref[:]
            lo_ref[0] = l_ref[:]

    def kern_dma(pt_ref, sl_ref, q_ref, kp_ref, prm_ref, vp_ref,
                 o_ref, mo_ref, lo_ref, acc_ref, m_ref, l_ref, sc_ref, pv_ref,
                 *, head_block, page_size, sm_scale):
        b = pl.program_id(0)
        i = pl.program_id(2)
        seq_len = sl_ref[b]
        s = page_size

        @pl.when(i == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(i * s < seq_len)
        def _proc():
            acc_ref[:, 0:1] += (
                jnp.sum(kp_ref[:].astype(jnp.float32))
                + jnp.sum(vp_ref[:].astype(jnp.float32))
                + jnp.sum(prm_ref[:].astype(jnp.float32))
                + jnp.sum(q_ref[:].astype(jnp.float32))
            )

        @pl.when(i == pl.num_programs(2) - 1)
        def _fin():
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)
            mo_ref[0] = m_ref[:]
            lo_ref[0] = l_ref[:]

    @jax.jit
    def fn(q, kp, prm, vp, page_table, seq_lens):
        b, hq, d = q.shape
        s = kp.shape[3]
        max_pages = page_table.shape[1]
        sm_scale = 1.0 / math.sqrt(d)

        def page_of(i_b, i_h, i_p, pt, sl):
            last = jnp.maximum(pl.cdiv(sl[i_b], s) - 1, 0)
            return pt[i_b, jnp.minimum(i_p, last)]

        grid = (b, H // hb, max_pages)
        kk = functools.partial(
            kern_dma if dma_only else kern,
            head_block=hb, page_size=s, sm_scale=sm_scale)
        out, m, l = pl.pallas_call(
            kk,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=grid,
                in_specs=[
                    pl.BlockSpec((1, hb, d),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                    pl.BlockSpec((1, hb, d // 2, s),
                                 lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), ih, 0, 0)),
                    pl.BlockSpec((1, 4, hb, s),
                                 lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), 0, ih, 0)),
                    pl.BlockSpec((1, hb, s // 2, d),
                                 lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), ih, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, hb, d),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                    pl.BlockSpec((1, hb, 128),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                    pl.BlockSpec((1, hb, 128),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((hb, d), jnp.float32),
                    pltpu.VMEM((hb, 128), jnp.float32),
                    pltpu.VMEM((hb, 128), jnp.float32),
                    pltpu.VMEM((hb, s), jnp.float32),
                    pltpu.VMEM((hb, d), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, hq, d), jnp.bfloat16),
                jax.ShapeDtypeStruct((b, hq, 128), jnp.float32),
                jax.ShapeDtypeStruct((b, hq, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(page_table, seq_lens, q, kp, prm, vp)
        return out

    return fn


VARIANTS = {
    "v2": dict(),
    "u8": dict(u8=True),
    "cat": dict(cat=True),
    "u8cat": dict(u8=True, cat=True),
    "dma": dict(dma_only=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--hb", type=int, default=16)
    ap.add_argument("--variants", default="v2,u8,cat,u8cat,dma")
    args = ap.parse_args()

    key = jax.random.PRNGKey(2)
    ctx = args.ctx
    maxp = ctx // S
    n_pages = B * maxp + 1

    kp = jax.random.randint(key, (n_pages, H, D // 2, S), -128, 127, jnp.int8)
    vp = jax.random.randint(key, (n_pages, H, S // 2, D), -128, 127, jnp.int8)
    prm = jax.random.uniform(key, (n_pages, 4, H, S), jnp.bfloat16)
    table = jnp.arange(1, n_pages).reshape(B, maxp).astype(jnp.int32)
    lens = jnp.full((B,), ctx, jnp.int32)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)

    names = args.variants.split(",")
    fns = {v: make_fn(hb=args.hb, **VARIANTS[v]) for v in names}

    # numerics vs the baseline first (dma excluded)
    ref = np.asarray(make_fn(hb=args.hb)(q, kp, prm, vp, table, lens))
    for v, f in fns.items():
        if v == "dma":
            continue
        got = np.asarray(f(q, kp, prm, vp, table, lens))
        if not np.allclose(ref, got, atol=2e-2, rtol=1e-2):
            print(f"{v}: NUMERICS MISMATCH max={np.abs(ref-got).max()}")
            return
        print(f"{v}: numerics ok", flush=True)

    best = {v: float("inf") for v in fns}
    for rnd in range(args.rounds):
        for v, f in fns.items():
            dt = bench_op(
                lambda q_, kp_, prm_, vp_: f(q_, kp_, prm_, vp_, table, lens),
                [q, kp, prm, vp], iters=args.iters, perturb_arg=0)
            best[v] = min(best[v], dt)
            print(f"rnd{rnd} {v:6s}: {dt * 1e6:7.1f} us", flush=True)
    print("--- min over rounds ---")
    for v, dt in best.items():
        print(f"{v:6s}: {dt * 1e6:7.1f} us")


if __name__ == "__main__":
    main()
