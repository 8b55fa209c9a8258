#!/usr/bin/env python
"""Roofline ladder for the paged decode-attention kernel (round 5).

Phases: paged 155 us / paged_ring 174 us vs an ~86-92 us DMA floor at
bs32/ctx512/7B-MHA.  Same grid/BlockSpecs as ``_decode_kernel`` with the
body built up in levels, so the gap decomposes:

  L0  stream pages only (DMA floor as actually achievable)
  L1  + K nibble unpack to bf16
  L2  + per-head K score dots
  L3  + softmax/affine/state chain (no V work)
  L4  full production body
  E1  full, V dots in bf16 (p rounded to bf16; V codes exact in bf16)
  E2  full, K+V dots BATCHED over heads (one dot_general, batch dim Hb)

    python scripts/ab_decode_roofline.py [--iters 200]
"""
import argparse
import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _ladder_kernel(
    pt_ref, sl_ref,
    q_ref, kp_ref, prm_ref, vp_ref,
    o_ref, mo_ref, lo_ref,
    acc_ref, m_ref, l_ref, sc_ref, pv_ref,
    *, head_block, groups, page_size, sm_scale, level, vdot,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    n_blocks = pl.num_programs(2)
    seq_len = sl_ref[b]
    s = page_size
    g = groups
    r_all = head_block * g

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i * s < seq_len)
    def _process():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
        valid = (i * s + lane) < seq_len
        q_all = q_ref[0]
        dh = q_all.shape[1] // 2

        if level >= 1:
            if level >= 2 and vdot == "batched":
                kb = kp_ref[0]  # [Hb, D/2, S]
                k_lo = (kb & 0x0F).astype(jnp.bfloat16)
                k_hi = ((kb.astype(jnp.int32) >> 4) & 0x0F).astype(
                    jnp.bfloat16)
                qh = q_all.reshape(head_block, g, 2, dh)
                sc = jax.lax.dot_general(
                    qh[:, :, 0], k_lo,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    qh[:, :, 1], k_hi,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                sc_ref[:] = sc.reshape(r_all, s)
            else:
                for hh in range(head_block):
                    kb = kp_ref[0, hh]
                    k_lo = (kb & 0x0F).astype(jnp.bfloat16)
                    k_hi = ((kb.astype(jnp.int32) >> 4) & 0x0F).astype(
                        jnp.bfloat16)
                    if level >= 2:
                        q_h = q_all[hh * g : (hh + 1) * g, :]
                        sc_ref[hh * g : (hh + 1) * g, :] = jax.lax.dot_general(
                            q_h[:, :dh], k_lo,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) + jax.lax.dot_general(
                            q_h[:, dh:], k_hi,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    else:
                        # unpack only: cheap touch so it isn't DCE'd
                        sc_ref[hh * g : (hh + 1) * g, :] = (
                            k_lo[0:g, :] + k_hi[0:g, :]
                        ).astype(jnp.float32)

        prm = prm_ref[0]

        def rep(x):
            x = x.astype(jnp.float32)
            if g == 1:
                return x
            return jnp.broadcast_to(
                x[:, None, :], (head_block, g, s)).reshape(r_all, s)

        if level >= 3:
            k_scale = rep(prm[0])
            k_zero = rep(prm[1])
            q_sum = jnp.sum(q_all.astype(jnp.float32), axis=1, keepdims=True)
            scores = (sc_ref[:] * k_scale + q_sum * k_zero) * sm_scale
            scores = jnp.where(valid, scores, _NEG_INF)
            m_prev = m_ref[:, 0:1]
            l_prev = l_ref[:, 0:1]
            m_new = jnp.maximum(
                m_prev, jnp.max(scores, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        if level >= 4:
            v_scale = rep(prm[2])
            v_zero = rep(prm[3])
            pw = p * v_scale
            half = s // 2
            if vdot == "batched":
                vb = vp_ref[0]  # [Hb, S/2, D]
                v_lo = (vb & 0x0F)
                v_hi = ((vb.astype(jnp.int32) >> 4) & 0x0F)
                pwh = pw.reshape(head_block, g, 2, half)
                pv = jax.lax.dot_general(
                    pwh[:, :, 0], v_lo.astype(jnp.float32),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    pwh[:, :, 1], v_hi.astype(jnp.float32),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                pv_ref[:] = pv.reshape(r_all, q_all.shape[1])
            else:
                vdt = jnp.bfloat16 if vdot == "bf16" else jnp.float32
                for hh in range(head_block):
                    vb = vp_ref[0, hh]
                    v_lo = (vb & 0x0F).astype(vdt)
                    v_hi = ((vb.astype(jnp.int32) >> 4) & 0x0F).astype(vdt)
                    pw_h = pw[hh * g : (hh + 1) * g, :].astype(vdt)
                    pv_ref[hh * g : (hh + 1) * g, :] = jax.lax.dot_general(
                        pw_h[:, :half], v_lo,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        pw_h[:, half:], v_hi,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            z_corr = jnp.sum(p * v_zero, axis=1, keepdims=True)
            acc_ref[:] = acc_ref[:] * alpha + pv_ref[:] + z_corr
        elif level >= 3:
            acc_ref[:] = acc_ref[:] * alpha + p[:, 0:1]
        if level >= 3:
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == n_blocks - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0:1], 1e-20)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        mo_ref[0] = m_ref[:]
        lo_ref[0] = l_ref[:]


def build(level, vdot, b, h, hb, g, d, s, max_pages):
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(False)
    sm_scale = 1.0 / math.sqrt(d)
    kernel = functools.partial(
        _ladder_kernel, head_block=hb, groups=g, page_size=s,
        sm_scale=sm_scale, level=level, vdot=vdot,
    )

    def page_of(i_b, i_h, i_p, pt, sl):
        last = jnp.maximum(pl.cdiv(sl[i_b], s) - 1, 0)
        return pt[i_b, jnp.minimum(i_p, last)]

    def run(pt, sl, q, kp, prm, vp):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b, h // hb, max_pages),
                in_specs=[
                    pl.BlockSpec((1, hb * g, d),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                    pl.BlockSpec(
                        (1, hb, d // 2, s),
                        lambda ib, ih, ip, pt, sl: (
                            page_of(ib, ih, ip, pt, sl), ih, 0, 0)),
                    pl.BlockSpec(
                        (1, 4, hb, s),
                        lambda ib, ih, ip, pt, sl: (
                            page_of(ib, ih, ip, pt, sl), 0, ih, 0)),
                    pl.BlockSpec(
                        (1, hb, s // 2, d),
                        lambda ib, ih, ip, pt, sl: (
                            page_of(ib, ih, ip, pt, sl), ih, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, hb * g, d),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                    pl.BlockSpec((1, hb * g, 128),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                    pl.BlockSpec((1, hb * g, 128),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((hb * g, d), jnp.float32),
                    pltpu.VMEM((hb * g, 128), jnp.float32),
                    pltpu.VMEM((hb * g, 128), jnp.float32),
                    pltpu.VMEM((hb * g, s), jnp.float32),
                    pltpu.VMEM((hb * g, d), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, h * g, d), jnp.bfloat16),
                jax.ShapeDtypeStruct((b, h * g, 128), jnp.float32),
                jax.ShapeDtypeStruct((b, h * g, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(pt, sl, q, kp, prm, vp)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    from atom_tpu.utils.compile_cache import enable

    enable()
    from atom_tpu.utils.timing import bench_op

    b, h, d, s, g = args.batch, args.heads, 128, 256, 1
    if args.tiny:
        b, h, s = 8, 8, 128
        args.ctx = 256
    hb = h
    max_pages = -(-args.ctx // s)
    n_pages = b * max_pages + 1
    rng = np.random.default_rng(0)
    pt = jnp.asarray(
        np.arange(1, b * max_pages + 1).reshape(b, max_pages), jnp.int32)
    sl = jnp.full((b,), args.ctx, jnp.int32)
    q = jnp.asarray(rng.normal(size=(b, h * g, d)), jnp.bfloat16)
    kp = jnp.asarray(rng.integers(-128, 128, (n_pages, h, d // 2, s)),
                     jnp.int8)
    prm = jnp.asarray(rng.normal(size=(n_pages, 4, h, s)) ** 2, jnp.bfloat16)
    vp = jnp.asarray(rng.integers(-128, 128, (n_pages, h, s // 2, s and d)),
                     jnp.int8)
    bytes_per_visit = (h * d // 2 * s) + (4 * h * s * 2) + (h * s // 2 * d)
    floor = b * max_pages * bytes_per_visit / 800e9 * 1e6
    print(f"b={b} h={h} ctx={args.ctx} pages/seq={max_pages}; "
          f"DMA floor ~{floor:.1f} us")
    for name, level, vdot in (
        ("L0 stream", 0, "f32"), ("L1 +unpackK", 1, "f32"),
        ("L2 +Kdots", 2, "f32"), ("L3 +softmax", 3, "f32"),
        ("L4 full", 4, "f32"), ("E1 Vbf16", 4, "bf16"),
        ("E2 batched", 4, "batched"),
    ):
        fn = build(level, vdot, b, h, hb, g, d, s, max_pages)
        t = bench_op(fn, [pt, sl, q, kp, prm, vp], perturb_arg=2,
                     iters=args.iters)
        print(f"  {name:12s} {t*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
