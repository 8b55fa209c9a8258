"""Interleaved A/B harness for paged-decode-attention kernel variants.

The tunneled TPU is shared, so single measurements are unusable; this
alternates variants and reports the MIN over rounds (robust to contention).
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_decode_kernel.py
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atom_tpu.utils.timing import bench_op


def make_fn_p2(hb: int = 16):
    """Two pages per grid step: one softmax update over 2S lanes, half the
    grid steps; both page blocks clamp independently so short sequences
    don't over-fetch."""
    def kern(pt_ref, sl_ref, q_ref,
             kp0, kprm0, vp0, vprm0, kp1, kprm1, vp1, vprm1,
             o_ref, mo_ref, lo_ref, acc_ref, m_ref, l_ref,
             *, head_block, groups, page_size, sm_scale):
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

        @pl.when(i * 2 * s < seq_len)
        def _proc():
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * s), 1)
            valid = (i * 2 * s + lane2) < seq_len  # [1, 2S]
            for hh in range(head_block):
                r0 = hh * groups
                q_h = q_ref[0, r0:r0 + groups, :].astype(jnp.float32)
                q_sum = jnp.sum(q_h, axis=1, keepdims=True)
                dh = q_h.shape[1] // 2
                dots = []
                scs = []
                zrs = []
                for kp, kprm in ((kp0, kprm0), (kp1, kprm1)):
                    kb = kp[0, hh].astype(jnp.int32)
                    k_lo = (kb & 0x0F).astype(jnp.float32)
                    k_hi = ((kb >> 4) & 0x0F).astype(jnp.float32)
                    dots.append(jax.lax.dot_general(
                        q_h[:, :dh], k_lo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        q_h[:, dh:], k_hi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                    scs.append(kprm[0, hh, 0:1, :])
                    zrs.append(kprm[0, hh, 1:2, :])
                dot = jnp.concatenate(dots, axis=1)         # [G, 2S]
                k_scale = jnp.concatenate(scs, axis=1)
                k_zero = jnp.concatenate(zrs, axis=1)
                scores = (dot * k_scale + q_sum * k_zero) * sm_scale
                scores = jnp.where(valid, scores, -1e30)
                m_prev = m_ref[r0:r0 + groups, 0:1]
                l_prev = l_ref[r0:r0 + groups, 0:1]
                m_new = jnp.maximum(
                    m_prev, jnp.max(scores, axis=1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
                l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
                pv = jnp.zeros((groups, q_h.shape[1]), jnp.float32)
                z_corr = jnp.zeros((groups, 1), jnp.float32)
                for pi, (vp, vprm) in enumerate(
                        ((vp0, vprm0), (vp1, vprm1))):
                    vb = vp[0, hh].astype(jnp.int32)
                    v_lo = (vb & 0x0F).astype(jnp.float32)
                    v_hi = ((vb >> 4) & 0x0F).astype(jnp.float32)
                    p_pg = p[:, pi * s:(pi + 1) * s]
                    pw = p_pg * vprm[0, hh, 0:1, :]
                    half = s // 2
                    pv = pv + jax.lax.dot_general(
                        pw[:, :half], v_lo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        pw[:, half:], v_hi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    z_corr = z_corr + jnp.sum(
                        p_pg * vprm[0, hh, 1:2, :], axis=1, keepdims=True)
                acc_ref[r0:r0 + groups, :] = (
                    acc_ref[r0:r0 + groups, :] * alpha + pv + z_corr)
                m_ref[r0:r0 + groups, :] = jnp.broadcast_to(
                    m_new, (groups, m_ref.shape[1]))
                l_ref[r0:r0 + groups, :] = jnp.broadcast_to(
                    l_new, (groups, l_ref.shape[1]))

        @pl.when(i == n_blocks - 1)
        def _fin():
            l = jnp.maximum(l_ref[:, 0:1], 1e-20)
            o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
            mo_ref[0] = m_ref[:]
            lo_ref[0] = l_ref[:]

    @jax.jit
    def fn(q, kp, kprm, vp, vprm, page_table, seq_lens):
        b, hq, d = q.shape
        h = kp.shape[1]
        s = kp.shape[3]
        groups = hq // h
        max_pages = page_table.shape[1]
        n2 = -(-max_pages // 2)
        sm_scale = 1.0 / math.sqrt(d)

        def page_of(k):
            def f(i_b, i_h, i_p, pt, sl):
                last = jnp.maximum(pl.cdiv(sl[i_b], s) - 1, 0)
                return pt[i_b, jnp.minimum(2 * i_p + k, last)]
            return f

        grid = (b, h // hb, n2)
        kk = functools.partial(kern, head_block=hb, groups=groups,
                               page_size=s, sm_scale=sm_scale)
        pg_specs = lambda k: [
            pl.BlockSpec((1, hb, d // 2, s),
                         lambda ib, ih, ip, pt, sl, k=k: (page_of(k)(ib, ih, ip, pt, sl), ih, 0, 0)),
            pl.BlockSpec((1, hb, 2, s),
                         lambda ib, ih, ip, pt, sl, k=k: (page_of(k)(ib, ih, ip, pt, sl), ih, 0, 0)),
            pl.BlockSpec((1, hb, s // 2, d),
                         lambda ib, ih, ip, pt, sl, k=k: (page_of(k)(ib, ih, ip, pt, sl), ih, 0, 0)),
            pl.BlockSpec((1, hb, 2, s),
                         lambda ib, ih, ip, pt, sl, k=k: (page_of(k)(ib, ih, ip, pt, sl), ih, 0, 0)),
        ]
        out, m, l = pl.pallas_call(
            kk,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=grid,
                in_specs=[
                    pl.BlockSpec((1, hb * groups, d),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                ] + pg_specs(0) + pg_specs(1),
                out_specs=[
                    pl.BlockSpec((1, hb * groups, d),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                    pl.BlockSpec((1, hb * groups, 128),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                    pl.BlockSpec((1, hb * groups, 128),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((hb * groups, d), jnp.float32),
                    pltpu.VMEM((hb * groups, 128), jnp.float32),
                    pltpu.VMEM((hb * groups, 128), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, hq, d), jnp.bfloat16),
                jax.ShapeDtypeStruct((b, hq, 128), jnp.float32),
                jax.ShapeDtypeStruct((b, hq, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(page_table, seq_lens, q,
          kp, kprm, vp, vprm, kp, kprm, vp, vprm)
        return out

    return fn


def make_fn(variant: str, hb: int = 16):
    if variant == "p2":
        return make_fn_p2(hb)
    def kern(pt_ref, sl_ref, q_ref, kp_ref, kprm_ref, vp_ref, vprm_ref,
             o_ref, mo_ref, lo_ref, acc_ref, m_ref, l_ref,
             *, head_block, groups, page_size, sm_scale):
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

        @pl.when(i * s < seq_len)
        def _proc():
            if variant == "dma":
                # DMA floor: touch every input block with minimal VPU work.
                acc_ref[:, 0:1] += (
                    jnp.sum(kp_ref[:].astype(jnp.float32))
                    + jnp.sum(vp_ref[:].astype(jnp.float32))
                    + jnp.sum(kprm_ref[:]) + jnp.sum(vprm_ref[:])
                    + jnp.sum(q_ref[:].astype(jnp.float32))
                )
                return
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
            valid = (i * s + lane) < seq_len
            ft = jnp.bfloat16 if variant == "bf16" else jnp.float32
            if variant == "blockunpack":
                kb_all = kp_ref[0].astype(jnp.int32)   # [hb, D/2, S]
                k_lo_all = (kb_all & 0x0F).astype(jnp.float32)
                k_hi_all = ((kb_all >> 4) & 0x0F).astype(jnp.float32)
                vb_all = vp_ref[0].astype(jnp.int32)   # [hb, S/2, D]
                v_lo_all = (vb_all & 0x0F).astype(jnp.float32)
                v_hi_all = ((vb_all >> 4) & 0x0F).astype(jnp.float32)
            reps = 2 if variant == "split2x" else 1
            for hh in list(range(head_block)) * reps:
                if variant == "blockunpack":
                    k_lo, k_hi = k_lo_all[hh], k_hi_all[hh]
                else:
                    kb = kp_ref[0, hh].astype(jnp.int32)
                    k_lo = (kb & 0x0F).astype(ft)
                    k_hi = ((kb >> 4) & 0x0F).astype(ft)
                r0 = hh * groups
                q_h = q_ref[0, r0:r0 + groups, :].astype(ft)
                q_sum = jnp.sum(q_h.astype(jnp.float32), axis=1, keepdims=True)
                dh = q_h.shape[1] // 2
                if variant == "concat":
                    k_codes = jnp.concatenate([k_lo, k_hi], axis=0)
                    dot = jax.lax.dot_general(
                        q_h, k_codes, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    dot = jax.lax.dot_general(
                        q_h[:, :dh], k_lo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        q_h[:, dh:], k_hi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                k_scale = kprm_ref[0, hh, 0:1, :]
                k_zero = kprm_ref[0, hh, 1:2, :]
                scores = (dot * k_scale + q_sum * k_zero) * sm_scale
                scores = jnp.where(valid, scores, -1e30)
                m_prev = m_ref[r0:r0 + groups, 0:1]
                l_prev = l_ref[r0:r0 + groups, 0:1]
                m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
                l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
                if variant == "blockunpack":
                    v_lo, v_hi = v_lo_all[hh], v_hi_all[hh]
                else:
                    vb = vp_ref[0, hh].astype(jnp.int32)
                    v_lo = (vb & 0x0F).astype(ft)
                    v_hi = ((vb >> 4) & 0x0F).astype(ft)
                v_scale = vprm_ref[0, hh, 0:1, :]
                v_zero = vprm_ref[0, hh, 1:2, :]
                pw = (p * v_scale).astype(ft)
                half = pw.shape[1] // 2
                if variant == "concat":
                    v_codes = jnp.concatenate([v_lo, v_hi], axis=0)
                    pv = jax.lax.dot_general(
                        pw, v_codes, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    pv = jax.lax.dot_general(
                        pw[:, :half], v_lo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        pw[:, half:], v_hi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                z_corr = jnp.sum(p * v_zero, axis=1, keepdims=True)
                acc_ref[r0:r0 + groups, :] = (
                    acc_ref[r0:r0 + groups, :] * alpha + pv + z_corr)
                m_ref[r0:r0 + groups, :] = jnp.broadcast_to(
                    m_new, (groups, m_ref.shape[1]))
                l_ref[r0:r0 + groups, :] = jnp.broadcast_to(
                    l_new, (groups, l_ref.shape[1]))

        @pl.when(i == n_blocks - 1)
        def _fin():
            l = jnp.maximum(l_ref[:, 0:1], 1e-20)
            o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
            mo_ref[0] = m_ref[:]
            lo_ref[0] = l_ref[:]

    @jax.jit
    def fn(q, kp, kprm, vp, vprm, page_table, seq_lens):
        b, hq, d = q.shape
        h = kp.shape[1]
        s = kp.shape[3]
        groups = hq // h
        max_pages = page_table.shape[1]
        sm_scale = 1.0 / math.sqrt(d)

        if variant == "noclamp":
            # straight page-table walk: isolates the cost of the clamped
            # (revisit-dedup) index map; valid only when all seqs are full
            def page_of(i_b, i_h, i_p, pt, sl):
                return pt[i_b, i_p]
        else:
            def page_of(i_b, i_h, i_p, pt, sl):
                last = jnp.maximum(pl.cdiv(sl[i_b], s) - 1, 0)
                return pt[i_b, jnp.minimum(i_p, last)]

        grid = (b, h // hb, max_pages)
        kk = functools.partial(kern, head_block=hb, groups=groups,
                               page_size=s, sm_scale=sm_scale)
        out, m, l = pl.pallas_call(
            kk,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=grid,
                in_specs=[
                    pl.BlockSpec((1, hb * groups, d),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                    pl.BlockSpec((1, hb, d // 2, s),
                                 lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), ih, 0, 0)),
                    pl.BlockSpec((1, hb, 2, s),
                                 lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), ih, 0, 0)),
                    pl.BlockSpec((1, hb, s // 2, d),
                                 lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), ih, 0, 0)),
                    pl.BlockSpec((1, hb, 2, s),
                                 lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), ih, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, hb * groups, d),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                    pl.BlockSpec((1, hb * groups, 128),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                    pl.BlockSpec((1, hb * groups, 128),
                                 lambda ib, ih, ip, pt, sl: (ib, ih, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((hb * groups, d), jnp.float32),
                    pltpu.VMEM((hb * groups, 128), jnp.float32),
                    pltpu.VMEM((hb * groups, 128), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, hq, d), jnp.bfloat16),
                jax.ShapeDtypeStruct((b, hq, 128), jnp.float32),
                jax.ShapeDtypeStruct((b, hq, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(page_table, seq_lens, q, kp, kprm, vp, vprm)
        return out

    return fn


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--variants", default="concat,split,bf16")
    args = ap.parse_args()

    key = jax.random.PRNGKey(2)
    B, H, D, S = 32, 32, 128, 256
    ctx = args.ctx
    maxp = ctx // S
    n_pages = B * maxp + 1
    # This script predates the dense-params KVPages layout (b59dd50 merged
    # the four param planes into params [P,4,H,S]); build the old-layout
    # inputs it was written against explicitly.
    k_pages = jnp.zeros((n_pages, H, D // 2, S), jnp.int8)
    k_params = jnp.zeros((n_pages, H, 2, S), jnp.float32)
    v_pages = jnp.zeros((n_pages, H, S // 2, D), jnp.int8)
    v_params = jnp.zeros((n_pages, H, 2, S), jnp.float32)
    table = jnp.arange(1, n_pages).reshape(B, maxp).astype(jnp.int32)
    lens = jnp.full((B,), ctx, jnp.int32)
    q = jax.random.normal(key, (B, H, D), jnp.bfloat16)
    kv = B * ctx * H * D + B * ctx * H * 16

    specs = []
    for v in args.variants.split(","):
        if ":" in v:
            name, hb = v.split(":")
            specs.append((v, make_fn(name, int(hb))))
        else:
            specs.append((v, make_fn(v)))
    best = {v: float("inf") for v, _ in specs}
    for rnd in range(args.rounds):
        for v, fn in specs:
            dt = bench_op(
                lambda q_: fn(q_, k_pages, k_params,
                              v_pages, v_params, table, lens),
                [q], iters=args.iters)
            best[v] = min(best[v], dt)
            print(f"rnd{rnd} {v:10s}: {dt * 1e6:7.1f} us", flush=True)
    print("--- min over rounds ---")
    for v, dt in best.items():
        print(f"{v:10s}: {dt * 1e6:7.1f} us  {kv / dt / 1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
