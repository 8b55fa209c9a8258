#!/usr/bin/env python
"""A/B: merged paged+ring decode-kernel variants (round-3 follow-up to
ab_decode_v3; the production kernel is now ``paged_ring_decode_attention``).

The v2 kernel measured ~155 us at bs32/ctx512 vs a ~92 us DMA floor — the
residual is per-iteration compute (64 skinny per-head MXU dots per page) and
per-grid-step overhead.  Variants attack both:

  base     production merged kernel (ring folded into grid step 0)
  blkdiag  page-step scores/PV as ONE block-diagonal MXU dot over all heads
           (the ring step's trick applied to pages): q expands to
           [Hb, Hb*D/2] with each head's channels in its own lane block,
           K flattens to [Hb*D/2, S] — 2 dots/page instead of 64
  pair     TWO pages per grid step (2 sets of page blocks, maps 2i / 2i+1)
           — halves the grid, so per-step fixed overhead amortizes
  both     blkdiag + pair
  dma      DMA floor (touch all blocks, no math)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_decode_v4.py
     [--ctx 512] [--variants base,blkdiag,pair,both,dma] [--hb 32]
Numerics: every variant is checked against the production kernel first
(rtol 2e-2 — bf16 dot order differs between variants).
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

B, H, D, S, W = 32, 32, 128, 256, 32
NEG = -1e30


def _ring_step(q_all, hk_ref, hprm_ref, hv_ref, nh, row, sm_scale,
               acc_ref, m_ref, l_ref, hb):
    """Production ring pseudo-page step (G=1)."""
    w = hk_ref.shape[3]
    d = hv_ref.shape[3]
    half = d // 2
    ku = hk_ref[0].astype(jnp.uint8)
    k_lo = (ku & 0x0F).astype(jnp.bfloat16).reshape(hb * half, w)
    k_hi = (ku >> 4).astype(jnp.bfloat16).reshape(hb * half, w)
    sub = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * half), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * half), 1)
    blk = (lane // half) == sub
    q_lo = jnp.where(blk, jnp.concatenate([q_all[:, :half]] * hb, 1), 0
                     ).astype(jnp.bfloat16)
    q_hi = jnp.where(blk, jnp.concatenate([q_all[:, half:]] * hb, 1), 0
                     ).astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        q_lo, k_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        q_hi, k_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    prm = hprm_ref[0].astype(jnp.float32)
    q_sum = jnp.sum(q_all.astype(jnp.float32), axis=1, keepdims=True)
    scores = (dots * prm[0] + q_sum * prm[1]) * sm_scale
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    age = jax.lax.rem(row - cols + w, w)
    valid = age < nh
    scores = jnp.where(valid, scores, NEG)
    m_new = jnp.max(scores, axis=1, keepdims=True)
    m_new = jnp.maximum(m_new, NEG)
    p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
    l_new = jnp.sum(p, axis=1, keepdims=True)
    pw = p * prm[2]
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * w), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * w), 1)
    p_sel = jnp.where((lane2 // w) == sub2,
                      jnp.concatenate([pw] * hb, 1), 0.0)
    v_flat = hv_ref[0].astype(jnp.float32).reshape(hb * w, d)
    pv = jax.lax.dot_general(
        p_sel, v_flat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z = jnp.sum(p * prm[3], axis=1, keepdims=True)
    acc_ref[:] = pv + z
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)


def _page_math(q_all, kb, prmb, vb, pos0, seq_len, sm_scale,
               acc_ref, m_ref, l_ref, hb, s, blkdiag):
    """One page's online-softmax update.  kb [hb, D/2, S]; vb [hb, S/2, D];
    prmb [4, hb, S]."""
    dh = D // 2
    half = s // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    valid = (pos0 + lane) < seq_len

    if blkdiag:
        k_lo = (kb.astype(jnp.uint8) & 0x0F).astype(jnp.bfloat16
                                                    ).reshape(hb * dh, s)
        k_hi = (kb.astype(jnp.uint8) >> 4).astype(jnp.bfloat16
                                                  ).reshape(hb * dh, s)
        sub = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * dh), 0)
        ln = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * dh), 1)
        blk = (ln // dh) == sub
        q_lo = jnp.where(blk, jnp.concatenate([q_all[:, :dh]] * hb, 1), 0
                         ).astype(jnp.bfloat16)
        q_hi = jnp.where(blk, jnp.concatenate([q_all[:, dh:]] * hb, 1), 0
                         ).astype(jnp.bfloat16)
        sc = jax.lax.dot_general(
            q_lo, k_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            q_hi, k_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        sc_rows = []
        for hh in range(hb):
            kbl = kb[hh]
            k_lo = (kbl.astype(jnp.uint8) & 0x0F).astype(jnp.bfloat16)
            k_hi = (kbl.astype(jnp.uint8) >> 4).astype(jnp.bfloat16)
            q_h = q_all[hh:hh + 1, :]
            sc_rows.append(jax.lax.dot_general(
                q_h[:, :dh], k_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                q_h[:, dh:], k_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        sc = jnp.concatenate(sc_rows, axis=0)

    prm = prmb.astype(jnp.float32)
    q_sum = jnp.sum(q_all.astype(jnp.float32), axis=1, keepdims=True)
    scores = (sc * prm[0] + q_sum * prm[1]) * sm_scale
    scores = jnp.where(valid, scores, NEG)

    m_prev = m_ref[:, 0:1]
    l_prev = l_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    pw = p * prm[2]
    if blkdiag:
        v_lo = (vb.astype(jnp.uint8) & 0x0F).astype(jnp.float32
                                                    ).reshape(hb * half, D)
        v_hi = (vb.astype(jnp.uint8) >> 4).astype(jnp.float32
                                                  ).reshape(hb * half, D)
        sub2 = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * half), 0)
        ln2 = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * half), 1)
        blk2 = (ln2 // half) == sub2
        p_lo = jnp.where(blk2, jnp.concatenate([pw[:, :half]] * hb, 1), 0.0)
        p_hi = jnp.where(blk2, jnp.concatenate([pw[:, half:]] * hb, 1), 0.0)
        pv = jax.lax.dot_general(
            p_lo, v_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            p_hi, v_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        pv_rows = []
        for hh in range(hb):
            vbl = vb[hh]
            v_lo = (vbl.astype(jnp.uint8) & 0x0F).astype(jnp.float32)
            v_hi = (vbl.astype(jnp.uint8) >> 4).astype(jnp.float32)
            pw_h = pw[hh:hh + 1, :]
            pv_rows.append(jax.lax.dot_general(
                pw_h[:, :half], v_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                pw_h[:, half:], v_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        pv = jnp.concatenate(pv_rows, axis=0)

    z = jnp.sum(p * prm[3], axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + pv + z
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)


def make_fn(hb: int, blkdiag: bool, pair: bool, dma_only: bool = False):
    n_page_sets = 2 if pair else 1

    def kern(pt_ref, sl_ref, nh_ref, row_ref, q_ref, *rest):
        page_refs = rest[: 3 * n_page_sets]
        hk_ref, hprm_ref, hv_ref = rest[3 * n_page_sets: 3 * n_page_sets + 3]
        o_ref = rest[3 * n_page_sets + 3]
        acc_ref, m_ref, l_ref = rest[3 * n_page_sets + 4:]
        b = pl.program_id(0)
        i = pl.program_id(2)
        n_blocks = pl.num_programs(2)
        seq_len = sl_ref[b]
        q_all = q_ref[0]

        if dma_only:
            @pl.when(i == 0)
            def _init():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            @pl.when(i * n_page_sets * S < seq_len)
            def _touch():
                t = (jnp.sum(hk_ref[:].astype(jnp.float32))
                     + jnp.sum(hv_ref[:].astype(jnp.float32)))
                for r in page_refs:
                    t += jnp.sum(r[:].astype(jnp.float32))
                acc_ref[:, 0:1] += t

            @pl.when(i == n_blocks - 1)
            def _fin():
                o_ref[0] = acc_ref[:].astype(o_ref.dtype)
            return

        @pl.when(i == 0)
        def _ring():
            _ring_step(q_all, hk_ref, hprm_ref, hv_ref, nh_ref[b],
                       row_ref[0], 1.0 / math.sqrt(D), acc_ref, m_ref,
                       l_ref, hb)

        for pset in range(n_page_sets):
            pos0 = (i * n_page_sets + pset) * S

            @pl.when(pos0 < seq_len)
            def _page(pset=pset, pos0=pos0):
                kb, prmb, vb = page_refs[3 * pset: 3 * pset + 3]
                _page_math(q_all, kb[0], prmb[0], vb[0], pos0, seq_len,
                           1.0 / math.sqrt(D), acc_ref, m_ref, l_ref,
                           hb, S, blkdiag)

        @pl.when(i == n_blocks - 1)
        def _store():
            l_fin = jnp.maximum(l_ref[:, 0:1], 1e-20)
            o_ref[0] = (acc_ref[:] / l_fin).astype(o_ref.dtype)

    from atom_tpu.ops.runtime import interpret_default

    @jax.jit
    def fn(q, kp, prm, vp, hk, hprm, hv, page_table, seq_lens, n_hot, row):
        b, hq, d = q.shape
        max_pages = page_table.shape[1]

        def page_of(k, i_b, i_p, pt, sl, nh, rw):
            last = jnp.maximum(pl.cdiv(sl[i_b], S) - 1, 0)
            return pt[i_b, jnp.minimum(i_p * n_page_sets + k, last)]

        def pset_specs(k):
            return [
                pl.BlockSpec((1, hb, d // 2, S),
                             lambda ib, ih, ip, *r, k=k:
                             (page_of(k, ib, ip, *r), ih, 0, 0)),
                pl.BlockSpec((1, 4, hb, S),
                             lambda ib, ih, ip, *r, k=k:
                             (page_of(k, ib, ip, *r), 0, ih, 0)),
                pl.BlockSpec((1, hb, S // 2, d),
                             lambda ib, ih, ip, *r, k=k:
                             (page_of(k, ib, ip, *r), ih, 0, 0)),
            ]

        in_specs = [pl.BlockSpec((1, hb, d), lambda ib, ih, ip, *r: (ib, ih, 0))]
        page_ins = []
        for k in range(n_page_sets):
            in_specs += pset_specs(k)
            page_ins += [kp, prm, vp]
        in_specs += [
            pl.BlockSpec((1, hb, d // 2, W), lambda ib, ih, ip, *r: (ib, ih, 0, 0)),
            pl.BlockSpec((1, 4, hb, W), lambda ib, ih, ip, *r: (ib, 0, ih, 0)),
            pl.BlockSpec((1, hb, W, d), lambda ib, ih, ip, *r: (ib, ih, 0, 0)),
        ]
        grid = (b, H // hb, -(-max_pages // n_page_sets))
        (out,) = pl.pallas_call(
            functools.partial(kern),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4, grid=grid,
                in_specs=in_specs,
                out_specs=[pl.BlockSpec((1, hb, d),
                                        lambda ib, ih, ip, *r: (ib, ih, 0))],
                scratch_shapes=[
                    pltpu.VMEM((hb, d), jnp.float32),
                    pltpu.VMEM((hb, 128), jnp.float32),
                    pltpu.VMEM((hb, 128), jnp.float32),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((b, hq, d), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            interpret=interpret_default(False),
        )(page_table, seq_lens, n_hot, jnp.asarray(row, jnp.int32).reshape(1),
          q, *page_ins, hk, hprm, hv)
        return out

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--hb", type=int, default=32)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--variants", type=str,
                    default="base,blkdiag,pair,both,dma")
    args = ap.parse_args()

    from atom_tpu.ops import reference as R
    from atom_tpu.ops.kv_hot import make_hot, write_hot
    from atom_tpu.ops.kv_layout import (
        append_kv_prefill_kernel, make_kv_pages_kernel,
    )
    from atom_tpu.ops.pallas_decode import paged_ring_decode_attention

    ctx = args.ctx
    npp = -(-ctx // S)
    key = jax.random.PRNGKey(0)
    pages = make_kv_pages_kernel(B * npp + 1, H, S, D)
    table = jnp.arange(1, B * npp + 1, dtype=jnp.int32).reshape(B, npp)
    for s_i in range(B):
        kv = jax.random.normal(jax.random.fold_in(key, s_i), (ctx, H, D))
        vv = jnp.roll(kv, 1, axis=0) * 0.5
        kq, vq = R.quantize_kv_asym(kv), R.quantize_kv_asym(vv)
        for p_i in range(npp):
            lo = p_i * S
            n_tok = min(S, ctx - lo)
            pages = append_kv_prefill_kernel(
                pages,
                R.KVQuant(kq.codes[lo:lo + n_tok], kq.params[lo:lo + n_tok]),
                R.KVQuant(vq.codes[lo:lo + n_tok], vq.params[lo:lo + n_tok]),
                jnp.asarray([int(table[s_i, p_i]), 0], jnp.int32),
            )
    hot = make_hot(B, H, D, W)
    row = jnp.int32(13)
    for age in range(14):
        col = (13 - age) % W
        kj = jax.random.normal(jax.random.fold_in(key, 700 + col), (B, H, D))
        hot = write_hot(hot, jnp.int32(col), R.quantize_kv_asym(kj),
                        R.quantize_kv_asym(-kj * 0.25))
    n_hot = jnp.full((B,), 14, jnp.int32)
    lens = jnp.full((B,), ctx, jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(9), (B, H, D), jnp.float32)

    want = np.asarray(paged_ring_decode_attention(
        q, pages, table, lens, hot, n_hot, row), np.float32)

    specs = {
        "base": dict(blkdiag=False, pair=False),
        "blkdiag": dict(blkdiag=True, pair=False),
        "pair": dict(blkdiag=False, pair=True),
        "both": dict(blkdiag=True, pair=True),
        "dma": dict(blkdiag=False, pair=False, dma_only=True),
    }
    for name in args.variants.split(","):
        fn = make_fn(args.hb, **specs[name])
        arglist = [q, pages.k_pages, pages.params, pages.v_pages,
                   hot.k_codes, hot.prm, hot.v_codes, table, lens, n_hot, row]
        got = np.asarray(fn(*arglist), np.float32)
        if name != "dma":
            # bf16 dot-order differences leave ~1e-4 abs noise; the check
            # is against real divergence, not rounding
            ok = np.allclose(got, want, rtol=2e-2, atol=2e-3)
            err = np.abs(got - want)
            status = "OK" if ok else f"FAIL abs {err.max():.2e}"
        else:
            status = "-"
        t = bench_op(lambda qq: fn(qq, *arglist[1:]), [q], iters=args.iters)
        print(f"{name:8s} {t*1e6:8.1f} us   parity {status}", flush=True)


if __name__ == "__main__":
    main()
