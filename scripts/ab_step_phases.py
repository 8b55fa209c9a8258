#!/usr/bin/env python
"""Decompose the 32-layer W4A4 decode step into standalone phase timings.

VERDICT r3 asks for the headline to reach the reference's 2052.8 tok/s and
for w4a4/w8a8 >= 2x; the whole-step burst (bench.py) measures 17.9 ms/step
at bs=32/ctx=512 against a ~7.5 ms HBM roofline.  This script slope-times
each decode-layer phase AT EXACT STEP SHAPES so the gap can be attributed:

  norm_q    rmsnorm + reorder gather + dual-path quant + assemble  (XLA)
  qkv_ring  fused qkv GEMM + RoPE + KV quant + ring store          (Pallas)
  paged     paged decode attention, flushed=ctx                    (Pallas)
  hot       ring suffix attention + merge                          (XLA)
  postattn  reorder_quant -> oGEMM -> norm_q -> gateupGEMM
            -> silu*up quant -> downGEMM + residuals               (mixed)
  head      final norm + W8A16 lm_head + argmax  (once per step)
  embed     token embedding gather + rope tables (once per step)

Per-layer phases are timed over a 32-layer-equivalent chain (bench_op with
n iterations inside one jit; slope of two trip counts removes dispatch).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_step_phases.py
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny geometry CPU syntax check")
    args = ap.parse_args()

    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.models.configs import Arch, ModelConfig
    from atom_tpu.models.nn import rmsnorm, rope_tables
    from atom_tpu.ops import reference as R
    from atom_tpu.ops.kv_hot import (
        hot_attention,
        make_hot,
        merge_attention,
        write_hot,
    )
    from atom_tpu.ops.kv_layout import make_kv_pages_kernel
    from atom_tpu.ops.pallas_decode import (
        paged_decode_attention_rotated,
        paged_ring_decode_attention,
    )
    from atom_tpu.ops.pallas_gemm_packed import (
        assemble_activation,
        packed_w4_gemm_qkv_ring,
    )
    from atom_tpu.ops.pallas_gemm_w4a16 import quantize_w8a16, w8a16_gemm
    from atom_tpu.serving.model import (
        _embed_lookup,
        _post_attn,
        init_serving_params,
    )
    from atom_tpu.utils.timing import bench_op

    b, ctx = args.batch, args.ctx
    if args.smoke:
        ctx = 256
        cfg = ModelConfig(
            arch=Arch.LLAMA, vocab_size=1024, hidden_size=512,
            intermediate_size=1024, num_layers=1, num_heads=4,
            num_kv_heads=4, head_dim=128, max_position_embeddings=2048,
        )
    else:
        cfg = ModelConfig(
            arch=Arch.LLAMA, vocab_size=32000, hidden_size=4096,
            intermediate_size=11008, num_layers=1, num_heads=32,
            num_kv_heads=32, head_dim=128, max_position_embeddings=2048,
        )
    spec = ATOM_W4A4
    d, dh = cfg.hidden_size, cfg.head_dim
    hq = cfg.num_heads
    h = cfg.num_kv_heads
    page = 256
    n_pages_per = -(-ctx // page)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)

    params = init_serving_params(ks[0], cfg, spec)
    lp = params.layers[0]
    x = jax.random.normal(ks[1], (b, d), jnp.float32)
    pos = jnp.full((b,), ctx - 1, jnp.int32)
    cos, sin = rope_tables(pos, dh, cfg.rope_theta)
    sm_scale = dh ** -0.5

    # pre-quantized input for GEMM-only phases
    h_in = R.rmsnorm_reorder_quant(x, lp.ln_attn, lp.attn_reorder, spec)
    a, sa = assemble_activation(h_in)
    sw = jnp.concatenate(
        [lp.wqkv.body_scale, lp.wqkv.keeper_scale[None, :]], axis=0
    )
    hot = make_hot(b, h, dh)
    row = jnp.int32(5)

    # populated ring for hot attention
    kq = R.quantize_kv_asym(
        jax.random.normal(ks[2], (b, h, dh), jnp.float32))
    vq = R.quantize_kv_asym(
        jax.random.normal(ks[3], (b, h, dh), jnp.float32))
    hot_full = write_hot(hot, row, kq, vq)
    n_hot = jnp.full((b,), 16, jnp.int32)

    # paged KV at ctx tokens
    pages = make_kv_pages_kernel(b * n_pages_per + 1, h, page, dh)
    table = jnp.arange(1, b * n_pages_per + 1, dtype=jnp.int32).reshape(
        b, n_pages_per)
    lens = jnp.full((b,), ctx, jnp.int32)
    q_in = jax.random.normal(ks[4], (b, hq, dh), jnp.float32)

    from atom_tpu.serving.model import quantize_lm_head

    head_w = quantize_lm_head(params, bits=8).lm_head
    ids = jnp.ones((b,), jnp.int32)

    results = {}

    def timed(name, fn, fixed, perturb_arg, n=args.iters):
        t = bench_op(fn, fixed, perturb_arg=perturb_arg, iters=n)
        results[name] = t
        print(f"  {name:10s} {t*1e6:9.2f} us", flush=True)
        return t

    print(f"phases at bs={b} ctx={ctx} (7B layer geometry)", flush=True)

    def f_norm_q(xx):
        qa = R.rmsnorm_reorder_quant(xx, lp.ln_attn, lp.attn_reorder, spec)
        aa, ss = assemble_activation(qa)
        return aa, ss
    timed("norm_q", f_norm_q, [x], 0)

    def f_qkv_ring(aa, ss):
        return packed_w4_gemm_qkv_ring(
            aa, lp.wqkv.body_packed, lp.wqkv.keeper, ss, sw,
            cos.astype(jnp.float32), sin.astype(jnp.float32),
            hot.k_codes, hot.prm, hot.v_codes, row,
            n_q=hq * dh, n_kv=h * dh, head_dim=dh,
        )
    timed("qkv_ring", f_qkv_ring, [a, sa], 1)

    def f_paged(qq):
        return paged_decode_attention_rotated(
            qq, pages, table, lens, return_state=True,
            out_dtype=jnp.float32)
    timed("paged", f_paged, [q_in], 0, n=200)

    def f_paged_ring(qq):  # the round-3 merged kernel (production path)
        return paged_ring_decode_attention(
            qq, pages, table, lens, hot_full, n_hot, row)
    timed("paged_ring", f_paged_ring, [q_in], 0, n=200)

    out1, m1, l1 = f_paged(q_in)

    def f_hot(qq):
        o2, m2, l2 = hot_attention(qq, hot_full, n_hot, row, sm_scale)
        return merge_attention(out1, m1, l1, o2, m2, l2).reshape(b, hq * dh)
    timed("hot_merge", f_hot, [q_in], 0)

    attn = f_hot(q_in)

    def f_postattn(xx, at):
        return _post_attn(xx, at, lp, spec)
    timed("postattn", f_postattn, [x, attn], 0)

    # sub-splits of postattn
    def f_oproj(at):
        a_in = R.reorder_quant(at, lp.o_reorder, spec)
        from atom_tpu.ops.pallas_gemm_packed import quant_gemm_packed
        return quant_gemm_packed(a_in, lp.wo)
    timed("  o_rq+gemm", f_oproj, [attn], 0)

    m_in = R.rmsnorm_reorder_quant(x, lp.ln_mlp, lp.mlp_reorder, spec)

    def f_gateup(xx):
        qa = R.rmsnorm_reorder_quant(xx, lp.ln_mlp, lp.mlp_reorder, spec)
        from atom_tpu.ops.pallas_gemm_packed import quant_gemm_packed
        return quant_gemm_packed(qa, lp.wgateup, out_dtype=jnp.float32)
    timed("  nq+gugemm", f_gateup, [x], 0)

    gu = f_gateup(x)

    def f_down(g_):
        inter = g_.shape[1] // 2
        act = jax.nn.silu(g_[:, :inter]) * g_[:, inter:]
        from atom_tpu.ops.formats import quantize_activation_packed
        from atom_tpu.ops.pallas_gemm_packed import quant_gemm_packed
        d_in = quantize_activation_packed(act, spec)
        return quant_gemm_packed(d_in, lp.wdown)
    timed("  act+down", f_down, [gu], 0)

    def f_head(xx):
        y = rmsnorm(xx, params.final_norm, cfg.norm_eps)
        logits = w8a16_gemm(y.astype(jnp.bfloat16), head_w,
                            out_dtype=jnp.float32)[:, : cfg.vocab_size]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    timed("head", f_head, [x], 0, n=100)

    def f_embed(xx):
        # indices derive from the perturbed input (+0 at runtime) so the
        # gather and rope tables cannot be LICM-hoisted out of the loop
        j = (xx[:, 0] * 1e-30).astype(jnp.int32)
        e = _embed_lookup(params.embed, ids + j)
        c2, s2 = rope_tables(pos + j, dh, cfg.rope_theta)
        return e, c2, s2
    timed("embed", f_embed, [x], 0)

    # --- in-situ layer cost (round 5): the isolated phases above can
    # pipeline across bench_op iterations in ways the real serialized step
    # cannot, so ALSO time the full production decode_hidden at 1 and 2
    # layers; (dh2 - dh1) is the true marginal per-layer cost INCLUDING the
    # inter-kernel stitching the phase sum misses.
    from atom_tpu.serving.model import decode_hidden, make_serving_state

    def dh_phase(n_layers):
        cfgn = cfg.replace(num_layers=n_layers)
        pn = init_serving_params(ks[5], cfgn, spec)
        staten = make_serving_state(
            n_layers, b * n_pages_per + 1, b, h, page, dh
        )
        staten = staten._replace(
            flushed=jnp.full((b,), ctx, jnp.int32), row=jnp.int32(5)
        )

        def f(emb):
            p2 = pn._replace(embed=emb)
            x2, st2 = decode_hidden(
                p2, staten, ids, table, lens, cfgn, spec
            )
            # keep the ring stores live without summing the page arrays
            # (their jnp.sum would add ~140 MB of fake traffic per iter)
            return (x2, st2.hot[0].k_codes, st2.hot[0].prm,
                    st2.hot[0].v_codes)

        return bench_op(f, [pn.embed], perturb_arg=0, iters=100)

    t1 = dh_phase(1)
    t2 = dh_phase(2)
    marginal = t2 - t1
    print(f"\n  decode_hidden 1L {t1*1e6:9.2f} us, 2L {t2*1e6:9.2f} us "
          f"-> in-situ marginal layer {marginal*1e6:9.2f} us")
    print(f"  in-situ predicted step: {(marginal*32 + (t1 - marginal) + results['head'])*1e3:.2f} ms "
          f"(isolated-phase prediction below)")

    # Production decode layer (round 3+) runs ONE merged paged+ring kernel;
    # the split paged + hot_merge rows are the pre-round-3 layer, kept for
    # the A/B.  (The in-kernel norm/quant prologues and the one-kernel MLP
    # are timed separately in scripts/ab_fused_mlp.py.)
    per_layer = (results["norm_q"] + results["qkv_ring"]
                 + results["paged_ring"] + results["postattn"])
    per_layer_split = (results["norm_q"] + results["qkv_ring"]
                       + results["paged"] + results["hot_merge"]
                       + results["postattn"])
    step = per_layer * 32 + results["head"] + results["embed"]
    print(f"\nper-layer sum (merged attn, production): {per_layer*1e6:.1f} us "
          f"(x32 = {per_layer*32e3:.2f} ms); "
          f"split-attn layer: {per_layer_split*1e6:.1f} us")
    print(f"predicted step: {step*1e3:.2f} ms "
          f"-> {b/step:.0f} tok/s (bench.py measured 17.88 ms / 1789 tok/s)")
    print("unaccounted = measured - predicted = XLA stitching between phases")


if __name__ == "__main__":
    main()
