"""Pallas TPU kernels: paged INT4 decode attention + bulk hot-ring flush.

The per-token hot path of serving — TPU-first redesign of the reference's
FlashInfer fork (``BatchDecodeWithPagedKVCacheKernel``,
``kernels/include/flashinfer/decode.cuh:492-851``):

  * K/V stream from HBM as 4-bit nibble planes (``kv_layout.KVPages``) and
    feed the MXU as RAW codes — attention HBM traffic is genuinely
    4 bits/element (the CUDA analog is ``cast_load`` + 8-per-u32 unpack,
    ``quantization.cuh:66-80``).
  * K pages are CHANNEL-major ([P, H, D/2, S]) so the q.K^T score dot is a
    standard-orientation MXU dot per head — every other arrangement measured
    slower on v5e (slot-major K needs a [S, D] -> [D, S] relayout per head:
    ~+2us per grid step; int8 dots and whole-block VPU reductions also lost).
  * K is stored POST-RoPE (rotated in f32 right before quantization), so the
    kernel does no trigonometry.  The reference stores pre-RoPE and rotates
    after dequant (``decode.cuh:92-126``) because its calibration quantizes
    pre-RoPE; same bit budget either way.
  * K is never dequantized: with per-slot affine params
    ``k_s = c_s * scale_s + zero_s``,
        q . k_s = (q . c_s) * scale_s + (sum_d q_d) * zero_s
    — one MXU dot on raw codes plus two lane-wise multiply-adds.  V's dequant
    folds into the probability vector (``(p * vscale) @ codes + rowsum(p *
    vzero)``), so V pages stay SLOT-major ([P, H, S/2, D], standard dot).
  * Affine params ride in ONE dense bf16 array ([P, 4, H, S]) — round-1's
    two f32 [P, H, 2, S] arrays tiled their 2-wide sublane dim to 8, so the
    kernel DMA'd 4x the logical param bytes; measured as the bulk of the gap
    between the DMA floor and the HBM roofline.
  * v2 compute structure (2x whole-kernel speedup, measured): per-head MXU
    dots write into a shared [Hb*G, S] scratch, then the ENTIRE softmax /
    affine / accumulate chain runs once vectorized over the head block.  The
    round-1 kernel ran that chain per head on [1, S] slices — ~450
    one-sublane VPU ops per grid step that never hid behind the DMAs.
  * K score dots run in bf16: q arrives bf16 and u4 codes are integers, so
    every product is exact and the MXU accumulates in f32 — bitwise-stable
    vs the f32 path.  V dots stay f32 (p would genuinely lose precision).
  * Online softmax carried in VMEM scratch across the page-grid axis; the
    final (m, l) state is exported so the caller can merge a dense attention
    over the hot decode ring (``kv_hot``) — pages receive NO per-token writes
    at all (see kv_hot.py for why every per-token arrangement loses).
  * Page gather rides the grid: a scalar-prefetched page table drives the
    BlockSpec index maps, and past-the-end steps clamp to the sequence's last
    page so Mosaic's revisiting pipeline skips the DMA — per-sequence HBM
    traffic is proportional to its ACTUAL flushed length.

Grid: (batch, kv-head blocks, pages), pages innermost.  GQA handled by laying
q out kv-head-major: q[:, h*G:(h+1)*G, :] are the queries of kv head ``h``.

No split-KV ("cooperative") variant by design: the reference's
``SingleDecodeWithKVCacheKernel`` (``decode.cuh:241-243`` + grid-sync state
merge) splits one long sequence across SMs because a single GPU block can't
occupy the chip.  A v5e TensorCore has no occupancy analog — the page grid
here already streams every page through the same DMA pipeline back-to-back
(Mosaic's revolving pipeline prefetches across grid steps), so a split would
add merge work without adding bandwidth.  On Megacore parts (v4/v5p) the
``parallel`` batch axis gives the two cores independent sequences; the
multi-chip long-sequence story is sequence parallelism (``serving/sp.py``).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atom_tpu.ops.kv_layout import KVPages

_NEG_INF = -1e30


def _decode_kernel(
    # scalar prefetch
    pt_ref,  # int32 [B, max_pages]
    sl_ref,  # int32 [B] — FLUSHED length per sequence
    # inputs
    q_ref,     # [1, Hb*G, D] bf16 — RoPE'd queries
    kp_ref,    # int8 [1, Hb, D/2, S] — channel-plane u4 codes (post-RoPE)
    prm_ref,   # bf16 [1, 4, Hb, S] — k_scale / k_zero / v_scale / v_zero
    vp_ref,    # int8 [1, Hb, S/2, D] — slot-plane u4 codes
    # outputs
    o_ref,     # [1, Hb*G, D]
    mo_ref,    # f32 [1, Hb*G, 128]
    lo_ref,    # f32 [1, Hb*G, 128]
    # scratch
    acc_ref,   # f32 [Hb*G, D]
    m_ref,     # f32 [Hb*G, 128]
    l_ref,     # f32 [Hb*G, 128]
    sc_ref,    # f32 [Hb*G, S] — raw q.codes dots
    pv_ref,    # f32 [Hb*G, D] — p.V dots
    *,
    head_block: int,
    groups: int,
    page_size: int,
    sm_scale: float,
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
        valid = (i * s + lane) < seq_len  # [1, S]
        q_all = q_ref[0]  # [Hb*G, D] bf16
        dh = q_all.shape[1] // 2

        # Per-head MXU dots into the shared score scratch (bf16: exact for
        # u4 codes x bf16 q; accumulation f32 in the MXU).  Two nibble-plane
        # dots per head — channel rows [0, D/2) are the low nibble.
        for hh in range(head_block):
            kb = kp_ref[0, hh]  # int8 [D/2, S]
            k_lo = (kb & 0x0F).astype(jnp.bfloat16)
            k_hi = ((kb.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.bfloat16)
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

        prm = prm_ref[0]  # [4, Hb, S] bf16

        def rep(x):  # [Hb, S] -> [Hb*G, S] (f32)
            x = x.astype(jnp.float32)
            if g == 1:
                return x
            return jnp.broadcast_to(
                x[:, None, :], (head_block, g, s)
            ).reshape(r_all, s)

        # Whole-block softmax chain (one vectorized pass over all heads).
        k_scale = rep(prm[0])
        k_zero = rep(prm[1])
        q_sum = jnp.sum(q_all.astype(jnp.float32), axis=1, keepdims=True)
        scores = (sc_ref[:] * k_scale + q_sum * k_zero) * sm_scale
        scores = jnp.where(valid, scores, _NEG_INF)

        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # [Hb*G, S]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

        v_scale = rep(prm[2])
        v_zero = rep(prm[3])
        pw = p * v_scale
        half = s // 2
        for hh in range(head_block):
            vb = vp_ref[0, hh]  # int8 [S/2, D]
            # slot rows [0, S/2) are the low nibble, [S/2, S) the high
            v_lo = (vb & 0x0F).astype(jnp.float32)
            v_hi = ((vb.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.float32)
            pw_h = pw[hh * g : (hh + 1) * g, :]
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
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == n_blocks - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0:1], 1e-20)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        mo_ref[0] = m_ref[:]
        lo_ref[0] = l_ref[:]


def _decode_ring_kernel(
    # scalar prefetch
    pt_ref,   # int32 [B, max_pages]
    sl_ref,   # int32 [B] — FLUSHED length per sequence
    nh_ref,   # int32 [B] — ring-resident suffix length per sequence
    row_ref,  # int32 [1] — ring column of the CURRENT token
    # inputs
    q_ref,     # [1, Hb*G, D] bf16 — RoPE'd queries
    kp_ref,    # int8 [1, Hb, D/2, S]
    prm_ref,   # bf16 [1, 4, Hb, S]
    vp_ref,    # int8 [1, Hb, S/2, D]
    hk_ref,    # int8 [1, Hb, D/2, W] — hot ring K (channel-packed)
    hprm_ref,  # bf16 [1, 4, Hb, W]
    hv_ref,    # int8 [1, Hb, W, D] — hot ring V (unpacked)
    # outputs
    o_ref,     # [1, Hb*G, D]
    # scratch
    acc_ref, m_ref, l_ref, sc_ref, pv_ref,
    *,
    head_block: int,
    groups: int,
    page_size: int,
    sm_scale: float,
):
    """Paged decode attention + the hot-ring suffix in ONE kernel.

    Pages run exactly like ``_decode_kernel``; grid step 0 ADDITIONALLY
    processes the ring as a W-lane pseudo-page (the online-softmax chain is
    order-free, so folding the ring into the first iteration — its blocks
    are grid-resident anyway — avoids spending a whole extra grid step on
    32 lanes of work; at ctx 512 that is 1/3 of the grid).  Because ring K
    is channel-packed per head ([Hb, D/2, W]) the score dot is expressed as
    ONE standard-orientation block-diagonal MXU dot: q is expanded to
    [R, Hb*D/2] with each row's 64 channels placed in its own head's lane
    block (zeros elsewhere — exact zeros contribute nothing), K flattens to
    [Hb*D/2, W]; same trick for p.V with V flattened to [Hb*W, D].  This
    replaces the per-layer XLA einsum ring attention + softmax merge.
    """
    b = pl.program_id(0)
    i = pl.program_id(2)
    n_blocks = pl.num_programs(2)
    seq_len = sl_ref[b]
    s = page_size
    g = groups
    hb = head_block
    r_all = hb * g

    @pl.when(i == 0)
    def _ring():
        w = hk_ref.shape[3]
        d = hv_ref.shape[3]
        half = d // 2
        row = row_ref[0]
        n_hot = nh_ref[b]
        q_all = q_ref[0]  # [R, D] bf16
        # fused init: this is grid step 0
        m_prev = jnp.full((r_all, 1), _NEG_INF, jnp.float32)
        l_prev = jnp.zeros((r_all, 1), jnp.float32)

        # --- scores: one block-diagonal MXU dot per nibble plane ---
        # int8 carrier + i32 arithmetic shift for the hi nibble: Mosaic has
        # no uint8->bfloat16 conversion, but int8->bf16 lowers (same pattern
        # as the paged blocks below).
        ku = hk_ref[0]                            # int8 [Hb, D/2, W]
        k_lo = (ku & 0x0F).astype(jnp.bfloat16).reshape(hb * half, w)
        k_hi = (
            (ku.astype(jnp.int32) >> 4) & 0x0F
        ).astype(jnp.bfloat16).reshape(hb * half, w)

        sub = jax.lax.broadcasted_iota(jnp.int32, (r_all, hb * half), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (r_all, hb * half), 1)
        blk_mask = (lane // half) == (sub // g)  # row r <- its own head only
        q_lo = jnp.where(
            blk_mask, jnp.concatenate([q_all[:, :half]] * hb, axis=1), 0
        ).astype(jnp.bfloat16)
        q_hi = jnp.where(
            blk_mask, jnp.concatenate([q_all[:, half:]] * hb, axis=1), 0
        ).astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            q_lo, k_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            q_hi, k_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, W]

        prm = hprm_ref[0]  # [4, Hb, W] bf16

        def rep(x):  # [Hb, W] -> [R, W] f32
            x = x.astype(jnp.float32)
            if g == 1:
                return x
            return jnp.broadcast_to(
                x[:, None, :], (hb, g, w)
            ).reshape(r_all, w)

        q_sum = jnp.sum(q_all.astype(jnp.float32), axis=1, keepdims=True)
        scores = (dots * rep(prm[0]) + q_sum * rep(prm[1])) * sm_scale

        cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        age = jax.lax.rem(row - cols + w, w)
        valid = age < n_hot  # [1, W]
        scores = jnp.where(valid, scores, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # [R, W]
        l_new = jnp.sum(p, axis=1, keepdims=True)

        # --- p.V: block-diagonal f32 dot against [Hb*W, D] ---
        pw = p * rep(prm[2])
        sub2 = jax.lax.broadcasted_iota(jnp.int32, (r_all, hb * w), 0)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (r_all, hb * w), 1)
        p_sel = jnp.where(
            (lane2 // w) == (sub2 // g),
            jnp.concatenate([pw] * hb, axis=1), 0.0
        )
        v_flat = hv_ref[0].astype(jnp.float32).reshape(hb * w, d)
        pv = jax.lax.dot_general(
            p_sel, v_flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, D]
        z_corr = jnp.sum(p * rep(prm[3]), axis=1, keepdims=True)

        acc_ref[:] = pv + z_corr
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i * s < seq_len)
    def _page():
        _decode_page_step(
            q_ref, kp_ref, prm_ref, vp_ref, acc_ref, m_ref, l_ref, sc_ref,
            pv_ref, i * s, seq_len, head_block, groups, page_size, sm_scale,
        )

    @pl.when(i == n_blocks - 1)
    def _store():
        l_fin = jnp.maximum(l_ref[:, 0:1], 1e-20)
        o_ref[0] = (acc_ref[:] / l_fin).astype(o_ref.dtype)


def _decode_page_step(
    q_ref, kp_ref, prm_ref, vp_ref, acc_ref, m_ref, l_ref, sc_ref, pv_ref,
    pos0, seq_len, head_block, groups, page_size, sm_scale,
):
    """One page's worth of the online-softmax chain (shared by the plain and
    ring-merged kernels; body identical to ``_decode_kernel``'s page step)."""
    s = page_size
    g = groups
    r_all = head_block * g
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    valid = (pos0 + lane) < seq_len  # [1, S]
    q_all = q_ref[0]  # [Hb*G, D] bf16
    dh = q_all.shape[1] // 2

    for hh in range(head_block):
        kb = kp_ref[0, hh]  # int8 [D/2, S]
        k_lo = (kb & 0x0F).astype(jnp.bfloat16)
        k_hi = ((kb.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.bfloat16)
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

    prm = prm_ref[0]  # [4, Hb, S] bf16

    def rep(x):  # [Hb, S] -> [Hb*G, S] (f32)
        x = x.astype(jnp.float32)
        if g == 1:
            return x
        return jnp.broadcast_to(
            x[:, None, :], (head_block, g, s)
        ).reshape(r_all, s)

    k_scale = rep(prm[0])
    k_zero = rep(prm[1])
    q_sum = jnp.sum(q_all.astype(jnp.float32), axis=1, keepdims=True)
    scores = (sc_ref[:] * k_scale + q_sum * k_zero) * sm_scale
    scores = jnp.where(valid, scores, _NEG_INF)

    m_prev = m_ref[:, 0:1]
    l_prev = l_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # [Hb*G, S]
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    v_scale = rep(prm[2])
    v_zero = rep(prm[3])
    pw = p * v_scale
    half = s // 2
    for hh in range(head_block):
        vb = vp_ref[0, hh]  # int8 [S/2, D]
        v_lo = (vb & 0x0F).astype(jnp.float32)
        v_hi = ((vb.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.float32)
        pw_h = pw[hh * g : (hh + 1) * g, :]
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
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("head_block", "out_dtype", "interpret"),
)
def paged_ring_decode_attention(
    q: jnp.ndarray,  # [B, HQ, D] — RoPE already applied; kv-head-major
    pages: KVPages,  # K pages hold POST-RoPE codes
    page_table: jnp.ndarray,  # int32 [B, max_pages]
    seq_lens: jnp.ndarray,  # int32 [B] — FLUSHED tokens per sequence
    hot,                     # kv_hot.HotKV — page-layout decode ring
    n_hot: jnp.ndarray,      # int32 [B] — ring-resident suffix lengths
    row: jnp.ndarray,        # int32 scalar — ring column of CURRENT token
    head_block: int = 32,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fused paged + hot-ring decode attention (normalized output).

    One kernel covers each sequence's whole KV state: the flushed pages and
    the ring suffix — the per-layer XLA ring attention and softmax merge of
    the two-kernel scheme disappear.  See ``_decode_ring_kernel``.
    """
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    b, hq, d = q.shape
    h = pages.kv_heads
    s = pages.page_size
    groups = hq // h
    w = hot.k_codes.shape[3]
    assert hq % h == 0 and d == pages.head_dim
    hb = min(head_block, h)
    while hb < h and (
        h % hb != 0 or (hb * groups) % 8 != 0 or hb % 8 != 0
    ):
        hb += 1
    assert h % hb == 0
    assert (hb * groups) % 8 == 0 or hb == h
    assert hb % 8 == 0 or hb == h
    max_pages = page_table.shape[1]
    sm_scale = 1.0 / math.sqrt(d)

    seq_lens = seq_lens.astype(jnp.int32)
    page_table = page_table.astype(jnp.int32)

    def page_of(i_b, i_h, i_p, pt, sl, nh, rw):
        last = jnp.maximum(pl.cdiv(sl[i_b], s) - 1, 0)
        return pt[i_b, jnp.minimum(i_p, last)]

    grid = (b, h // hb, max_pages)  # ring rides grid step 0 (no extra step)
    kernel = functools.partial(
        _decode_ring_kernel,
        head_block=hb,
        groups=groups,
        page_size=s,
        sm_scale=sm_scale,
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, hb * groups, d), lambda ib, ih, ip, *_: (ib, ih, 0)
                ),
                pl.BlockSpec(
                    (1, hb, d // 2, s),
                    lambda ib, ih, ip, *r: (page_of(ib, ih, ip, *r), ih, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 4, hb, s),
                    lambda ib, ih, ip, *r: (page_of(ib, ih, ip, *r), 0, ih, 0),
                ),
                pl.BlockSpec(
                    (1, hb, s // 2, d),
                    lambda ib, ih, ip, *r: (page_of(ib, ih, ip, *r), ih, 0, 0),
                ),
                pl.BlockSpec(
                    (1, hb, d // 2, w), lambda ib, ih, ip, *_: (ib, ih, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 4, hb, w), lambda ib, ih, ip, *_: (ib, 0, ih, 0)
                ),
                pl.BlockSpec(
                    (1, hb, w, d), lambda ib, ih, ip, *_: (ib, ih, 0, 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, hb * groups, d), lambda ib, ih, ip, *_: (ib, ih, 0)
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((hb * groups, d), jnp.float32),
                pltpu.VMEM((hb * groups, 128), jnp.float32),
                pltpu.VMEM((hb * groups, 128), jnp.float32),
                pltpu.VMEM((hb * groups, s), jnp.float32),
                pltpu.VMEM((hb * groups, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), out_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        page_table, seq_lens, n_hot.astype(jnp.int32),
        jnp.asarray(row, jnp.int32).reshape(1),
        q, pages.k_pages, pages.params, pages.v_pages,
        hot.k_codes, hot.prm, hot.v_codes,
    )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("head_block", "out_dtype", "return_state", "interpret"),
)
def paged_decode_attention_rotated(
    q: jnp.ndarray,  # [B, HQ, D] — RoPE already applied; kv-head-major
    pages: KVPages,  # K pages hold POST-RoPE codes
    page_table: jnp.ndarray,  # int32 [B, max_pages]
    seq_lens: jnp.ndarray,  # int32 [B] — FLUSHED tokens per sequence
    head_block: int = 32,
    out_dtype=jnp.bfloat16,
    return_state: bool = False,
    interpret: bool = False,
):
    """The production paged decode attention (see module docstring).

    With ``return_state`` also returns (m [B, HQ], l [B, HQ]) — the final
    online-softmax state for merging with the hot-ring attention
    (``kv_hot.merge_attention``); the output is normalized by ``l``.
    """
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    b, hq, d = q.shape
    h = pages.kv_heads
    s = pages.page_size
    groups = hq // h
    assert hq % h == 0 and d == pages.head_dim
    hb = min(head_block, h)
    # Mosaic block rules: q's penultimate dim (hb*groups) and the params
    # block's penultimate dim (hb) must each be divisible by 8 or equal the
    # full array dim.
    while hb < h and (
        h % hb != 0 or (hb * groups) % 8 != 0 or hb % 8 != 0
    ):
        hb += 1
    assert h % hb == 0
    assert (hb * groups) % 8 == 0 or hb == h
    assert hb % 8 == 0 or hb == h
    max_pages = page_table.shape[1]
    sm_scale = 1.0 / math.sqrt(d)

    seq_lens = seq_lens.astype(jnp.int32)
    page_table = page_table.astype(jnp.int32)

    def page_of(i_b, i_h, i_p, pt, sl):
        last = jnp.maximum(pl.cdiv(sl[i_b], s) - 1, 0)
        return pt[i_b, jnp.minimum(i_p, last)]

    grid = (b, h // hb, max_pages)
    kernel = functools.partial(
        _decode_kernel,
        head_block=hb,
        groups=groups,
        page_size=s,
        sm_scale=sm_scale,
    )
    out, m, l = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, hb * groups, d), lambda ib, ih, ip, pt, sl: (ib, ih, 0)
                ),
                pl.BlockSpec(
                    (1, hb, d // 2, s),
                    lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), ih, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 4, hb, s),
                    lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), 0, ih, 0),
                ),
                pl.BlockSpec(
                    (1, hb, s // 2, d),
                    lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), ih, 0, 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, hb * groups, d), lambda ib, ih, ip, pt, sl: (ib, ih, 0)
                ),
                pl.BlockSpec(
                    (1, hb * groups, 128), lambda ib, ih, ip, pt, sl: (ib, ih, 0)
                ),
                pl.BlockSpec(
                    (1, hb * groups, 128), lambda ib, ih, ip, pt, sl: (ib, ih, 0)
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((hb * groups, d), jnp.float32),
                pltpu.VMEM((hb * groups, 128), jnp.float32),
                pltpu.VMEM((hb * groups, 128), jnp.float32),
                pltpu.VMEM((hb * groups, s), jnp.float32),
                pltpu.VMEM((hb * groups, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), out_dtype),
            jax.ShapeDtypeStruct((b, hq, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, seq_lens, q, pages.k_pages, pages.params, pages.v_pages)
    if return_state:
        return out, m[:, :, 0], l[:, :, 0]
    return out


# ---------------------------------------------------------------------------
# Bulk hot-ring -> pages flush (synchronized: once per ring wrap)
# ---------------------------------------------------------------------------


def _flush_kernel(
    pg_ref,     # int32 [B] — target page for this pass (0 = sink)
    slot0_ref,  # int32 [B] — global slot of THIS page's lane 0
    o_ref,      # int32 [B] — scratch lane of flush token 0, in [0, S)
    lo_ref,     # int32 [B] — first valid global slot (= flushed before flush)
    hi_ref,     # int32 [B] — one past last valid global slot (= lens)
    kfl_ref,    # int8 [1, H, D/2, W] — channel-plane packed K, position order
    prmf_ref,   # bf16 [1, 4, H, W] — merged affine rows, position order
    vfl_ref,    # int8 [1, H, W, D] — UNPACKED u4 V codes, position order
    kpi_ref, prmi_ref, vpi_ref,   # aliased page blocks (in)
    kpo_ref, prmo_ref, vpo_ref,   # aliased page blocks (out)
    *,
    w: int,
    page_size: int,
    base: int,  # 0 for the pass writing lanes [o, S), S for the wrap pass
):
    """Write one sequence's pending ring block [lo, hi) into ONE page.

    The W-token block starts at an arbitrary in-page lane ``o`` (sequences
    have independent phases under synchronized flushing), so it may straddle
    one page boundary: pass ``base=0`` writes the part landing in the first
    page, ``base=S`` the wrapped part in the next page.  A 2S-lane circular
    roll places the block; global-slot range masks select the valid part.
    """
    b = pl.program_id(0)
    s = page_size
    half = s // 2
    o = o_ref[b]
    slot0 = slot0_ref[b]
    lo = lo_ref[b]
    hi = hi_ref[b]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
    g = slot0 + base + lane  # global slot per lane of THIS page
    valid = (g >= lo) & (g < hi)  # [1, 1, S]

    def lanes(fl_ref, pi_ref, po_ref, via_i32=False):
        """Roll the W-lane flush block into page lanes (32-bit roll only)."""
        fl = fl_ref[0]
        orig_dtype = fl.dtype
        fl = fl.astype(jnp.int32) if via_i32 else fl.astype(jnp.float32)
        fl = jnp.pad(fl, ((0, 0), (0, 0), (0, 2 * s - w)))  # [R0, R1, 2S]
        rolled = pltpu.roll(fl, o, 2)[:, :, base : base + s]
        rolled = rolled.astype(orig_dtype)
        po_ref[0] = jnp.where(valid, rolled, pi_ref[0])

    lanes(kfl_ref, kpi_ref, kpo_ref, via_i32=True)
    lanes(prmf_ref, prmi_ref, prmo_ref)

    # V codes: two nibble-half regions, each a circular row roll of the
    # unpacked block plus a global-slot row mask and a nibble merge.
    vfl = jnp.pad(
        vfl_ref[0].astype(jnp.int32) & 0x0F, ((0, 0), (0, half - w), (0, 0))
    )  # [H, S/2, D]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (1, half, 1), 1)

    old = vpi_ref[0].astype(jnp.int32) & 0xFF
    for region_lane0, is_low in ((base, True), (base + half, False)):
        gr = slot0 + region_lane0 + row_i
        valid_r = (gr >= lo) & (gr < hi)
        shift = o - region_lane0
        rolled = pltpu.roll(vfl, shift % half, 1)
        # tokens whose scratch lane is outside this region wrap around in the
        # half-sized roll; valid_r masks them out, BUT a token at roll
        # distance >= half could alias a valid row — impossible since
        # W <= S/2 and the region spans exactly S/2 lanes.
        merged = jnp.where(
            is_low, (old & 0xF0) | rolled, (old & 0x0F) | (rolled << 4)
        )
        old = jnp.where(valid_r, merged, old)
    vpo_ref[0] = old.astype(jnp.int8)


def flush_hot_pallas(
    pages: KVPages,
    k_flush: jnp.ndarray,   # int8 [B, H, D/2, W] channel-plane packed
    prm_flush: jnp.ndarray,  # bf16 [B, 4, H, W] merged affine rows
    v_flush: jnp.ndarray,   # int8 [B, H, W, D] unpacked u4
    page_a: jnp.ndarray,    # int32 [B] — page of scratch lanes [0, S) (0 = sink)
    page_b: jnp.ndarray,    # int32 [B] — page of scratch lanes [S, 2S) (0 = sink)
    slot0: jnp.ndarray,     # int32 [B] — global slot of page_a lane 0
    o: jnp.ndarray,         # int32 [B] in [0, S)
    lo: jnp.ndarray,        # int32 [B]
    hi: jnp.ndarray,        # int32 [B]
    interpret: bool = False,
) -> KVPages:
    """Write each sequence's pending ring block into its page(s), in place.

    Two aliased passes (first page, then the wrapped page for boundary-
    crossing sequences); runs once per ring wrap.  Non-flushing sequences map
    their pages to the sink (page 0) and mask everything out.
    """
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    bsz, h, dhalf, w = k_flush.shape
    s = pages.page_size
    d = pages.head_dim

    def one_pass(pg, slot0_pass, base, pages_):
        kernel = functools.partial(
            _flush_kernel, w=w, page_size=s, base=base
        )
        page_specs = [
            pl.BlockSpec((1, h, dhalf, s), lambda bi, pgr, *_: (pgr[bi], 0, 0, 0)),
            pl.BlockSpec((1, 4, h, s), lambda bi, pgr, *_: (pgr[bi], 0, 0, 0)),
            pl.BlockSpec((1, h, s // 2, d), lambda bi, pgr, *_: (pgr[bi], 0, 0, 0)),
        ]
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(bsz,),
                in_specs=[
                    pl.BlockSpec((1, h, dhalf, w), lambda bi, *_: (bi, 0, 0, 0)),
                    pl.BlockSpec((1, 4, h, w), lambda bi, *_: (bi, 0, 0, 0)),
                    pl.BlockSpec((1, h, w, d), lambda bi, *_: (bi, 0, 0, 0)),
                ] + page_specs,
                out_specs=page_specs,
            ),
            out_shape=[
                jax.ShapeDtypeStruct(pages.k_pages.shape, jnp.int8),
                jax.ShapeDtypeStruct(pages.params.shape, jnp.bfloat16),
                jax.ShapeDtypeStruct(pages.v_pages.shape, jnp.int8),
            ],
            # page blocks are inputs 8..10 (after 5 prefetch + 3 flush inputs)
            input_output_aliases={8: 0, 9: 1, 10: 2},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(pg, slot0_pass, o, lo, hi,
          k_flush, prm_flush, v_flush,
          pages_.k_pages, pages_.params, pages_.v_pages)
        return KVPages(k_pages=out[0], params=out[1], v_pages=out[2])

    pages = one_pass(page_a, slot0, 0, pages)
    pages = one_pass(page_b, slot0, s, pages)
    return pages
