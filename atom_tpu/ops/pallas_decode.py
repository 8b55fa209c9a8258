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
    q_ref,     # [1, Hb*G, D] bf16/f32 — RoPE'd queries
    kp_ref,    # int8 [1, Hb, D/2, S] — channel-plane u4 codes (post-RoPE)
    kprm_ref,  # f32 [1, Hb, 2, S]
    vp_ref,    # int8 [1, Hb, S/2, D] — slot-plane u4 codes
    vprm_ref,  # f32 [1, Hb, 2, S]
    # outputs
    o_ref,     # [1, Hb*G, D]
    mo_ref,    # f32 [1, Hb*G, 128]
    lo_ref,    # f32 [1, Hb*G, 128]
    # scratch
    acc_ref,   # f32 [Hb*G, D]
    m_ref,     # f32 [Hb*G, 128]
    l_ref,     # f32 [Hb*G, 128]
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

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i * s < seq_len)
    def _process():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
        valid = (i * s + lane) < seq_len  # [1, S]

        for hh in range(head_block):
            kb = kp_ref[0, hh].astype(jnp.int32)  # [D/2, S]
            k_codes = jnp.concatenate(
                [kb & 0x0F, (kb >> 4) & 0x0F], axis=0
            ).astype(jnp.float32)  # [D, S] true channel order
            r0 = hh * groups
            q_h = q_ref[0, r0 : r0 + groups, :].astype(jnp.float32)  # [G, D]
            q_sum = jnp.sum(q_h, axis=1, keepdims=True)  # [G, 1]
            dot = jax.lax.dot_general(
                q_h, k_codes,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, S]
            k_scale = kprm_ref[0, hh, 0:1, :]  # [1, S]
            k_zero = kprm_ref[0, hh, 1:2, :]
            scores = (dot * k_scale + q_sum * k_zero) * sm_scale
            scores = jnp.where(valid, scores, _NEG_INF)

            m_prev = m_ref[r0 : r0 + groups, 0:1]
            l_prev = l_ref[r0 : r0 + groups, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # [G, S]
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

            vb = vp_ref[0, hh].astype(jnp.int32)  # [S/2, D]
            v_codes = jnp.concatenate(
                [vb & 0x0F, (vb >> 4) & 0x0F], axis=0
            ).astype(jnp.float32)  # [S, D] true slot order
            v_scale = vprm_ref[0, hh, 0:1, :]
            v_zero = vprm_ref[0, hh, 1:2, :]
            pv = jax.lax.dot_general(
                p * v_scale, v_codes,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, D]
            z_corr = jnp.sum(p * v_zero, axis=1, keepdims=True)

            acc_ref[r0 : r0 + groups, :] = (
                acc_ref[r0 : r0 + groups, :] * alpha + pv + z_corr
            )
            m_ref[r0 : r0 + groups, :] = jnp.broadcast_to(
                m_new, (groups, m_ref.shape[1])
            )
            l_ref[r0 : r0 + groups, :] = jnp.broadcast_to(
                l_new, (groups, l_ref.shape[1])
            )

    @pl.when(i == n_blocks - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0:1], 1e-20)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        mo_ref[0] = m_ref[:]
        lo_ref[0] = l_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("head_block", "out_dtype", "return_state", "interpret"),
)
def paged_decode_attention_rotated(
    q: jnp.ndarray,  # [B, HQ, D] — RoPE already applied; kv-head-major
    pages: KVPages,  # K pages hold POST-RoPE codes
    page_table: jnp.ndarray,  # int32 [B, max_pages]
    seq_lens: jnp.ndarray,  # int32 [B] — FLUSHED tokens per sequence
    head_block: int = 16,
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
    while hb < h and (h % hb != 0 or (hb * groups) % 8 != 0):
        hb += 1
    assert h % hb == 0 and ((hb * groups) % 8 == 0 or hb == h)
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
                    (1, hb, 2, s),
                    lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), ih, 0, 0),
                ),
                pl.BlockSpec(
                    (1, hb, s // 2, d),
                    lambda ib, ih, ip, pt, sl: (page_of(ib, ih, ip, pt, sl), ih, 0, 0),
                ),
                pl.BlockSpec(
                    (1, hb, 2, s),
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
    )(page_table, seq_lens, q, pages.k_pages, pages.k_params,
      pages.v_pages, pages.v_params)
    if return_state:
        return out, m[:, :, 0], l[:, :, 0]
    return out


# ---------------------------------------------------------------------------
# Bulk hot-ring -> pages flush
# ---------------------------------------------------------------------------


def _flush_kernel(
    pg_ref,     # int32 [B] — target page (0 = sink for non-flushing seqs)
    lane0_ref,  # int32 [B] — start slot within the page (multiple of W)
    off_ref,    # int32 [B] — first valid token offset within the block
    flag_ref,   # int32 [B] — 1 if this sequence flushes
    kfl_ref,    # int8 [1, H, D/2, W] — channel-plane packed K flush block
    kpf_ref,    # f32 [1, H, 2, W]
    vfl_ref,    # int8 [1, H, W, D] — UNPACKED u4 V codes
    vpf_ref,    # f32 [1, H, 2, W]
    kpi_ref,    # int8 [1, H, D/2, S]   (aliased pages)
    kri_ref,    # f32 [1, H, 2, S]
    vpi_ref,    # int8 [1, H, S/2, D]
    vri_ref,    # f32 [1, H, 2, S]
    kpo_ref, kro_ref, vpo_ref, vro_ref,
    *,
    w: int,
    page_size: int,
):
    b = pl.program_id(0)
    s = page_size
    half_s = s // 2
    lane0 = lane0_ref[b]
    off = off_ref[b]
    do = flag_ref[b] > 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
    in_rng = do & (lane >= lane0 + off) & (lane < lane0 + w)  # [1, 1, S]

    # K codes + K/V params: place the W-lane block at lane0 via dynamic roll.
    # (Mosaic's dynamic rotate is 32-bit only — widen int8 around it.)
    def lanes(fl_ref, pi_ref, po_ref, as_i32=False):
        fl = fl_ref[0].astype(jnp.int32) if as_i32 else fl_ref[0]
        fl = jnp.pad(fl, ((0, 0), (0, 0), (0, s - w)))  # [H, rows, S]
        rolled = pltpu.roll(fl, lane0, 2)
        if as_i32:
            rolled = rolled.astype(jnp.int8)
        po_ref[0] = jnp.where(in_rng, rolled, pi_ref[0])

    lanes(kfl_ref, kpi_ref, kpo_ref, as_i32=True)
    lanes(kpf_ref, kri_ref, kro_ref)
    lanes(vpf_ref, vri_ref, vro_ref)

    # V codes: the block lies in one nibble half; RMW the affected rows.
    row0 = lane0 % half_s
    is_low = lane0 < half_s
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, half_s, 1), 1)
    row_rng = do & (sub >= row0 + off) & (sub < row0 + w)
    vfl = vfl_ref[0].astype(jnp.int32)  # [H, W, D]
    vfl_pad = jnp.pad(vfl, ((0, 0), (0, half_s - w), (0, 0)))
    vfl_rolled = pltpu.roll(vfl_pad, row0, 1) & 0x0F  # [H, S/2, D]
    old = vpi_ref[0].astype(jnp.int32) & 0xFF
    merged = jnp.where(
        is_low, (old & 0xF0) | vfl_rolled, (old & 0x0F) | (vfl_rolled << 4)
    )
    vpo_ref[0] = jnp.where(row_rng, merged, old).astype(jnp.int8)


def flush_hot_pallas(
    pages: KVPages,
    k_flush: jnp.ndarray,   # int8 [B, H, D/2, W] channel-plane packed
    k_prm: jnp.ndarray,     # f32 [B, H, 2, W]
    v_flush: jnp.ndarray,   # int8 [B, H, W, D] unpacked u4
    v_prm: jnp.ndarray,     # f32 [B, H, 2, W]
    page_idx: jnp.ndarray,  # int32 [B] (0 = sink)
    lane0: jnp.ndarray,     # int32 [B] (multiple of W)
    from_off: jnp.ndarray,  # int32 [B]
    flags: jnp.ndarray,     # int32 [B]
    interpret: bool = False,
) -> KVPages:
    """Write each flushing sequence's W-token block into its page, in place.

    W | S/2 and lane0 is W-aligned, so a block always lands inside a single
    nibble half of a single page — K and params are pure lane-range
    overwrites, V is a row-range nibble merge.  Non-flushing sequences map to
    page 0 (the sink); consecutive sink visits dedupe in the pipeline.
    """
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    bsz, h, dhalf, w = k_flush.shape
    s = pages.page_size
    d = pages.head_dim

    kernel = functools.partial(_flush_kernel, w=w, page_size=s)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec((1, h, dhalf, w), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, h, 2, w), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, h, w, d), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, h, 2, w), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, h, dhalf, s), lambda b, pg, *_: (pg[b], 0, 0, 0)),
                pl.BlockSpec((1, h, 2, s), lambda b, pg, *_: (pg[b], 0, 0, 0)),
                pl.BlockSpec((1, h, s // 2, d), lambda b, pg, *_: (pg[b], 0, 0, 0)),
                pl.BlockSpec((1, h, 2, s), lambda b, pg, *_: (pg[b], 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, h, dhalf, s), lambda b, pg, *_: (pg[b], 0, 0, 0)),
                pl.BlockSpec((1, h, 2, s), lambda b, pg, *_: (pg[b], 0, 0, 0)),
                pl.BlockSpec((1, h, s // 2, d), lambda b, pg, *_: (pg[b], 0, 0, 0)),
                pl.BlockSpec((1, h, 2, s), lambda b, pg, *_: (pg[b], 0, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(pages.k_pages.shape, jnp.int8),
            jax.ShapeDtypeStruct(pages.k_params.shape, jnp.float32),
            jax.ShapeDtypeStruct(pages.v_pages.shape, jnp.int8),
            jax.ShapeDtypeStruct(pages.v_params.shape, jnp.float32),
        ],
        # inputs after the 4 scalar-prefetch args: flush data 4..7, pages 8..11
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page_idx, lane0, from_off, flags,
      k_flush, k_prm, v_flush, v_prm,
      pages.k_pages, pages.k_params, pages.v_pages, pages.v_params)
    return KVPages(*out)
