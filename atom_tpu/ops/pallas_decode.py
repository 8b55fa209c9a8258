"""Pallas TPU kernel: paged INT4 fused-dequant decode attention.

The per-token hot kernel of the serving path — TPU-first redesign of the
reference's FlashInfer fork (``BatchDecodeWithPagedKVCacheKernel``,
``kernels/include/flashinfer/decode.cuh:492-851``):

  * K/V stream from HBM as 4-bit nibble planes (``kv_layout.KVPages``) and are
    dequantized in VMEM right before use — HBM attention traffic is genuinely
    4 bits/element, the source of the decode speedup (the CUDA analog is
    ``cast_load`` + 8-per-u32 unpack, ``quantization.cuh:66-80``).
  * K is stored PRE-RoPE; rotation is applied on the dequantized K^T at each
    key's absolute position, channel-major so ``rotate_half`` is a sublane
    roll (the CUDA analog is ``apply_llama_rope``, ``decode.cuh:92-126``).
  * Online softmax carried in VMEM scratch across the page-grid axis (the
    CUDA analog is ``state_t`` merge, ``state.cuh``).
  * Page gather rides the grid: a scalar-prefetched page table drives the
    BlockSpec index maps, and out-of-range steps clamp to the previous page
    index so Mosaic's revisiting pipeline skips the DMA entirely — per-sequence
    HBM traffic is proportional to its ACTUAL length, not the batch max
    (the CUDA analog is the CSR ``indptr`` loop bound).

Grid: (batch, kv-head blocks, pages), pages innermost.  GQA handled by laying
q out kv-head-major: q[:, h, :, :] are the ``G`` query heads of kv head ``h``.
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
    sl_ref,  # int32 [B]
    # inputs
    q_ref,    # [1, Hb*G, D]
    kp_ref,   # int8 [1, Hb, D/2, S]
    kprm_ref,  # f32 [1, Hb, 2, S]
    vp_ref,   # int8 [1, Hb, S/2, D]
    vprm_ref,  # f32 [1, Hb, 2, S]
    # output
    o_ref,    # [1, Hb*G, D]
    # scratch
    acc_ref,  # f32 [Hb*G, D]
    m_ref,    # f32 [Hb*G, 128]
    l_ref,    # f32 [Hb*G, 128]
    *,
    head_block: int,
    groups: int,
    page_size: int,
    head_dim: int,
    rope_theta: float,
    sm_scale: float,
):
    b = pl.program_id(0)
    i = pl.program_id(2)
    n_blocks = pl.num_programs(2)
    seq_len = sl_ref[b]
    s = page_size
    d = head_dim
    half_d = d // 2

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i * s < seq_len)
    def _process():
        # Key positions of this page (lane vector) + mask.
        pos = (i * s + jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)).astype(
            jnp.float32
        )
        valid = pos < seq_len.astype(jnp.float32)  # [1, S]

        # RoPE tables, channel-major [D, S]: angle(d, s) = pos_s * theta^(-(d % D/2)/(D/2)).
        d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
        freq_exp = (d_idx % half_d).astype(jnp.float32) * (
            -math.log(rope_theta) / half_d
        )
        ang = jnp.exp(freq_exp) * pos  # [D, S]
        cos_t = jnp.cos(ang)
        sin_t = jnp.sin(ang)
        rot_sign = jnp.where(d_idx < half_d, -1.0, 1.0).astype(jnp.float32)

        for hh in range(head_block):
            # --- K^T dequant + RoPE (channel-major) ---
            kb = kp_ref[0, hh].astype(jnp.int32)  # [D/2, S]
            k_codes = jnp.concatenate(
                [kb & 0x0F, (kb >> 4) & 0x0F], axis=0
            ).astype(jnp.float32)  # [D, S] true channel order
            k_scale = kprm_ref[0, hh, 0:1, :]  # [1, S]
            k_zero = kprm_ref[0, hh, 1:2, :]
            kt = k_codes * k_scale + k_zero  # [D, S]
            kt_shift = jnp.concatenate(
                [kt[half_d:, :], kt[:half_d, :]], axis=0
            )
            kt = kt * cos_t + kt_shift * rot_sign * sin_t

            # --- scores + online softmax (rows = G query heads) ---
            r0 = hh * groups
            q_h = q_ref[0, r0 : r0 + groups, :].astype(jnp.float32)  # [G, D]
            scores = (
                jax.lax.dot_general(
                    q_h,
                    kt,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * sm_scale
            )  # [G, S]
            scores = jnp.where(valid, scores, _NEG_INF)

            m_prev = m_ref[r0 : r0 + groups, 0:1]  # [G, 1]
            l_prev = l_ref[r0 : r0 + groups, 0:1]
            s_max = jnp.max(scores, axis=1, keepdims=True)  # [G, 1]
            m_new = jnp.maximum(m_prev, s_max)
            alpha = jnp.exp(m_prev - m_new)  # [G, 1]
            p = jnp.exp(scores - m_new)  # [G, S]
            p = jnp.where(valid, p, 0.0)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

            # --- V dequant folded into the probs (slot-major [S, D]) ---
            # out += p @ (codes*scale + zero) = (p*scale_row) @ codes + rowsum(p*zero_row)
            vb = vp_ref[0, hh].astype(jnp.int32)  # [S/2, D]
            v_codes = jnp.concatenate(
                [vb & 0x0F, (vb >> 4) & 0x0F], axis=0
            ).astype(jnp.float32)  # [S, D] true slot order
            v_scale = vprm_ref[0, hh, 0:1, :]  # [1, S]
            v_zero = vprm_ref[0, hh, 1:2, :]
            pv = jax.lax.dot_general(
                p * v_scale,
                v_codes,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, D]
            z_corr = jnp.sum(p * v_zero, axis=1, keepdims=True)  # [G, 1]

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


@functools.partial(
    jax.jit,
    static_argnames=("rope_theta", "head_block", "interpret"),
)
def paged_decode_attention(
    q: jnp.ndarray,  # [B, HQ, D] — RoPE already applied; kv-head-major
    pages: KVPages,
    page_table: jnp.ndarray,  # int32 [B, max_pages]
    seq_lens: jnp.ndarray,  # int32 [B] (length INCLUDING the current token)
    rope_theta: float = 10000.0,
    head_block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in Pallas implementation of ``ops.reference.batch_decode``
    consuming the kernel KV layout.  Returns [B, HQ, D] in ``q.dtype``."""
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    b, hq, d = q.shape
    h = pages.kv_heads
    s = pages.page_size
    groups = hq // h
    assert hq % h == 0 and d == pages.head_dim
    hb = min(head_block, h)
    # Mosaic needs the q/out block's sublane dim (hb * groups) divisible by 8
    # (or equal to the full head axis).
    while hb < h and (h % hb != 0 or (hb * groups) % 8 != 0):
        hb += 1
    assert h % hb == 0 and ((hb * groups) % 8 == 0 or hb == h)
    max_pages = page_table.shape[1]
    sm_scale = 1.0 / math.sqrt(d)

    seq_lens = seq_lens.astype(jnp.int32)
    page_table = page_table.astype(jnp.int32)

    def page_of(i_b, i_h, i_p, pt, sl):
        # Clamp past-the-end steps to the sequence's last real page: the index
        # repeats, so Mosaic's revisiting pipeline skips the DMA.
        last = jnp.maximum(pl.cdiv(sl[i_b], s) - 1, 0)
        return pt[i_b, jnp.minimum(i_p, last)]

    grid = (b, h // hb, max_pages)
    q_kv_major = q.reshape(b, h, groups, d).reshape(b, h * groups, d)

    kernel = functools.partial(
        _decode_kernel,
        head_block=hb,
        groups=groups,
        page_size=s,
        head_dim=d,
        rope_theta=rope_theta,
        sm_scale=sm_scale,
    )
    out = pl.pallas_call(
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
            out_specs=pl.BlockSpec(
                (1, hb * groups, d), lambda ib, ih, ip, pt, sl: (ib, ih, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hb * groups, d), jnp.float32),
                pltpu.VMEM((hb * groups, 128), jnp.float32),
                pltpu.VMEM((hb * groups, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, seq_lens, q_kv_major, pages.k_pages, pages.k_params,
      pages.v_pages, pages.v_params)
    return out.reshape(b, h, groups, d).reshape(b, hq, d)


# ---------------------------------------------------------------------------
# v2: K stored POST-RoPE, scores as int8 MXU dots (the production kernel)
# ---------------------------------------------------------------------------
#
# Two co-designed changes take the kernel from VPU-compute-bound to near the
# HBM roofline:
#
#   1. RoPE moves to APPEND time (K is rotated in f32, then quantized).  The
#      rotation is exact per position and K's absolute position never changes
#      after append, so nothing is lost — and the in-kernel cos/sin/exp
#      transcendentals plus 4 ops/element vanish.  (The reference cannot do
#      this: its calibration quantizes K pre-RoPE, decode.cuh:92-126 rotates
#      after dequant.  We quantize post-RoPE; same bit budget, same asym
#      per-head scheme.)
#   2. q is quantized to per-(token, head) symmetric INT8, so q.K^T runs as an
#      int8 x u4 MXU dot on the RAW K codes — no dequant of K at all:
#          q.k_s = qscale * (sum_d qq_d c_ds) * kscale_s + qscale * qsum * kzero_s
#      One integer dot + two lane-wise f32 ops replace 5 VPU ops/element.
#      (INT8 q costs ~0.2% relative score error — an order below the INT4
#      activation quantization everywhere else in the model.)
#
# V handling is unchanged (dequant folded into the probability vector).


def _decode_kernel_q8(
    pt_ref, sl_ref,
    qq_ref,    # int8 [1, Hb*G, D] — q codes
    qmeta_ref,  # f32 [1, Hb*G, 128] — lane 0: qscale*sm_scale, lane 1: qsum
    kp_ref, kprm_ref, vp_ref, vprm_ref,
    o_ref,
    acc_ref, m_ref, l_ref,
    *,
    head_block: int,
    groups: int,
    page_size: int,
    head_dim: int,
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
            ).astype(jnp.int8)  # [D, S] u4 codes, post-RoPE
            r0 = hh * groups
            qq = qq_ref[0, r0 : r0 + groups, :]  # [G, D] int8
            int_dot = jax.lax.dot_general(
                qq, k_codes,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # [G, S]
            k_scale = kprm_ref[0, hh, 0:1, :]
            k_zero = kprm_ref[0, hh, 1:2, :]
            q_scale = qmeta_ref[0, r0 : r0 + groups, 0:1]  # [G, 1]
            q_sum = qmeta_ref[0, r0 : r0 + groups, 1:2]
            scores = (int_dot * k_scale + q_sum * k_zero) * q_scale
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
            ).astype(jnp.float32)  # [S, D]
            v_scale = vprm_ref[0, hh, 0:1, :]
            v_zero = vprm_ref[0, hh, 1:2, :]
            pv = jax.lax.dot_general(
                p * v_scale, v_codes,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
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


def _decode_kernel_rot(
    pt_ref, sl_ref,
    q_ref,     # [1, Hb*G, D] bf16/f32 — RoPE'd queries
    kp_ref, kprm_ref, vp_ref, vprm_ref,
    o_ref,
    acc_ref, m_ref, l_ref,
    *,
    head_block: int,
    groups: int,
    page_size: int,
    sm_scale: float,
):
    """K stored POST-RoPE; scores = (q . codes) * kscale + rowsum(q) * kzero.

    The affine trick keeps K as raw codes all the way into the MXU-side f32
    dot — per K element only unpack + int->f32 convert, no dequant multiplies
    and no trigonometry (see the v2 block comment)."""
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
            ).astype(jnp.float32)  # [D, S]
            r0 = hh * groups
            q_h = q_ref[0, r0 : r0 + groups, :].astype(jnp.float32)  # [G, D]
            q_sum = jnp.sum(q_h, axis=1, keepdims=True)  # [G, 1]
            dot = jax.lax.dot_general(
                q_h, k_codes,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, S]
            k_scale = kprm_ref[0, hh, 0:1, :]
            k_zero = kprm_ref[0, hh, 1:2, :]
            scores = (dot * k_scale + q_sum * k_zero) * sm_scale
            scores = jnp.where(valid, scores, _NEG_INF)

            m_prev = m_ref[r0 : r0 + groups, 0:1]
            l_prev = l_ref[r0 : r0 + groups, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

            vb = vp_ref[0, hh].astype(jnp.int32)  # [S/2, D]
            v_codes = jnp.concatenate(
                [vb & 0x0F, (vb >> 4) & 0x0F], axis=0
            ).astype(jnp.float32)  # [S, D]
            v_scale = vprm_ref[0, hh, 0:1, :]
            v_zero = vprm_ref[0, hh, 1:2, :]
            pv = jax.lax.dot_general(
                p * v_scale, v_codes,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
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


@functools.partial(
    jax.jit,
    static_argnames=("head_block", "out_dtype", "interpret"),
)
def paged_decode_attention_rot(
    q: jnp.ndarray,  # [B, HQ, D] — RoPE already applied; kv-head-major
    pages: KVPages,  # K pages hold POST-RoPE codes
    page_table: jnp.ndarray,
    seq_lens: jnp.ndarray,
    head_block: int = 16,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Rotated-K decode attention with f32 affine-corrected code dots."""
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
    max_pages = page_table.shape[1]
    sm_scale = 1.0 / math.sqrt(d)

    seq_lens = seq_lens.astype(jnp.int32)
    page_table = page_table.astype(jnp.int32)

    def page_of(i_b, i_h, i_p, pt, sl):
        last = jnp.maximum(pl.cdiv(sl[i_b], s) - 1, 0)
        return pt[i_b, jnp.minimum(i_p, last)]

    grid = (b, h // hb, max_pages)
    kernel = functools.partial(
        _decode_kernel_rot,
        head_block=hb,
        groups=groups,
        page_size=s,
        sm_scale=sm_scale,
    )
    out = pl.pallas_call(
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
            out_specs=pl.BlockSpec(
                (1, hb * groups, d), lambda ib, ih, ip, pt, sl: (ib, ih, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hb * groups, d), jnp.float32),
                pltpu.VMEM((hb * groups, 128), jnp.float32),
                pltpu.VMEM((hb * groups, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, seq_lens, q, pages.k_pages, pages.k_params,
      pages.v_pages, pages.v_params)
    return out


def _decode_kernel_rot_mha(
    pt_ref, sl_ref,
    q_ref,     # [1, Hb, D]
    kp_ref, kprm_ref, vp_ref, vprm_ref,
    o_ref,
    acc_ref, m_ref, l_ref,
    *,
    page_size: int,
    sm_scale: float,
):
    """MHA (groups == 1) fast path: NO per-head loop — every op runs on the
    whole [Hb, ...] block, so op-issue overhead amortizes across heads and the
    nibble planes feed multiply-reduce chains directly (no concat, no per-head
    slicing).  Score reduction over channels runs as a sublane reduction on
    the VPU; per-element cost is unpack + convert + 2 multiply-adds."""
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

        q = q_ref[0].astype(jnp.float32)  # [Hb, D]
        half = q.shape[1] // 2
        q_lo = q[:, :half][:, :, None]  # [Hb, D/2, 1]
        q_hi = q[:, half:][:, :, None]
        q_sum = jnp.sum(q, axis=1, keepdims=True)  # [Hb, 1]

        kb = kp_ref[0].astype(jnp.int32)  # [Hb, D/2, S]
        k_lo = (kb & 0x0F).astype(jnp.float32)
        k_hi = ((kb >> 4) & 0x0F).astype(jnp.float32)
        dot = jnp.sum(q_lo * k_lo + q_hi * k_hi, axis=1)  # [Hb, S]
        k_scale = kprm_ref[0, :, 0, :]  # [Hb, S]
        k_zero = kprm_ref[0, :, 1, :]
        scores = (dot * k_scale + q_sum * k_zero) * sm_scale
        scores = jnp.where(valid, scores, _NEG_INF)

        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # [Hb, S]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

        vb = vp_ref[0].astype(jnp.int32)  # [Hb, S/2, D]
        v_lo = (vb & 0x0F).astype(jnp.float32)
        v_hi = ((vb >> 4) & 0x0F).astype(jnp.float32)
        p2 = p * vprm_ref[0, :, 0, :]  # fold V scale into the probabilities
        shalf = s // 2
        pv = jnp.sum(
            p2[:, :shalf][:, :, None] * v_lo + p2[:, shalf:][:, :, None] * v_hi, axis=1
        )  # [Hb, D]
        z_corr = jnp.sum(p * vprm_ref[0, :, 1, :], axis=1, keepdims=True)

        acc_ref[:] = acc_ref[:] * alpha + pv + z_corr
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == n_blocks - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0:1], 1e-20)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("head_block", "out_dtype", "interpret"),
)
def paged_decode_attention_mha(
    q: jnp.ndarray,
    pages: KVPages,  # K pages hold POST-RoPE codes
    page_table: jnp.ndarray,
    seq_lens: jnp.ndarray,
    head_block: int = 16,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-block rotated-K decode attention; requires num_heads == kv_heads."""
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    b, hq, d = q.shape
    h = pages.kv_heads
    s = pages.page_size
    assert hq == h, "MHA fast path needs groups == 1"
    hb = min(head_block, h)
    while hb < h and (h % hb != 0 or hb % 8 != 0):
        hb += 1
    max_pages = page_table.shape[1]
    sm_scale = 1.0 / math.sqrt(d)

    seq_lens = seq_lens.astype(jnp.int32)
    page_table = page_table.astype(jnp.int32)

    def page_of(i_b, i_h, i_p, pt, sl):
        last = jnp.maximum(pl.cdiv(sl[i_b], s) - 1, 0)
        return pt[i_b, jnp.minimum(i_p, last)]

    grid = (b, h // hb, max_pages)
    kernel = functools.partial(
        _decode_kernel_rot_mha, page_size=s, sm_scale=sm_scale
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, hb, d), lambda ib, ih, ip, pt, sl: (ib, ih, 0)
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
            out_specs=pl.BlockSpec(
                (1, hb, d), lambda ib, ih, ip, pt, sl: (ib, ih, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hb, d), jnp.float32),
                pltpu.VMEM((hb, 128), jnp.float32),
                pltpu.VMEM((hb, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, seq_lens, q, pages.k_pages, pages.k_params,
      pages.v_pages, pages.v_params)
    return out


def paged_decode_attention_rotated(
    q: jnp.ndarray,
    pages: KVPages,
    page_table: jnp.ndarray,
    seq_lens: jnp.ndarray,
    head_block: int = 16,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Rotated-K decode attention — the serving path's kernel.

    The per-head MXU-dot structure wins at every measured configuration
    (page 256, head_block 16: 413 GB/s effective at bs=32/ctx=1024 on v5e);
    the whole-block VPU variant (``paged_decode_attention_mha``) and the
    int8-score variant (``_q8``) measured slower and remain for reference.
    """
    return paged_decode_attention_rot(
        q, pages, page_table, seq_lens,
        head_block=head_block, out_dtype=out_dtype, interpret=interpret,
    )


def quantize_q_int8(q: jnp.ndarray):
    """Per-(token, head) symmetric INT8 quantization of queries.

    Returns (codes int8 [B, H, D], scale f32 [B, H], sums f32 [B, H])."""
    q32 = q.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(q32), axis=-1), 1e-20) / 127.0
    codes = jnp.clip(
        jnp.round(q32 / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return codes, scale, jnp.sum(codes.astype(jnp.float32), axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("head_block", "out_dtype", "interpret"),
)
def paged_decode_attention_q8(
    q: jnp.ndarray,  # [B, HQ, D] — RoPE already applied; kv-head-major
    pages: KVPages,  # K pages hold POST-RoPE codes
    page_table: jnp.ndarray,
    seq_lens: jnp.ndarray,
    head_block: int = 16,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Production decode attention (see the v2 block comment)."""
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

    qq, q_scale, q_sum = quantize_q_int8(q)
    qmeta = jnp.zeros((b, hq, 128), jnp.float32)
    qmeta = qmeta.at[:, :, 0].set(q_scale * sm_scale)
    qmeta = qmeta.at[:, :, 1].set(q_sum)

    def page_of(i_b, i_h, i_p, pt, sl):
        last = jnp.maximum(pl.cdiv(sl[i_b], s) - 1, 0)
        return pt[i_b, jnp.minimum(i_p, last)]

    grid = (b, h // hb, max_pages)
    kernel = functools.partial(
        _decode_kernel_q8,
        head_block=hb,
        groups=groups,
        page_size=s,
        head_dim=d,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, hb * groups, d), lambda ib, ih, ip, pt, sl: (ib, ih, 0)
                ),
                pl.BlockSpec(
                    (1, hb * groups, 128), lambda ib, ih, ip, pt, sl: (ib, ih, 0)
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
            out_specs=pl.BlockSpec(
                (1, hb * groups, d), lambda ib, ih, ip, pt, sl: (ib, ih, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hb * groups, d), jnp.float32),
                pltpu.VMEM((hb * groups, 128), jnp.float32),
                pltpu.VMEM((hb * groups, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, seq_lens,
      qq.reshape(b, h, groups, d).reshape(b, hq, d),
      qmeta.reshape(b, h, groups, 128).reshape(b, hq, 128),
      pages.k_pages, pages.k_params, pages.v_pages, pages.v_params)
    return out.reshape(b, h, groups, d).reshape(b, hq, d)
