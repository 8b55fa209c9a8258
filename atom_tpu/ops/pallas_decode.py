"""Pallas TPU kernel: paged INT4 fused-dequant decode attention.

The per-token hot kernel of the serving path — TPU-first redesign of the
reference's FlashInfer fork (``BatchDecodeWithPagedKVCacheKernel``,
``kernels/include/flashinfer/decode.cuh:492-851``):

  * K/V stream from HBM as 4-bit slot-plane nibbles (``kv_layout.KVPages``)
    and feed the MXU as RAW codes — attention HBM traffic is genuinely
    4 bits/element (the CUDA analog is ``cast_load`` + 8-per-u32 unpack,
    ``quantization.cuh:66-80``).
  * K is stored POST-RoPE (rotated in f32 right before quantization at append
    time), so the kernel does no trigonometry at all.  The reference instead
    stores pre-RoPE and rotates after dequant (``decode.cuh:92-126``) because
    its calibration pipeline quantizes pre-RoPE; same bit budget either way.
  * K is never dequantized: with per-slot affine params
    ``k_s = c_s * scale_s + zero_s``,
        q . k_s = (q . c_s) * scale_s + (sum_d q_d) * zero_s
    — one MXU dot against the raw codes plus two lane-wise multiply-adds.
    V's dequant folds into the probability vector the same way
    (``out = (p * vscale) @ codes + rowsum(p * vzero)``).
  * Online softmax carried in VMEM scratch across the page-grid axis (the
    CUDA analog is ``state_t`` merge, ``state.cuh``).
  * Page gather rides the grid: a scalar-prefetched page table drives the
    BlockSpec index maps, and past-the-end steps clamp to the sequence's last
    page so Mosaic's revisiting pipeline skips the DMA — per-sequence HBM
    traffic is proportional to its ACTUAL length, not the batch max.

Both K and V pages are SLOT-major ([P, H, S/2, D] nibble planes): their
decode-append is a sublane-indexed dynamic-update-slice, which XLA:TPU keeps
in the default layout and updates in place.  (A lane-indexed K layout measured
three full-pool layout-rotation copies per decode step — see kv_layout.py.)

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
    sl_ref,  # int32 [B]
    # inputs
    q_ref,     # [1, Hb*G, D] bf16/f32 — RoPE'd queries
    kp_ref,    # int8 [1, Hb, S/2, D] — slot-plane u4 codes (post-RoPE)
    kprm_ref,  # f32 [1, Hb, 2, S]
    vp_ref,    # int8 [1, Hb, S/2, D]
    vprm_ref,  # f32 [1, Hb, 2, S]
    # output
    o_ref,     # [1, Hb*G, D]
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
            kb = kp_ref[0, hh].astype(jnp.int32)  # [S/2, D]
            k_codes = jnp.concatenate(
                [kb & 0x0F, (kb >> 4) & 0x0F], axis=0
            ).astype(jnp.float32)  # [S, D] true slot order
            r0 = hh * groups
            q_h = q_ref[0, r0 : r0 + groups, :].astype(jnp.float32)  # [G, D]
            q_sum = jnp.sum(q_h, axis=1, keepdims=True)  # [G, 1]
            dot = jax.lax.dot_general(
                q_h, k_codes,
                dimension_numbers=(((1,), (1,)), ((), ())),  # q @ codes^T
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
            ).astype(jnp.float32)  # [S, D]
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


@functools.partial(
    jax.jit,
    static_argnames=("head_block", "out_dtype", "interpret"),
)
def paged_decode_attention_rotated(
    q: jnp.ndarray,  # [B, HQ, D] — RoPE already applied; kv-head-major
    pages: KVPages,  # K pages hold POST-RoPE codes
    page_table: jnp.ndarray,  # int32 [B, max_pages]
    seq_lens: jnp.ndarray,  # int32 [B] (length INCLUDING the current token)
    head_block: int = 16,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """The production decode attention (see module docstring).

    Measured on v5e at batch 32, 32 heads, ctx 1024, page 256: >400 GB/s
    effective KV bandwidth — 2.2x a dequant+rope-in-kernel variant, i.e. the
    4-bit stream buys its full memory-traffic advantage over bf16 KV.
    """
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    b, hq, d = q.shape
    h = pages.kv_heads
    s = pages.page_size
    groups = hq // h
    assert hq % h == 0 and d == pages.head_dim
    hb = min(head_block, h)
    # Mosaic: q/out block sublane dim (hb*groups) divisible by 8, or full.
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
    kernel = functools.partial(
        _decode_kernel,
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
                    (1, hb, s // 2, d),
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


# ---------------------------------------------------------------------------
# In-place per-token KV append (codes + params, one kernel)
# ---------------------------------------------------------------------------


def _codes_append_kernel(
    pg_ref, sl_ref,
    kc_ref,   # int8 [1, H, D] — u4 K codes of token b
    vc_ref,
    kpi_ref,  # int8 [1, H, 8, D] — the 8-sublane row group holding the slot
    vpi_ref,
    kpo_ref, vpo_ref,
    *,
    half_s: int,
):
    b = pl.program_id(0)
    s = sl_ref[b]
    r_loc = (s % half_s) % 8
    in_low = s < half_s
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)

    def merge(old_ref, codes_ref, out_ref):
        old = old_ref[0].astype(jnp.int32) & 0xFF  # [H, 8, D]
        c = codes_ref[0].astype(jnp.int32)[:, None, :] & 0x0F  # [H, 1, D]
        merged = jnp.where(in_low, (old & 0xF0) | c, (old & 0x0F) | (c << 4))
        out_ref[0] = jnp.where(sub == r_loc, merged, old).astype(jnp.int8)

    merge(kpi_ref, kc_ref, kpo_ref)
    merge(vpi_ref, vc_ref, vpo_ref)


def append_kv_decode_pallas(
    pages,  # KVPages
    k_codes: jnp.ndarray,   # int8 [B, H, D] u4
    k_params: jnp.ndarray,  # f32 [B, H, 2]
    v_codes: jnp.ndarray,
    v_params: jnp.ndarray,
    page_idx: jnp.ndarray,  # int32 [B]
    slot: jnp.ndarray,      # int32 [B]
    interpret: bool = False,
):
    """One-token-per-sequence paged append, fully in place.

    Both XLA alternatives copy: vector-indexed scatter copies the whole pool,
    and a fori-loop of per-token DUS costs ~25us/token in loop overhead.
    Here grid step ``b`` RMWs exactly the 8-sublane row group (codes) and the
    params block of ITS page via ``input_output_aliases`` — ~130 KB of DMA per
    token, pipelined across the batch grid.
    """
    from atom_tpu.ops.kv_layout import KVPages
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    bsz, h, d = k_codes.shape
    s_size = pages.page_size
    half_s = s_size // 2

    def row_grp(b, pg, sl):
        return (sl[b] % half_s) // 8

    kernel = functools.partial(_codes_append_kernel, half_s=half_s)
    k_pages, v_pages = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec((1, h, d), lambda b, pg, sl: (b, 0, 0)),
                pl.BlockSpec((1, h, d), lambda b, pg, sl: (b, 0, 0)),
                pl.BlockSpec(
                    (1, h, 8, d),
                    lambda b, pg, sl: (pg[b], 0, row_grp(b, pg, sl), 0),
                ),
                pl.BlockSpec(
                    (1, h, 8, d),
                    lambda b, pg, sl: (pg[b], 0, row_grp(b, pg, sl), 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, h, 8, d),
                    lambda b, pg, sl: (pg[b], 0, row_grp(b, pg, sl), 0),
                ),
                pl.BlockSpec(
                    (1, h, 8, d),
                    lambda b, pg, sl: (pg[b], 0, row_grp(b, pg, sl), 0),
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(pages.k_pages.shape, jnp.int8),
            jax.ShapeDtypeStruct(pages.v_pages.shape, jnp.int8),
        ],
        # after the 2 scalar-prefetch args: codes 2..3, pages 4..5
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page_idx, slot, k_codes, v_codes, pages.k_pages, pages.v_pages)

    k_params_new, v_params_new = append_params_pallas(
        pages.k_params, pages.v_params, k_params, v_params, page_idx, slot,
        interpret=interpret,
    )
    return KVPages(k_pages, k_params_new, v_pages, v_params_new)


# ---------------------------------------------------------------------------
# In-place per-token params append (the lane-indexed piece XLA can't DUS)
# ---------------------------------------------------------------------------


def _params_append_kernel(pg_ref, sl_ref, newk_ref, newv_ref, kprm_ref,
                          vprm_ref, kout_ref, vout_ref):
    b = pl.program_id(0)
    s = kout_ref.shape[3]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    mask = lane == sl_ref[b]  # [1, S]
    kout_ref[0] = jnp.where(mask, newk_ref[0][:, :, None], kprm_ref[0])
    vout_ref[0] = jnp.where(mask, newv_ref[0][:, :, None], vprm_ref[0])


def append_params_pallas(
    k_params: jnp.ndarray,  # f32 [P, H, 2, S]
    v_params: jnp.ndarray,
    new_k: jnp.ndarray,  # f32 [B, H, 2]
    new_v: jnp.ndarray,
    page_idx: jnp.ndarray,  # int32 [B]
    slot: jnp.ndarray,  # int32 [B]
    interpret: bool = False,
):
    """Write each token's (scale, zero_val) into lane ``slot`` of its page.

    The slot is a LANE index, so an XLA dynamic-update-slice flips the params
    arrays into a rotated layout and copies the whole pool every step
    (measured on v5e); this kernel instead RMWs only the B touched page
    blocks, in place via ``input_output_aliases``.
    """
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    bsz = new_k.shape[0]
    _, h, _, s = k_params.shape
    return pl.pallas_call(
        _params_append_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec((1, h, 2), lambda b, pg, sl: (b, 0, 0)),
                pl.BlockSpec((1, h, 2), lambda b, pg, sl: (b, 0, 0)),
                pl.BlockSpec((1, h, 2, s), lambda b, pg, sl: (pg[b], 0, 0, 0)),
                pl.BlockSpec((1, h, 2, s), lambda b, pg, sl: (pg[b], 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, h, 2, s), lambda b, pg, sl: (pg[b], 0, 0, 0)),
                pl.BlockSpec((1, h, 2, s), lambda b, pg, sl: (pg[b], 0, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_params.shape, k_params.dtype),
            jax.ShapeDtypeStruct(v_params.shape, v_params.dtype),
        ],
        # params arrays are inputs 2/3 after the two scalar-prefetch args
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page_idx, slot, new_k, new_v, k_params, v_params)
