"""Pure-jnp reference implementations of the serving ops (the kernel oracle).

One function per fused CUDA kernel in the reference's serving stack
(SURVEY.md §2.2), with identical quantization semantics but TPU-shaped
interfaces (plain scale arrays, padded page tables instead of CSR).  These are
correct, jittable, and run everywhere; ``atom_tpu.ops.dispatch`` swaps in the
Pallas kernels where they exist, and every Pallas kernel is tested against
these functions.

Reference kernel -> oracle mapping:
  * ``DenseLayerGEMM_i4_o16/_i4``  -> :func:`quant_gemm`
  * ``DenseLayerGEMM_i4_o4``       -> :func:`quant_gemm_o4`
  * ``rmsnorm_fp16_i4``            -> :func:`rmsnorm_reorder_quant`
  * ``reorder_fp16_i4``            -> :func:`reorder_quant`
  * ``activate_fp16_i4``           -> :func:`silu_mul_quant`
  * ``init_kv_i4`` / ``append_kv_i4`` -> :func:`append_kv_prefill` / :func:`append_kv_decode`
  * ``batch_decode_i4``            -> :func:`batch_decode`
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from atom_tpu.config import QuantSpec
from atom_tpu.models.nn import rmsnorm, rope_tables
from atom_tpu.ops.formats import (
    PackedWeight,
    QuantizedActivation,
    quantize_activation_packed,
)
from atom_tpu.quant.packing import pack_uint4, unpack_uint4


# ---------------------------------------------------------------------------
# Dual-path GEMM
# ---------------------------------------------------------------------------


def quant_gemm(
    qa: QuantizedActivation, pw: PackedWeight, out_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """D[T, N] = dequant(A_i4 . W_i4) + dequant(A_i8 . W_i8) — the core op.

    Integer dot per 128-group with the scale product applied on the int32
    partial sums, mirroring the reference's per-K-group in-register dequant
    (``Dense_layer_gemm_i4_o16.cuh:582-587``) and its INT8 keeper epilogue
    (``:590-691``).
    """
    t, kb = qa.body.shape
    ng = qa.body_scale.shape[1]
    g = kb // ng
    n = pw.body.shape[1]

    a = qa.body.reshape(t, ng, g)
    w = pw.body.reshape(ng, g, n)
    # int8 x int8 -> int32 group dots (MXU-native on v5e+).
    acc = jnp.einsum(
        "tgi,gio->tgo", a, w, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    body = jnp.einsum("tgo,tg,go->to", acc, qa.body_scale, pw.body_scale)

    kacc = jnp.einsum(
        "ti,io->to", qa.keeper, pw.keeper, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    keeper = kacc * (qa.keeper_scale * pw.keeper_scale[None, :])
    return (body + keeper).astype(out_dtype)


class KVQuant(NamedTuple):
    """Asymmetric INT4 codes + per-(token, head) affine params for the KV cache.

    ``codes``: int8 [T, H, D] with values in [0, 15];
    ``params``: f32 [T, H, 2] = (scale, zero_val); dequant = codes * scale + zero_val.
    """

    codes: jnp.ndarray
    params: jnp.ndarray


def quantize_kv_asym(x: jnp.ndarray, clip_ratio: float = 1.0) -> KVQuant:
    """Per-(token, head) asym INT4 over head_dim (``quant.py:234-257`` semantics,
    the serving-side real-code variant).

    Scale and zero_val are rounded to bf16 AT THE SOURCE: the paged cache
    stores params as bf16 ([P, 4, H, S], see ``kv_layout``), and rounding
    here means prefill math, the hot ring, and the decode kernel all consume
    bit-identical values (decode == prefill is preserved).  The rounding
    perturbs the dequant grid by <=0.4%% of a step — far below the +-scale/2
    code rounding itself (the reference stores fp16 params, same idea:
    ``page.cuh:15-37``).
    """
    x32 = x.astype(jnp.float32)
    xmax = jnp.max(x32, axis=-1, keepdims=True) * clip_ratio
    xmin = jnp.min(x32, axis=-1, keepdims=True) * clip_ratio
    scale = jnp.maximum(xmax - xmin, 1e-5) / 15.0
    scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
    zero = jnp.clip(jnp.round(-xmin / scale), 0, 15)
    codes = jnp.clip(jnp.round(x32 / scale) + zero, 0, 15).astype(jnp.int8)
    zero_val = (-zero * scale).astype(jnp.bfloat16).astype(jnp.float32)
    params = jnp.concatenate([scale, zero_val], axis=-1)
    return KVQuant(codes=codes, params=params)


def dequantize_kv(codes: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """codes [..., D] int, params [..., 2] -> f32 values."""
    return codes.astype(jnp.float32) * params[..., 0:1] + params[..., 1:2]


def quant_gemm_o4(
    qa: QuantizedActivation, pw: PackedWeight, head_dim: int = 128
) -> KVQuant:
    """GEMM with fused asymmetric re-quantization of the output per
    ``head_dim``-group — the k_proj/v_proj path feeding the INT4 KV cache
    (``DenseLayerGEMM_i4_o4.cu:728-775``).

    Returns per-(token, head) codes/params, head-major ([T, N/head_dim, head_dim]).
    """
    out = quant_gemm(qa, pw, out_dtype=jnp.float32)
    t, n = out.shape
    heads = out.reshape(t, n // head_dim, head_dim)
    return quantize_kv_asym(heads)


# ---------------------------------------------------------------------------
# Fused quantize epilogues
# ---------------------------------------------------------------------------


def rmsnorm_reorder_quant(
    x: jnp.ndarray,
    norm_weight: jnp.ndarray,
    reorder_idx: jnp.ndarray,
    spec: QuantSpec,
    eps: float = 1e-5,
) -> QuantizedActivation:
    """RMSNorm -> channel gather -> dual-path dynamic quant (``RMSNorm.cuh:67-200``)."""
    y = rmsnorm(x, norm_weight, eps)
    y = jnp.take(y, reorder_idx, axis=-1)
    return quantize_activation_packed(y, spec)


def reorder_quant(
    x: jnp.ndarray, reorder_idx: jnp.ndarray, spec: QuantSpec
) -> QuantizedActivation:
    """Channel gather -> dual-path dynamic quant (``Reorder.cuh:109-189``)."""
    return quantize_activation_packed(jnp.take(x, reorder_idx, axis=-1), spec)


def silu_mul_quant(
    gate: jnp.ndarray, up: jnp.ndarray, spec: QuantSpec
) -> QuantizedActivation:
    """quant(SiLU(gate) * up) — the MLP epilogue (``Activate.cuh:68-195``).

    No reorder here: gate/up weights were out-reordered at calibration so the
    product is already in down_proj's input order (``modelutils_llama.py:33-44``).
    """
    act = jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
    return quantize_activation_packed(act, spec)


# ---------------------------------------------------------------------------
# Paged INT4 KV cache
# ---------------------------------------------------------------------------
#
# Layout (TPU-shaped equivalent of ``paged_kv_t``, page.cuh:15-37):
#   k_pages / v_pages : int8  [n_pages, kv_heads, page_size, head_dim // 2]
#                       (two u4 codes per byte, packed along head_dim)
#   k_params / v_params : f32 [n_pages, kv_heads, page_size, 2]  (scale, zero_val)
# Batch addressing uses a PADDED page table [B, max_pages] + seq_lens [B]
# instead of CSR indptr/indices — static shapes under jit; the serving KV pool
# maintains the table.


def make_kv_pages(
    n_pages: int, kv_heads: int, page_size: int, head_dim: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    pages = jnp.zeros((n_pages, kv_heads, page_size, head_dim // 2), jnp.int8)
    params = jnp.zeros((n_pages, kv_heads, page_size, 2), jnp.float32)
    return pages, params


def append_kv_decode(
    pages: jnp.ndarray,
    params: jnp.ndarray,
    kv: KVQuant,  # codes [B, kv_heads, head_dim], params [B, kv_heads, 2]
    page_idx: jnp.ndarray,  # [B] destination page per sequence
    slot: jnp.ndarray,  # [B] destination slot within the page
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter one new token per sequence into its page
    (``AppendPagedKVCacheDecodeKernel``, page.cuh:119-130)."""
    packed = pack_uint4(kv.codes)  # [B, H, D/2]
    pages = pages.at[page_idx, :, slot].set(packed.astype(jnp.int8))
    params = params.at[page_idx, :, slot].set(kv.params)
    return pages, params


def append_kv_prefill(
    pages: jnp.ndarray,
    params: jnp.ndarray,
    kv: KVQuant,  # codes [T, kv_heads, head_dim] for one sequence
    page_table_row: jnp.ndarray,  # [max_pages] page ids of this sequence
    page_size: int,
    start_pos: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter a whole prefill sequence into its pages
    (``AppendPagedKVCachePrefillKernel``, page.cuh:132-175-equivalent)."""
    t = kv.codes.shape[0]
    positions = jnp.arange(t) + start_pos
    page_of = page_table_row[positions // page_size]
    slot_of = positions % page_size
    packed = pack_uint4(kv.codes).astype(jnp.int8)
    pages = pages.at[page_of, :, slot_of].set(packed)
    params = params.at[page_of, :, slot_of].set(kv.params)
    return pages, params


def gather_kv(
    pages: jnp.ndarray,
    params: jnp.ndarray,
    page_table_row: jnp.ndarray,  # [max_pages]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[max_pages * page_size, kv_heads, head_dim] dequant-ready codes + params."""
    pk = pages[page_table_row]  # [P, H, S, D/2]
    pp = params[page_table_row]  # [P, H, S, 2]
    p, h, s, dh = pk.shape
    codes = unpack_uint4(pk).transpose(0, 2, 1, 3).reshape(p * s, h, dh * 2)
    prm = pp.transpose(0, 2, 1, 3).reshape(p * s, h, 2)
    return codes, prm


def batch_decode(
    q: jnp.ndarray,  # [B, num_heads, head_dim] (RoPE already applied to q)
    k_pages: jnp.ndarray,
    k_params: jnp.ndarray,
    v_pages: jnp.ndarray,
    v_params: jnp.ndarray,
    page_table: jnp.ndarray,  # [B, max_pages]
    seq_lens: jnp.ndarray,  # [B] total tokens per sequence (incl. current)
    rope_theta: float = 10000.0,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused-dequant paged decode attention (``BatchDecodeWithPagedKVCacheKernel``,
    decode.cuh:492-851): K stored PRE-RoPE as u4; dequantize, apply RoPE at each
    key's absolute position, online-softmax against V.

    jnp oracle: gathers the whole (padded) KV and does masked softmax; the
    Pallas kernel streams pages with the same math.
    """
    b, num_heads, head_dim = q.shape
    kv_heads = k_pages.shape[1]
    groups = num_heads // kv_heads
    max_t = page_table.shape[1] * k_pages.shape[2]

    positions = jnp.arange(max_t)
    cos, sin = rope_tables(positions, head_dim, rope_theta)  # [T, D]

    def one_seq(qb, table_row, seq_len):
        k_codes, k_prm = gather_kv(k_pages, k_params, table_row)
        v_codes, v_prm = gather_kv(v_pages, v_params, table_row)
        k = dequantize_kv(k_codes, k_prm)  # [T, Hkv, D] f32
        v = dequantize_kv(v_codes, v_prm)
        # RoPE on dequantized K at its absolute position (decode.cuh:92-126).
        half = head_dim // 2
        k_rot = k * cos[:, None, :] + jnp.concatenate(
            [-k[..., half:], k[..., :half]], axis=-1
        ) * sin[:, None, :]

        k_rep = jnp.repeat(k_rot, groups, axis=1)  # [T, H, D]
        v_rep = jnp.repeat(v, groups, axis=1)
        scores = jnp.einsum("hd,thd->ht", qb.astype(jnp.float32), k_rep)
        scores = scores / jnp.sqrt(jnp.float32(head_dim))
        mask = (positions < seq_len)[None, :]
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("ht,thd->hd", probs, v_rep)

    out = jax.vmap(one_seq)(q, page_table, seq_lens)
    return out.astype(out_dtype)
