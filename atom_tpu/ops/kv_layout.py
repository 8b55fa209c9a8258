"""Kernel-native paged INT4 KV cache layout (TPU tile-aligned nibble planes).

The reference's ``paged_kv_t`` stores u4 codes packed along head_dim with a
CSR page table (``page.cuh:15-37``); its decode kernel unpacks 8-per-u32 during
``cast_load`` (``quantization.cuh:66-80``).  The TPU equivalent is chosen for
Mosaic's (sublane, lane) tiling and for zero in-kernel shuffles:

  * ``k_pages``  int8 [P, H, D/2, S]  — K stored CHANNEL-major (the decode
      kernel consumes K as ``K^T [D, S]`` for the q.K^T dot); byte (j, s)
      holds channels ``j`` (low nibble) and ``j + D/2`` (high nibble) of
      slot ``s``.  Unpack = two shifts + a sublane concat -> true channel
      order, no interleave.
  * ``v_pages``  int8 [P, H, S/2, D]  — V stored SLOT-major (consumed as
      ``V [S, D]`` for the probs.V dot); byte (r, d) holds slots ``r`` and
      ``r + S/2`` of channel ``d``.  Same plane-unpack -> true slot order.
  * ``k_params`` / ``v_params``  f32 [P, H, 2, S] — row 0 = scale, row 1 =
      zero_val (dequant: ``x = code * scale + zero_val``), lane-indexed by
      slot so dequant broadcasts over sublanes with no transpose.

With ``page_size = 128`` and ``head_dim = 128`` every plane is exactly one
(32/64, 128) int8 tile — DMAs carry zero padding.

Batch addressing is a PADDED page table ``[B, max_pages]`` + ``seq_lens [B]``
(static shapes under jit) instead of CSR ``indptr/indices``.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from atom_tpu.ops.reference import KVQuant
from atom_tpu.quant.packing import unpack_uint4


class KVPages(NamedTuple):
    """One layer's paged quantized KV cache in the kernel layout."""

    k_pages: jnp.ndarray   # int8 [P, H, D//2, S]
    k_params: jnp.ndarray  # f32  [P, H, 2, S]
    v_pages: jnp.ndarray   # int8 [P, H, S//2, D]
    v_params: jnp.ndarray  # f32  [P, H, 2, S]

    @property
    def n_pages(self) -> int:
        return self.k_pages.shape[0]

    @property
    def kv_heads(self) -> int:
        return self.k_pages.shape[1]

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def head_dim(self) -> int:
        return self.k_pages.shape[2] * 2


def make_kv_pages_kernel(
    n_pages: int, kv_heads: int, page_size: int, head_dim: int
) -> KVPages:
    assert page_size % 2 == 0 and head_dim % 2 == 0
    return KVPages(
        k_pages=jnp.zeros((n_pages, kv_heads, head_dim // 2, page_size), jnp.int8),
        k_params=jnp.zeros((n_pages, kv_heads, 2, page_size), jnp.float32),
        v_pages=jnp.zeros((n_pages, kv_heads, page_size // 2, head_dim), jnp.int8),
        v_params=jnp.zeros((n_pages, kv_heads, 2, page_size), jnp.float32),
    )


def _pack_k_planes(codes: jnp.ndarray) -> jnp.ndarray:
    """u4 codes [..., D, S] -> channel-plane bytes [..., D/2, S]."""
    d = codes.shape[-2]
    lo = codes[..., : d // 2, :].astype(jnp.uint8) & 0x0F
    hi = codes[..., d // 2 :, :].astype(jnp.uint8) & 0x0F
    return (lo | (hi << 4)).astype(jnp.int8)


def _pack_v_planes(codes: jnp.ndarray) -> jnp.ndarray:
    """u4 codes [..., S, D] -> slot-plane bytes [..., S/2, D]."""
    s = codes.shape[-2]
    lo = codes[..., : s // 2, :].astype(jnp.uint8) & 0x0F
    hi = codes[..., s // 2 :, :].astype(jnp.uint8) & 0x0F
    return (lo | (hi << 4)).astype(jnp.int8)


def _unpack_planes(pb: jnp.ndarray) -> jnp.ndarray:
    """plane bytes [..., X/2, Y] -> u4 codes [..., X, Y] (int8 in [0, 15])."""
    b = pb.astype(jnp.uint8)
    lo = (b & 0x0F).astype(jnp.int8)
    hi = (b >> 4).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=-2)


def append_kv_decode_kernel(
    pages: KVPages,
    k: KVQuant,  # codes [B, H, D] u4-in-int8, params [B, H, 2]
    v: KVQuant,
    page_idx: jnp.ndarray,  # int32 [B]
    slot: jnp.ndarray,      # int32 [B]
) -> KVPages:
    """Scatter one new token per sequence (``AppendPagedKVCacheDecodeKernel``,
    page.cuh:119-130 equivalent) into the kernel layout."""
    s_size = pages.page_size
    d = pages.head_dim
    half_s = s_size // 2

    # K: one token owns a whole byte column [H, D/2].
    kc = k.codes.astype(jnp.uint8) & 0x0F  # [B, H, D]
    k_col = (kc[..., : d // 2] | (kc[..., d // 2 :] << 4)).astype(jnp.int8)
    # advanced indices separated by slices: result shape [B, H, D/2]
    k_pages = pages.k_pages.at[page_idx, :, :, slot].set(k_col)
    k_params = pages.k_params.at[page_idx, :, 0, slot].set(k.params[..., 0])
    k_params = k_params.at[page_idx, :, 1, slot].set(k.params[..., 1])

    # V: a byte mixes slots r and r + S/2 -> read-modify-write the row.
    vc = (v.codes.astype(jnp.uint8) & 0x0F).astype(jnp.int32)  # [B, H, D]
    row = slot % half_s
    in_low = (slot < half_s)[:, None, None]
    old = pages.v_pages[page_idx, :, row, :].astype(jnp.int32) & 0xFF
    new = jnp.where(
        in_low, (old & 0xF0) | vc, (old & 0x0F) | (vc << 4)
    ).astype(jnp.int8)
    v_pages = pages.v_pages.at[page_idx, :, row, :].set(new)
    v_params = pages.v_params.at[page_idx, :, 0, slot].set(v.params[..., 0])
    v_params = v_params.at[page_idx, :, 1, slot].set(v.params[..., 1])
    return KVPages(k_pages, k_params, v_pages, v_params)


def append_kv_prefill_kernel(
    pages: KVPages,
    k: KVQuant,  # codes [T, H, D], params [T, H, 2] — one fresh sequence
    v: KVQuant,
    page_table_row: jnp.ndarray,  # int32 [max_pages]
) -> KVPages:
    """Write a whole fresh prefill sequence page-at-a-time (vectorized, no
    read-modify-write; ``AppendPagedKVCachePrefillKernel`` equivalent).

    Every page touched is fully overwritten (tail slots zeroed), so this must
    only be used for FRESH sequences — which is the only way the serving
    engine prefills.
    """
    t, h, d = k.codes.shape
    s_size = pages.page_size
    n_full = -(-t // s_size)

    def pad_seq(x):
        return jnp.pad(x, ((0, n_full * s_size - t),) + ((0, 0),) * (x.ndim - 1))

    kc = pad_seq(k.codes).reshape(n_full, s_size, h, d)
    vc = pad_seq(v.codes).reshape(n_full, s_size, h, d)
    kp = pad_seq(k.params).reshape(n_full, s_size, h, 2)
    vp = pad_seq(v.params).reshape(n_full, s_size, h, 2)

    k_bytes = _pack_k_planes(kc.transpose(0, 2, 3, 1))  # [P, H, D/2, S]
    v_bytes = _pack_v_planes(vc.transpose(0, 2, 1, 3))  # [P, H, S/2, D]
    dest = page_table_row[:n_full]
    return KVPages(
        k_pages=pages.k_pages.at[dest].set(k_bytes),
        k_params=pages.k_params.at[dest].set(kp.transpose(0, 2, 3, 1)),
        v_pages=pages.v_pages.at[dest].set(v_bytes),
        v_params=pages.v_params.at[dest].set(vp.transpose(0, 2, 3, 1)),
    )


# ---------------------------------------------------------------------------
# Converters to/from the plain reference layout (tests / tooling)
# ---------------------------------------------------------------------------


def kv_pages_from_reference(
    k_pages_ref: jnp.ndarray,  # int8 [P, H, S, D/2]  (pack_uint4 along D)
    k_params_ref: jnp.ndarray,  # f32 [P, H, S, 2]
    v_pages_ref: jnp.ndarray,
    v_params_ref: jnp.ndarray,
) -> KVPages:
    k_codes = unpack_uint4(k_pages_ref)  # [P, H, S, D]
    v_codes = unpack_uint4(v_pages_ref)
    return KVPages(
        k_pages=_pack_k_planes(jnp.swapaxes(k_codes, -1, -2)),
        k_params=jnp.swapaxes(k_params_ref, -1, -2),
        v_pages=_pack_v_planes(v_codes),
        v_params=jnp.swapaxes(v_params_ref, -1, -2),
    )


def kv_codes_from_kernel(pages: KVPages) -> Tuple[jnp.ndarray, ...]:
    """Kernel layout -> (k_codes [P,H,S,D], k_params [P,H,S,2], v_codes, v_params)."""
    k_codes = jnp.swapaxes(_unpack_planes(pages.k_pages), -1, -2)
    v_codes = _unpack_planes(pages.v_pages)
    return (
        k_codes,
        jnp.swapaxes(pages.k_params, -1, -2),
        v_codes,
        jnp.swapaxes(pages.v_params, -1, -2),
    )
