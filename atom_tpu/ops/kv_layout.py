"""Kernel-native paged INT4 KV cache layout (TPU tile-aligned nibble planes).

The reference's ``paged_kv_t`` stores u4 codes packed along head_dim with a
CSR page table (``page.cuh:15-37``); its decode kernel unpacks 8-per-u32 during
``cast_load`` (``quantization.cuh:66-80``).  The TPU layout here is chosen by
measurement, for three properties at once:

  * ``k_pages`` / ``v_pages``  int8 [P, H, S/2, D]  — both SLOT-major
    slot-plane nibbles: byte (r, d) holds slot ``r`` (low nibble) and slot
    ``r + S/2`` (high nibble) of channel ``d``.  Unpacking is two shifts +
    a sublane concat into TRUE slot order, and the decode kernel consumes
    both as ``[S, D]`` directly (q @ K^T runs as an MXU dot with a transposed
    RHS — native on TPU).
  * decode-time appends touch sublane row ``slot % (S/2)`` — a SUBLANE-indexed
    dynamic-update-slice, which XLA:TPU executes in place in the default
    layout.  (K was originally channel-major with the slot as a LANE index;
    XLA's layout assignment then flipped the arrays to a rotated layout for
    the update and inserted three full-pool transposing copies per decode
    step — the dominant cost of the whole serving stack until measured.)
  * ``k_params`` / ``v_params``  f32 [P, H, 2, S] — row 0 = scale, row 1 =
    zero_val (dequant ``x = code * scale + zero_val``), lane-indexed by slot
    so the kernel's affine score correction broadcasts over sublanes with no
    transpose.  Their per-token append IS lane-indexed, so it runs as a tiny
    Pallas RMW kernel over the touched page blocks only
    (``pallas_decode.append_params_pallas``), not an XLA scatter.

With ``page_size = 256`` and ``head_dim = 128`` every plane is exactly tile-
aligned — DMAs carry zero padding.

Batch addressing is a PADDED page table ``[B, max_pages]`` + ``seq_lens [B]``
(static shapes under jit) instead of CSR ``indptr/indices``.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from atom_tpu.ops.reference import KVQuant
from atom_tpu.quant.packing import unpack_uint4


class KVPages(NamedTuple):
    """One layer's paged quantized KV cache in the kernel layout."""

    k_pages: jnp.ndarray   # int8 [P, H, S//2, D]
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
        return self.k_pages.shape[2] * 2

    @property
    def head_dim(self) -> int:
        return self.k_pages.shape[3]


def make_kv_pages_kernel(
    n_pages: int, kv_heads: int, page_size: int, head_dim: int
) -> KVPages:
    assert page_size % 2 == 0 and head_dim % 2 == 0
    return KVPages(
        k_pages=jnp.zeros((n_pages, kv_heads, page_size // 2, head_dim), jnp.int8),
        k_params=jnp.zeros((n_pages, kv_heads, 2, page_size), jnp.float32),
        v_pages=jnp.zeros((n_pages, kv_heads, page_size // 2, head_dim), jnp.int8),
        v_params=jnp.zeros((n_pages, kv_heads, 2, page_size), jnp.float32),
    )


def _pack_slot_planes(codes: jnp.ndarray) -> jnp.ndarray:
    """u4 codes [..., S, D] -> slot-plane bytes [..., S/2, D]."""
    s = codes.shape[-2]
    lo = codes[..., : s // 2, :].astype(jnp.uint8) & 0x0F
    hi = codes[..., s // 2 :, :].astype(jnp.uint8) & 0x0F
    return (lo | (hi << 4)).astype(jnp.int8)


def _unpack_planes(pb: jnp.ndarray) -> jnp.ndarray:
    """plane bytes [..., S/2, D] -> u4 codes [..., S, D] (int8 in [0, 15])."""
    b = pb.astype(jnp.uint8)
    lo = (b & 0x0F).astype(jnp.int8)
    hi = (b >> 4).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=-2)


def _rmw_token_row(pages: jnp.ndarray, codes_b: jnp.ndarray, p, s, half_s, h, d):
    """Nibble-merge one token into sublane row ``s % half_s`` of page ``p``."""
    r = s % half_s
    old = jax.lax.dynamic_slice(pages, (p, 0, r, 0), (1, h, 1, d)).astype(
        jnp.int32
    ) & 0xFF
    new = jnp.where(
        s < half_s, (old & 0xF0) | codes_b, (old & 0x0F) | (codes_b << 4)
    ).astype(jnp.int8)
    return jax.lax.dynamic_update_slice(pages, new, (p, 0, r, 0))


def append_kv_decode_kernel(
    pages: KVPages,
    k: KVQuant,  # codes [B, H, D] u4-in-int8, params [B, H, 2]
    v: KVQuant,
    page_idx: jnp.ndarray,  # int32 [B]
    slot: jnp.ndarray,      # int32 [B]
) -> KVPages:
    """Write one new token per sequence (``AppendPagedKVCacheDecodeKernel``,
    page.cuh:119-130 equivalent).

    Codes: a ``fori_loop`` of SCALAR-indexed sublane dynamic-update-slices
    (in-place on donated buffers).  Params: the Pallas lane-RMW kernel.
    Neither path lets XLA fall back to a full-pool scatter copy.
    """
    from atom_tpu.ops.pallas_decode import append_kv_decode_pallas

    return append_kv_decode_pallas(
        pages,
        (k.codes.astype(jnp.uint8) & 0x0F).astype(jnp.int8),
        k.params,
        (v.codes.astype(jnp.uint8) & 0x0F).astype(jnp.int8),
        v.params,
        page_idx,
        slot,
    )


def append_kv_prefill_kernel(
    pages: KVPages,
    k: KVQuant,  # codes [T, H, D], params [T, H, 2] — one fresh sequence
    v: KVQuant,
    page_table_row: jnp.ndarray,  # int32 [max_pages]
) -> KVPages:
    """Write a whole fresh prefill sequence page-at-a-time (vectorized, no
    read-modify-write; ``AppendPagedKVCachePrefillKernel`` equivalent).

    Whole-page writes are page-granular dynamic-update-slices (offset 0 in
    the tiled dims — layout-neutral, in place on donated buffers).  Every
    page touched is fully overwritten (tail slots zeroed), so this must only
    be used for FRESH sequences — the only way the serving engine prefills.
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

    k_bytes = _pack_slot_planes(kc.transpose(0, 2, 1, 3))  # [P, H, S/2, D]
    v_bytes = _pack_slot_planes(vc.transpose(0, 2, 1, 3))
    kprm = kp.transpose(0, 2, 3, 1)  # [P, H, 2, S]
    vprm = vp.transpose(0, 2, 3, 1)

    def body(i, pg: KVPages):
        dest = page_table_row[i]
        return KVPages(
            jax.lax.dynamic_update_slice(pg.k_pages, k_bytes[i][None], (dest, 0, 0, 0)),
            jax.lax.dynamic_update_slice(pg.k_params, kprm[i][None], (dest, 0, 0, 0)),
            jax.lax.dynamic_update_slice(pg.v_pages, v_bytes[i][None], (dest, 0, 0, 0)),
            jax.lax.dynamic_update_slice(pg.v_params, vprm[i][None], (dest, 0, 0, 0)),
        )

    return jax.lax.fori_loop(0, n_full, body, pages)


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
        k_pages=_pack_slot_planes(k_codes),
        k_params=jnp.swapaxes(k_params_ref, -1, -2),
        v_pages=_pack_slot_planes(v_codes),
        v_params=jnp.swapaxes(v_params_ref, -1, -2),
    )


def kv_codes_from_kernel(pages: KVPages) -> Tuple[jnp.ndarray, ...]:
    """Kernel layout -> (k_codes [P,H,S,D], k_params [P,H,S,2], v_codes, v_params)."""
    return (
        _unpack_planes(pages.k_pages),
        jnp.swapaxes(pages.k_params, -1, -2),
        _unpack_planes(pages.v_pages),
        jnp.swapaxes(pages.v_params, -1, -2),
    )
