"""Kernel-native paged INT4 KV cache layout (TPU tile-aligned nibble planes).

The reference's ``paged_kv_t`` stores u4 codes packed along head_dim with a
CSR page table (``page.cuh:15-37``); its decode kernel unpacks 8-per-u32
during ``cast_load`` (``quantization.cuh:66-80``).  The TPU layout here is
chosen by measurement:

  * ``k_pages``  int8 [P, H, D/2, S]  — CHANNEL-major channel-plane nibbles:
    byte (c, s) holds channels ``c`` (low) and ``c + D/2`` (high) of slot
    ``s``.  Unpacking is two shifts + a sublane concat into the true
    ``K^T [D, S]`` the score dot consumes at standard MXU orientation.
  * ``v_pages``  int8 [P, H, S/2, D]  — SLOT-major slot-plane nibbles: byte
    (r, d) holds slots ``r`` and ``r + S/2`` of channel ``d``; unpacks into
    the true ``V [S, D]`` the probs.V dot consumes.
  * ``params``   bf16 [P, 4, H, S] — ONE dense array holding all four affine
    rows (0 = k_scale, 1 = k_zero_val, 2 = v_scale, 3 = v_zero_val; dequant
    ``x = code * scale + zero_val``), lane-indexed by slot.

    Round-1 stored two f32 [P, H, 2, S] arrays; their 2-wide sublane dim
    tiles to 8 on TPU, so every decode step DMA'd 4x the logical param
    bytes (67 MB physical vs 17 MB logical per call at bs32/ctx1024 —
    measured as the dominant gap between the kernel's DMA floor and the
    HBM roofline).  The merged bf16 layout is dense (4H sublanes) and half
    the width: params drop from ~33%% of attention traffic to ~6%%.
    Scale/zero_val are bf16-rounded AT QUANTIZATION TIME (see
    ``reference.quantize_kv_asym``), so prefill math, the hot ring, and the
    paged kernel all see identical values — decode == prefill is preserved.

Pages receive NO per-token writes: decode tokens accumulate in the dense hot
ring (``kv_hot``) and land here in W-aligned bulk blocks
(``pallas_decode.flush_hot_pallas``) or whole pages (prefill).  Every
per-token arrangement measured on v5e loses: XLA vector-indexed scatter
copies the whole pool per step; per-token DUS costs ~25us/token of loop
overhead; lane-indexed DUS additionally flips the arrays into a rotated
layout with three full-pool transposing copies per step.

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

    k_pages: jnp.ndarray  # int8 [P, H, D//2, S]  (channel-plane)
    v_pages: jnp.ndarray  # int8 [P, H, S//2, D]  (slot-plane)
    params: jnp.ndarray   # bf16 [P, 4, H, S]  (k_scale, k_zero, v_scale, v_zero)

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
        v_pages=jnp.zeros((n_pages, kv_heads, page_size // 2, head_dim), jnp.int8),
        params=jnp.zeros((n_pages, 4, kv_heads, page_size), jnp.bfloat16),
    )


def pack_channel_planes(codes: jnp.ndarray) -> jnp.ndarray:
    """u4 codes [..., D, S] -> channel-plane bytes [..., D/2, S]."""
    d = codes.shape[-2]
    lo = codes[..., : d // 2, :].astype(jnp.uint8) & 0x0F
    hi = codes[..., d // 2 :, :].astype(jnp.uint8) & 0x0F
    return (lo | (hi << 4)).astype(jnp.int8)


def pack_slot_planes(codes: jnp.ndarray) -> jnp.ndarray:
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


def merge_params(
    k_prm: jnp.ndarray, v_prm: jnp.ndarray
) -> jnp.ndarray:
    """(k_prm [..., H, 2, S], v_prm [..., H, 2, S]) -> merged [..., 4, H, S]."""
    rows = jnp.stack(
        [k_prm[..., :, 0, :], k_prm[..., :, 1, :],
         v_prm[..., :, 0, :], v_prm[..., :, 1, :]],
        axis=-3,
    )  # [..., 4, H, S]
    return rows.astype(jnp.bfloat16)


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

    k_bytes = pack_channel_planes(kc.transpose(0, 2, 3, 1))  # [P, H, D/2, S]
    v_bytes = pack_slot_planes(vc.transpose(0, 2, 1, 3))     # [P, H, S/2, D]
    prm = merge_params(
        kp.transpose(0, 2, 3, 1), vp.transpose(0, 2, 3, 1)
    )  # [P, 4, H, S]

    def body(i, pg: KVPages):
        dest = page_table_row[i]
        return KVPages(
            jax.lax.dynamic_update_slice(pg.k_pages, k_bytes[i][None], (dest, 0, 0, 0)),
            jax.lax.dynamic_update_slice(pg.v_pages, v_bytes[i][None], (dest, 0, 0, 0)),
            jax.lax.dynamic_update_slice(pg.params, prm[i][None], (dest, 0, 0, 0)),
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
        k_pages=pack_channel_planes(jnp.swapaxes(k_codes, -1, -2)),
        v_pages=pack_slot_planes(v_codes),
        params=merge_params(
            jnp.swapaxes(k_params_ref, -1, -2),
            jnp.swapaxes(v_params_ref, -1, -2),
        ),
    )


def kv_codes_from_kernel(pages: KVPages) -> Tuple[jnp.ndarray, ...]:
    """Kernel layout -> (k_codes [P,H,S,D], k_params [P,H,S,2], v_codes, v_params)."""
    k_codes = jnp.swapaxes(_unpack_planes(pages.k_pages), -1, -2)
    v_codes = _unpack_planes(pages.v_pages)
    prm = pages.params.astype(jnp.float32)  # [P, 4, H, S]
    k_params = jnp.stack([prm[:, 0], prm[:, 1]], axis=-1)  # [P, H, S, 2]
    v_params = jnp.stack([prm[:, 2], prm[:, 3]], axis=-1)
    return (k_codes, k_params, v_codes, v_params)
