"""Hot KV ring buffer: decode appends land here, pages get bulk flushes.

Per-token writes into the paged pool are hostile to TPU memory semantics in
every arrangement measured (XLA scatter copies the whole pool; per-token DUS
burns ~25us/token in loop overhead; aliased Pallas RMW serializes).  So the
decode path never touches pages per token:

  * every decode step writes ALL sequences' new (K, V, params) into ring
    column ``step % W`` — stored from inside the fused qkv GEMM
    (``pallas_gemm_packed.packed_w4_gemm_qkv_ring``) on the production path;
  * attention = ONE Pallas kernel over the flushed pages PLUS the ring's
    valid suffix (``pallas_decode.paged_decode_attention_rotated`` with
    ``hot=``) — the ring is processed as a final W-lane pseudo-page with
    block-diagonal MXU dots, so no separate XLA ring attention or softmax
    merge runs per layer (round-3 change; the previous XLA einsum chain
    cost ~a page's worth of time per layer);
  * once per ring wrap every sequence's pending block flushes to its page(s)
    in bulk (``pallas_decode.flush_hot_pallas``).

The ring uses the PAGE layouts with W lanes instead of S (round 3; it was
token-row-major before):

    k_codes [B, H, D/2, W]  channel-plane packed bytes (lo nibble =
                            channel d, hi = d + D/2) — page k layout
    prm     [B, 4, H, W]    bf16 (k_scale / k_zero / v_scale / v_zero) —
                            page params layout
    v_codes [B, H, W, D]    unpacked u4 — slot-major like V pages but
                            unpacked (the flush packs slot nibble pairs)

Why: (a) the decode kernel reads the ring exactly like a page block — the
score dot is standard-orientation MXU against channel-major K; (b)
``hot_flush_blocks`` becomes three lane-axis rolls (position ordering) —
the old layout needed a transpose + pack + param merge every wrap; (c) the
W axis lives on LANES, where the in-GEMM store is a cheap masked
read-modify-write of a resident block.

W = 32: ring footprint per layer ~5 MB at batch 32 (read each step — bounds
W from above) while flush cost amortizes to ~2 MB/step (bounds W from
below).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from atom_tpu.ops.reference import KVQuant

HOT_W = 32


class HotKV(NamedTuple):
    """Dense decode ring for one layer (page-layout; see module docstring)."""

    k_codes: jnp.ndarray   # int8 [B, H, D/2, W] channel-plane packed
    prm: jnp.ndarray       # bf16 [B, 4, H, W] (k_s / k_z / v_s / v_z rows)
    v_codes: jnp.ndarray   # int8 [B, H, W, D] unpacked u4

    @property
    def window(self) -> int:
        return self.k_codes.shape[3]


def make_hot(batch: int, kv_heads: int, head_dim: int, w: int = HOT_W) -> HotKV:
    return HotKV(
        k_codes=jnp.zeros((batch, kv_heads, head_dim // 2, w), jnp.int8),
        prm=jnp.zeros((batch, 4, kv_heads, w), jnp.bfloat16),
        v_codes=jnp.zeros((batch, kv_heads, w, head_dim), jnp.int8),
    )


def write_hot(hot: HotKV, row: jnp.ndarray, k: KVQuant, v: KVQuant) -> HotKV:
    """Write this step's tokens into ring column ``row`` (scalar).

    XLA fallback path (the fused qkv GEMM stores the ring in-kernel on the
    production geometry).  The k/prm writes are LANE-indexed masked selects
    (not DUS) — a lane-index DUS rotates the layout on TPU; a full-array
    where is a clean in-place update at ring size.
    """
    b, h4, dh, w = hot.k_codes.shape
    d = hot.v_codes.shape[3]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3)

    kc = k.codes.astype(jnp.uint8)  # [B, H, D]
    k_packed = (kc[:, :, : d // 2] & 0x0F) | (kc[:, :, d // 2 :] << 4)
    k_codes = jnp.where(
        lane_k == row, k_packed.astype(jnp.int8)[:, :, :, None], hot.k_codes
    )

    # params: [B, H, 2] per K/V -> the 4 plane rows at lane ``row``
    rows = jnp.concatenate(
        [jnp.swapaxes(k.params, 1, 2), jnp.swapaxes(v.params, 1, 2)], axis=1
    ).astype(jnp.bfloat16)  # [B, 4, H]
    prm = jnp.where(lane_k == row, rows[:, :, :, None], hot.prm)

    v_codes = jax.lax.dynamic_update_slice(
        hot.v_codes, v.codes[:, :, None, :].astype(jnp.int8), (0, 0, row, 0)
    )
    return HotKV(k_codes=k_codes, prm=prm, v_codes=v_codes)


def hot_attention(
    q: jnp.ndarray,        # [B, HQ, D] f32/bf16 (RoPE'd)
    hot: HotKV,
    n_valid: jnp.ndarray,  # int32 [B] — tokens of each seq in the ring
    row_now: jnp.ndarray,  # int32 scalar — ring column of the CURRENT token
    sm_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense attention over the ring suffix -> (out [B,HQ,D] f32 UNNORMALIZED,
    m [B,HQ], l [B,HQ]) for softmax-merging with the paged kernel.

    XLA fallback/oracle for the in-kernel ring step; affine-code math (codes
    never dequantized), identical to the paged kernel's:
        q.k = (q.codes) * scale + (sum q) * zero
        p.v = (p * vscale).codes + rowsum(p * vzero)
    """
    b, h, dh, w = hot.k_codes.shape
    d = 2 * dh
    hq = q.shape[1]
    groups = hq // h
    qf = q.astype(jnp.float32)

    def rep(x):  # [B, H, ...] -> [B, HQ, ...]
        return jnp.repeat(x, groups, axis=1) if groups > 1 else x

    ku = hot.k_codes.astype(jnp.uint8)
    k_full = jnp.concatenate(
        [(ku & 0x0F).astype(jnp.float32), (ku >> 4).astype(jnp.float32)],
        axis=2,
    )  # [B, H, D, W]
    dot = jnp.einsum("bhd,bhdw->bhw", qf, rep(k_full))
    prm = hot.prm.astype(jnp.float32)  # [B, 4, H, W]
    k_scale = rep(prm[:, 0])  # [B, HQ, W]
    k_zero = rep(prm[:, 1])
    q_sum = jnp.sum(qf, axis=-1, keepdims=True)  # [B, HQ, 1]
    scores = (dot * k_scale + q_sum * k_zero) * sm_scale  # [B, HQ, W]

    cols = jnp.arange(w)
    age = (row_now - cols) % w  # ring age of each column (0 = current token)
    valid = age[None, :] < n_valid[:, None]  # [B, W]
    scores = jnp.where(valid[:, None, :], scores, -1e30)

    m = jnp.max(scores, axis=-1)  # [B, HQ]
    p = jnp.where(valid[:, None, :], jnp.exp(scores - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)

    v_scale = rep(prm[:, 2])
    v_zero = rep(prm[:, 3])
    out = jnp.einsum(
        "bhw,bhwd->bhd", p * v_scale, rep(hot.v_codes.astype(jnp.float32))
    )
    out = out + jnp.sum(p * v_zero, axis=-1, keepdims=True)
    return out, m, l


def merge_attention(
    out1, m1, l1,  # paged kernel part (out1 NORMALIZED by l1)
    out2, m2, l2,  # hot part (out2 UNNORMALIZED)
    out_dtype=jnp.bfloat16,
):
    """Standard two-part online-softmax merge.

    The Pallas kernel returns a normalized output plus (m, l); the hot part
    returns an unnormalized accumulator plus (m, l).
    """
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m) * l1
    a2 = jnp.exp(m2 - m)
    l = a1 + a2 * l2
    l = jnp.maximum(l, 1e-20)
    out = (out1.astype(jnp.float32) * a1[..., None] + out2 * a2[..., None]) / l[..., None]
    return out.astype(out_dtype)


def hot_flush_blocks(hot: HotKV, row_now: jnp.ndarray):
    """Ring contents in POSITION order, shaped for ``flush_hot_pallas``:
    (k_flush [B,H,D/2,W] channel-packed, prm_flush bf16 [B,4,H,W], v_flush
    [B,H,W,D] unpacked).  With the page-layout ring this is just the
    position-ordering roll on the ring axis (oldest token first)."""
    shift = -(row_now + 1)
    return (
        jnp.roll(hot.k_codes, shift, axis=3),
        jnp.roll(hot.prm, shift, axis=3),
        jnp.roll(hot.v_codes, shift, axis=2),
    )
