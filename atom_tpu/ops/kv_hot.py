"""Hot KV ring buffer: decode appends land here, pages get bulk flushes.

Per-token writes into the paged pool are hostile to TPU memory semantics in
every arrangement measured (XLA scatter copies the whole pool; per-token DUS
burns ~25us/token in loop overhead; aliased Pallas RMW serializes).  So the
decode path never touches pages per token:

  * every decode step writes ALL sequences' new (K, V, params) into ring row
    ``step % W`` — one scalar-indexed dynamic-update-slice per array, in
    place;
  * attention = the paged Pallas kernel over the FLUSHED prefix (returning
    its online-softmax state) softmax-MERGED with a dense attention over the
    ring's valid suffix;
  * once per ring wrap every sequence's pending block flushes to its page(s)
    in bulk (``pallas_decode.flush_hot_pallas``).

Layouts are chosen for the READ side (the dense attention runs every step,
the flush once per W): codes sit in attention-natural ``[B, H, W, D]`` (the
ring row is a sublane-axis scalar DUS — no lane-rotation trap), params in
``[B, W, 2, H]`` (row 0 = scale, row 1 = zero_val; the head axis stays last
so tensor parallelism shards it).  The dense
attention uses the same affine-code trick as the paged kernel — K/V codes are
never dequantized.

W = 32: ring footprint per layer ~9 MB at batch 32 (read each step — bounds W
from above) while flush cost amortizes to ~2 MB/step (bounds W from below).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from atom_tpu.ops.reference import KVQuant

HOT_W = 32


class HotKV(NamedTuple):
    """Dense decode ring for one layer.  Codes are u4 values in int8."""

    k_codes: jnp.ndarray   # int8 [B, H, W, D]
    k_prm: jnp.ndarray     # f32  [B, W, 2, H]  (scale row, zero_val row)
    v_codes: jnp.ndarray   # int8 [B, H, W, D]
    v_prm: jnp.ndarray     # f32  [B, W, 2, H]

    @property
    def window(self) -> int:
        return self.k_codes.shape[2]


def make_hot(batch: int, kv_heads: int, head_dim: int, w: int = HOT_W) -> HotKV:
    return HotKV(
        k_codes=jnp.zeros((batch, kv_heads, w, head_dim), jnp.int8),
        k_prm=jnp.zeros((batch, w, 2, kv_heads), jnp.float32),
        v_codes=jnp.zeros((batch, kv_heads, w, head_dim), jnp.int8),
        v_prm=jnp.zeros((batch, w, 2, kv_heads), jnp.float32),
    )


def write_hot(hot: HotKV, row: jnp.ndarray, k: KVQuant, v: KVQuant) -> HotKV:
    """Write this step's tokens into ring row ``row`` (scalar) — one in-place
    DUS per array."""

    def dus_codes(buf, codes):
        return jax.lax.dynamic_update_slice(
            buf, codes[:, :, None, :].astype(buf.dtype), (0, 0, row, 0)
        )

    def dus_prm(buf, params):  # params [B, H, 2] -> row [B, 1, 2, H]
        val = jnp.swapaxes(params, 1, 2)[:, None]
        return jax.lax.dynamic_update_slice(buf, val, (0, row, 0, 0))

    return HotKV(
        k_codes=dus_codes(hot.k_codes, k.codes),
        k_prm=dus_prm(hot.k_prm, k.params),
        v_codes=dus_codes(hot.v_codes, v.codes),
        v_prm=dus_prm(hot.v_prm, v.params),
    )


def hot_attention(
    q: jnp.ndarray,        # [B, HQ, D] f32/bf16 (RoPE'd)
    hot: HotKV,
    n_valid: jnp.ndarray,  # int32 [B] — tokens of each seq in the ring
    row_now: jnp.ndarray,  # int32 scalar — ring row of the CURRENT token
    sm_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense attention over the ring suffix -> (out [B,HQ,D] f32 UNNORMALIZED,
    m [B,HQ], l [B,HQ]) for softmax-merging with the paged kernel.

    Affine-code math (codes never dequantized):
        q.k = (q.codes) * scale + (sum q) * zero
        p.v = (p * vscale).codes + rowsum(p * vzero)
    """
    b, h, w, d = hot.k_codes.shape
    hq = q.shape[1]
    groups = hq // h
    qf = q.astype(jnp.float32)

    def rep(x):  # [B, H, ...] -> [B, HQ, ...]
        return jnp.repeat(x, groups, axis=1) if groups > 1 else x

    k_scale = rep(hot.k_prm[:, :, 0].transpose(0, 2, 1))   # [B, HQ, W]
    k_zero = rep(hot.k_prm[:, :, 1].transpose(0, 2, 1))
    dot = jnp.einsum(
        "bhd,bhwd->bhw", qf, rep(hot.k_codes.astype(jnp.float32))
    )
    q_sum = jnp.sum(qf, axis=-1, keepdims=True)  # [B, HQ, 1]
    scores = (dot * k_scale + q_sum * k_zero) * sm_scale  # [B, HQ, W]

    rows = jnp.arange(w)
    age = (row_now - rows) % w  # ring age of each row (0 = current token)
    valid = age[None, :] < n_valid[:, None]  # [B, W]
    scores = jnp.where(valid[:, None, :], scores, -1e30)

    m = jnp.max(scores, axis=-1)  # [B, HQ]
    p = jnp.where(valid[:, None, :], jnp.exp(scores - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)

    v_scale = rep(hot.v_prm[:, :, 0].transpose(0, 2, 1))
    v_zero = rep(hot.v_prm[:, :, 1].transpose(0, 2, 1))
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
    (k_flush [B,H,D/2,W] channel-packed, prm_flush bf16 [B,4,H,W] merged
    affine rows, v_flush [B,H,W,D] unpacked)."""
    from atom_tpu.ops.kv_layout import merge_params, pack_channel_planes

    b, h, w, d = hot.k_codes.shape
    shift = -(row_now + 1)
    ok = jnp.roll(hot.k_codes, shift, axis=2)   # [B, H, W, D]
    ov = jnp.roll(hot.v_codes, shift, axis=2)
    okp = jnp.roll(hot.k_prm, shift, axis=1)    # [B, W, 2, H]
    ovp = jnp.roll(hot.v_prm, shift, axis=1)

    def prm(p):  # [B, W, 2, H] -> [B, H, 2, W]
        return p.transpose(0, 3, 2, 1)

    k_flush = pack_channel_planes(jnp.swapaxes(ok, 2, 3))  # [B, H, D/2, W]
    prm_flush = merge_params(prm(okp), prm(ovp))  # [B, 4, H, W] bf16
    return k_flush, prm_flush, ov
