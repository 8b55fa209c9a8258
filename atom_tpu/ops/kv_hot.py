"""Hot KV ring buffer: decode appends land here, pages get bulk flushes.

Per-token writes into the paged pool are hostile to TPU memory semantics in
every arrangement measured (XLA scatter copies the whole pool; per-token DUS
burns ~25us/token in loop overhead; aliased Pallas RMW serializes).  So the
decode path never touches pages per token:

  * every decode step writes ALL sequences' new (K, V, params) into row
    ``step % W`` of a small dense ring — ONE scalar-indexed
    dynamic-update-slice, in place, ~1us;
  * attention = the paged Pallas kernel over the FLUSHED prefix (returning
    its online-softmax state) softmax-MERGED with a dense jnp attention over
    the ring's valid suffix;
  * every ``W`` positions a sequence's ring contents flush to its page as one
    32-slot-aligned bulk write (``pallas_decode.flush_hot_pallas``) — W | S/2,
    so a flush block always lands in a single nibble half of a single page.

The ring is GLOBAL-step indexed (all active sequences append every decode
step), so per-sequence ring row r holds the token at position
``lens_b - 1 - ((row_now - r) mod W)``.

W = 32: ring footprint per layer is ~9 MB at batch 32 (read each step by the
dense attention — the cost that bounds W from above), and flush cost amortizes
to ~2 MB/step (bounding W from below).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from atom_tpu.ops.reference import KVQuant

HOT_W = 32


class HotKV(NamedTuple):
    """Dense decode ring for one layer.  Codes are u4 values in int8."""

    k_codes: jnp.ndarray   # int8 [W, B, H, D]
    k_params: jnp.ndarray  # f32  [W, B, H, 2]
    v_codes: jnp.ndarray   # int8 [W, B, H, D]
    v_params: jnp.ndarray  # f32  [W, B, H, 2]

    @property
    def window(self) -> int:
        return self.k_codes.shape[0]


def make_hot(batch: int, kv_heads: int, head_dim: int, w: int = HOT_W) -> HotKV:
    return HotKV(
        k_codes=jnp.zeros((w, batch, kv_heads, head_dim), jnp.int8),
        k_params=jnp.zeros((w, batch, kv_heads, 2), jnp.float32),
        v_codes=jnp.zeros((w, batch, kv_heads, head_dim), jnp.int8),
        v_params=jnp.zeros((w, batch, kv_heads, 2), jnp.float32),
    )


def write_hot(hot: HotKV, row: jnp.ndarray, k: KVQuant, v: KVQuant) -> HotKV:
    """Write this step's tokens into ring row ``row`` (scalar) — one in-place
    DUS per array."""

    def dus(buf, val):
        return jax.lax.dynamic_update_slice(
            buf, val[None].astype(buf.dtype), (row, 0, 0, 0)
        )

    return HotKV(
        k_codes=dus(hot.k_codes, k.codes),
        k_params=dus(hot.k_params, k.params),
        v_codes=dus(hot.v_codes, v.codes),
        v_params=dus(hot.v_params, v.params),
    )


def hot_attention(
    q: jnp.ndarray,        # [B, HQ, D] f32/bf16 (RoPE'd)
    hot: HotKV,
    n_valid: jnp.ndarray,  # int32 [B] — tokens of each seq in the ring
    row_now: jnp.ndarray,  # int32 scalar — ring row of the CURRENT token
    sm_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense attention over the ring suffix -> (out [B,HQ,D] f32 unnormalized
    by l, m [B,HQ], l [B,HQ]) for softmax-merging with the paged kernel."""
    w, b, h, d = hot.k_codes.shape
    hq = q.shape[1]
    groups = hq // h

    k = hot.k_codes.astype(jnp.float32) * hot.k_params[..., 0:1] + hot.k_params[..., 1:2]
    v = hot.v_codes.astype(jnp.float32) * hot.v_params[..., 0:1] + hot.v_params[..., 1:2]
    k = jnp.repeat(k, groups, axis=2)  # [W, B, HQ, D]
    v = jnp.repeat(v, groups, axis=2)

    scores = jnp.einsum(
        "bhd,wbhd->bhw", q.astype(jnp.float32), k
    ) * sm_scale  # [B, HQ, W]
    rows = jnp.arange(w)
    age = (row_now - rows) % w  # ring age of each row (0 = current token)
    valid = age[None, :] < n_valid[:, None]  # [B, W]
    scores = jnp.where(valid[:, None, :], scores, -1e30)

    m = jnp.max(scores, axis=-1)  # [B, HQ]
    p = jnp.where(valid[:, None, :], jnp.exp(scores - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhw,wbhd->bhd", p, v)  # unnormalized
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
