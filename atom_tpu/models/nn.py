"""Shared neural-net building blocks (pure jnp, bf16-first).

Numerics policy: parameters and activations travel in bf16; normalization
statistics, RoPE, and softmax run in fp32 (the reference runs fp16 end-to-end
with an fp32 softmax upcast, ``model/qLlamaLayer.py:283``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Llama RMSNorm with fp32 statistics.

    The reduce_precision pins the bf16 dtype contract on the input: XLA's
    excess-precision mode may elide the producer's bf16 rounding for this
    consumer (see ``formats.quantize_activation_packed``), which would feed
    the fp32 statistics and the downstream quantizer values a real kernel
    boundary would have rounded.
    """
    from atom_tpu.numerics import rp_bf16

    x32 = x.astype(jnp.float32)
    if x.dtype == jnp.bfloat16:
        x32 = rp_bf16(x32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    xn = x32 * jax.lax.rsqrt(var + eps)
    if x.dtype == jnp.bfloat16:
        # pin the hidden-dtype rounding too: the downstream quantizer casts
        # straight back to f32, making a bare astype round-trip elidable
        xn = rp_bf16(xn)
    return xn.astype(x.dtype) * weight


def layernorm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """Standard LayerNorm (OPT) with fp32 statistics."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype) * weight + bias


def rope_tables(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for rotary embeddings: [..., head_dim] fp32.

    Llama (HF) convention: frequencies over pairs (i, i + head_dim/2), tables
    duplicated across both halves.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., half]
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(angles), jnp.sin(angles)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply rotary embedding.  ``x``: [..., seq, head_dim] with cos/sin
    broadcastable over the head axis ([seq, head_dim] against [b, h, s, d])."""
    x32 = x.astype(jnp.float32)
    return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)


def repeat_kv(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[b, kv_heads, s, d] -> [b, kv_heads * groups, s, d] (GQA broadcast)."""
    if groups == 1:
        return x
    b, h, s, d = x.shape
    return jnp.broadcast_to(
        x[:, :, None], (b, h, groups, s, d)
    ).reshape(b, h * groups, s, d)


def causal_mask(q_len: int, kv_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """[1, 1, q_len, kv_len] additive causal mask (0 / -inf-ish)."""
    q_ids = jnp.arange(q_len)[:, None] + (kv_len - q_len)
    kv_ids = jnp.arange(kv_len)[None, :]
    mask = jnp.where(kv_ids <= q_ids, 0.0, jnp.finfo(dtype).min)
    return mask[None, None].astype(dtype)


def attention(
    q: jnp.ndarray,  # [b, h, s, d]
    k: jnp.ndarray,  # [b, h, skv, d]
    v: jnp.ndarray,  # [b, h, skv, d]
    mask: jnp.ndarray | None,
) -> jnp.ndarray:
    """Plain attention with fp32 softmax — the simulated-quant accuracy path.

    (The serving path replaces this with the fused paged-KV Pallas kernels.)
    """
    d = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(d))
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
