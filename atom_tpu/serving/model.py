"""Quantized serving Llama: the real-kernel W4A4 forward path.

TPU-native equivalent of the reference's serving model
(``e2e/punica-atom/punica/models/llama.py``), improved per SURVEY.md §4: the
reference's prefill attends over RANDOM K/V (an efficiency-only hack,
``llama.py:171-174``); here prefill attends over the actually-quantized K/V, so
engine outputs are real model outputs end-to-end.

Two jitted step functions with static (bucketed) shapes:

  * ``prefill_step`` — one fresh sequence [T]; quantizes + appends its KV
    pages, full causal attention over the dequantized K/V, returns the first
    generated token.
  * ``decode_step``  — one token for each of B sequences; appends quantized
    KV, Pallas paged INT4 decode attention, returns next tokens.  KV pages are
    DONATED so appends update in place.

Per layer the op sequence mirrors the reference exactly
(``models/llama.py:242-306, 85-87``):
    rmsnorm+reorder+quant -> q/o: i4 GEMM, k/v: i4 GEMM w/ fused o4 requant ->
    append paged KV -> decode attention (fused dequant+RoPE) ->
    reorder+quant -> o_proj -> rmsnorm+reorder+quant -> gate/up GEMM ->
    silu*mul+quant -> down GEMM.

The layer loop is UNROLLED (per-layer weight buffers, not stacked): every
Pallas operand is a whole HBM buffer, so no per-iteration slice
materialization sits between the weights and the kernels.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple

import jax
import jax.numpy as jnp

from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import ModelConfig
from atom_tpu.models.nn import causal_mask, rmsnorm, rope_tables, apply_rope, repeat_kv
from atom_tpu.ops import reference as R
from atom_tpu.ops.formats import (
    KernelPackedWeight,
    pack_for_kernel,
    quantize_weight_packed,
)
from atom_tpu.ops.kv_layout import KVPages, append_kv_decode_kernel, append_kv_prefill_kernel
from atom_tpu.ops.pallas_decode import paged_decode_attention
from atom_tpu.ops.pallas_gemm_packed import quant_gemm_o4_packed, quant_gemm_packed


class ServingLayerParams(NamedTuple):
    ln_attn: jnp.ndarray       # bf16 [D]
    ln_mlp: jnp.ndarray        # bf16 [D]
    attn_reorder: jnp.ndarray  # int32 [D]  (q/k/v input order)
    o_reorder: jnp.ndarray     # int32 [D]  (attn-out order before o_proj)
    mlp_reorder: jnp.ndarray   # int32 [D]  (gate/up input order)
    wq: KernelPackedWeight
    wk: KernelPackedWeight
    wv: KernelPackedWeight
    wo: KernelPackedWeight
    wgate: KernelPackedWeight
    wup: KernelPackedWeight
    wdown: KernelPackedWeight


class ServingParams(NamedTuple):
    embed: jnp.ndarray      # bf16 [V, D]
    final_norm: jnp.ndarray  # bf16 [D]
    lm_head: jnp.ndarray    # bf16 [D, V]
    layers: List[ServingLayerParams]


def _rand_packed(key, in_f: int, out_f: int, spec: QuantSpec) -> KernelPackedWeight:
    w = jax.random.normal(key, (in_f, out_f), jnp.float32) * (in_f ** -0.5)
    return pack_for_kernel(quantize_weight_packed(w, spec))


def init_serving_params(
    key, cfg: ModelConfig, spec: QuantSpec
) -> ServingParams:
    """Random-weight serving model (the reference benches random weights too,
    ``bench_textgen.py:78-86``; real checkpoints come via
    ``pack_calibrated_params``)."""
    d = cfg.hidden_size
    n_q = cfg.num_heads * cfg.head_dim
    n_kv = cfg.num_kv_heads * cfg.head_dim
    inter = cfg.intermediate_size
    keys = jax.random.split(key, 3 + 7 * cfg.num_layers)
    embed = jax.random.normal(keys[0], (cfg.vocab_size, d), jnp.bfloat16) * 0.02
    lm_head = jax.random.normal(keys[1], (d, cfg.vocab_size), jnp.bfloat16) * 0.02
    layers = []
    ident = jnp.arange(d, dtype=jnp.int32)
    for l in range(cfg.num_layers):
        k = keys[3 + 7 * l : 3 + 7 * (l + 1)]
        layers.append(
            ServingLayerParams(
                ln_attn=jnp.ones((d,), jnp.bfloat16),
                ln_mlp=jnp.ones((d,), jnp.bfloat16),
                attn_reorder=ident,
                o_reorder=ident,
                mlp_reorder=ident,
                wq=_rand_packed(k[0], d, n_q, spec),
                wk=_rand_packed(k[1], d, n_kv, spec),
                wv=_rand_packed(k[2], d, n_kv, spec),
                wo=_rand_packed(k[3], n_q, d, spec),
                wgate=_rand_packed(k[4], d, inter, spec),
                wup=_rand_packed(k[5], d, inter, spec),
                wdown=_rand_packed(k[6], inter, d, spec),
            )
        )
    return ServingParams(
        embed=embed,
        final_norm=jnp.ones((d,), jnp.bfloat16),
        lm_head=lm_head,
        layers=layers,
    )


# ---------------------------------------------------------------------------
# Step functions
# ---------------------------------------------------------------------------


def _attn_block_common(x, lp: ServingLayerParams, spec: QuantSpec):
    """norm+reorder+quant -> q/k/v projections (shared by prefill/decode)."""
    h_in = R.rmsnorm_reorder_quant(x, lp.ln_attn, lp.attn_reorder, spec)
    q = quant_gemm_packed(h_in, lp.wq)  # bf16 [T, Hq*Dh]
    kq = quant_gemm_o4_packed(h_in, lp.wk)  # KVQuant [T, Hkv, Dh]
    vq = quant_gemm_o4_packed(h_in, lp.wv)
    return q, kq, vq


def _post_attn(x, attn_out, lp: ServingLayerParams, spec: QuantSpec):
    """reorder+quant -> o_proj -> residual; then the MLP block."""
    a_in = R.reorder_quant(attn_out, lp.o_reorder, spec)
    x = x + quant_gemm_packed(a_in, lp.wo)
    m_in = R.rmsnorm_reorder_quant(x, lp.ln_mlp, lp.mlp_reorder, spec)
    g = quant_gemm_packed(m_in, lp.wgate)
    u = quant_gemm_packed(m_in, lp.wup)
    d_in = R.silu_mul_quant(g, u, spec)
    return x + quant_gemm_packed(d_in, lp.wdown)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "spec"),
    donate_argnames=("pages",),
)
def decode_step(
    params: ServingParams,
    pages: List[KVPages],
    ids: jnp.ndarray,         # int32 [B] — previously sampled tokens
    page_table: jnp.ndarray,  # int32 [B, max_pages]
    seq_lens: jnp.ndarray,    # int32 [B] — INCLUDING the incoming token
    dest_page: jnp.ndarray,   # int32 [B]
    dest_slot: jnp.ndarray,   # int32 [B]
    cfg: ModelConfig,
    spec: QuantSpec,
):
    """One continuous-batching decode step.  Returns (next_ids [B], pages)."""
    b = ids.shape[0]
    dh = cfg.head_dim
    x = params.embed[ids].astype(jnp.bfloat16)  # [B, D]
    pos = jnp.maximum(seq_lens - 1, 0)
    cos, sin = rope_tables(pos, dh, cfg.rope_theta)  # [B, Dh]

    new_pages = []
    for l, lp in enumerate(params.layers):
        q, kq, vq = _attn_block_common(x, lp, spec)
        qh = q.reshape(b, cfg.num_heads, dh)
        q_rot = apply_rope(qh, cos[:, None, :], sin[:, None, :])
        pg = append_kv_decode_kernel(pages[l], kq, vq, dest_page, dest_slot)
        new_pages.append(pg)
        attn = paged_decode_attention(
            q_rot, pg, page_table, seq_lens, rope_theta=cfg.rope_theta
        ).reshape(b, cfg.num_heads * dh)
        x = _post_attn(x, attn, lp, spec)

    x = rmsnorm(x, params.final_norm, cfg.norm_eps)
    logits = (x.astype(jnp.float32) @ params.lm_head.astype(jnp.float32))
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_pages


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "spec"),
    donate_argnames=("pages",),
)
def prefill_step(
    params: ServingParams,
    pages: List[KVPages],
    ids: jnp.ndarray,        # int32 [T] — bucket-padded prompt
    table_row: jnp.ndarray,  # int32 [max_pages] — this sequence's pages
    true_len: jnp.ndarray,   # int32 scalar
    cfg: ModelConfig,
    spec: QuantSpec,
):
    """Prefill one fresh sequence; returns (first generated token, pages).

    Attention here runs over the DEQUANTIZED just-quantized K/V (numerics
    consistent with what decode will read back), in bf16 with fp32 softmax.
    """
    t = ids.shape[0]
    dh = cfg.head_dim
    groups = cfg.kv_groups
    x = params.embed[ids].astype(jnp.bfloat16)  # [T, D]
    positions = jnp.arange(t)
    cos, sin = rope_tables(positions, dh, cfg.rope_theta)  # [T, Dh]
    mask = causal_mask(t, t)[0]  # [1, T, T]

    new_pages = []
    for l, lp in enumerate(params.layers):
        q, kq, vq = _attn_block_common(x, lp, spec)
        new_pages.append(append_kv_prefill_kernel(pages[l], kq, vq, table_row))

        # fp32 attention math, bf16 only at the output — the same rounding
        # points as the Pallas decode kernel, so decode continuations
        # reproduce prefill numerics.
        qh = q.reshape(t, cfg.num_heads, dh).swapaxes(0, 1)[None]  # [1, H, T, Dh]
        k = R.dequantize_kv(kq.codes, kq.params).swapaxes(0, 1)[None]
        v = R.dequantize_kv(vq.codes, vq.params).swapaxes(0, 1)[None]
        q_rot = apply_rope(qh, cos, sin)  # bf16, as in the decode path
        k_rot = repeat_kv(apply_rope(k, cos, sin), groups)
        v = repeat_kv(v, groups)

        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q_rot.astype(jnp.float32), k_rot
        ) * (dh ** -0.5)
        probs = jax.nn.softmax(scores + mask[None], axis=-1)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.astype(jnp.bfloat16)[0].swapaxes(0, 1).reshape(t, -1)
        x = _post_attn(x, attn, lp, spec)

    x = rmsnorm(x, params.final_norm, cfg.norm_eps)
    last = x[jnp.maximum(true_len - 1, 0)]
    logits = last.astype(jnp.float32) @ params.lm_head.astype(jnp.float32)
    return jnp.argmax(logits).astype(jnp.int32), new_pages


def make_step_fns(params: ServingParams, cfg: ModelConfig, spec: QuantSpec):
    """(prefill_fn, decode_fn) closures with the engine's calling convention."""

    def prefill_fn(pages, ids, table_row, true_len):
        return prefill_step(params, pages, ids, table_row, true_len, cfg, spec)

    def decode_fn(pages, ids, page_table, seq_lens, dest_page, dest_slot):
        return decode_step(
            params, pages, ids, page_table, seq_lens, dest_page, dest_slot,
            cfg, spec,
        )

    return prefill_fn, decode_fn
