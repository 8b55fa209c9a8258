"""Baseline serving stacks: bf16 and W8A8, in the same engine harness.

TPU equivalents of the reference's comparison stacks (SURVEY.md §2.3):
``e2e/punica-fp16`` (vanilla fp16 Punica) and ``e2e/punica-int8``
(SmoothQuant W8A8 via torch-int).  Both are deliberately built the way a
performance-minded JAX engineer would build them WITHOUT Atom — dense
ring-buffer KV cache [B, maxT, H, D] with dynamic-update-slice appends and
plain XLA attention (the idiomatic fast single-chip baseline; paging is the
W4A4 stack's choice, not forced on the baselines) — so the W4A4-vs-baseline
ratio measures the quantization scheme, not a handicapped strawman.

  * bf16:  bf16 weights, bf16 dense GEMMs (MXU), bf16 KV.
  * W8A8:  per-output-channel INT8 weights, dynamic per-token INT8
    activations, int8xint8->int32 MXU dots (XLA-native), int8 static-scale
    KV — the SmoothQuant recipe of ``punica-int8/punica/models/
    llama.py:51-82`` with the 8-bit KV pool its own bench uses
    (``punica-int8/benchmarks/bench_textgen.py:95`` creates the KvPool at
    torch.int8; fp8 decode kernels underneath — v5e has no fp8 datapath, so
    int8 codes with a static scale are the TPU analog).
  * W4A16: weight-only group-128 INT4 via the Pallas nibble-plane GEMM with
    bf16 activations, bf16 KV — the AWQ recipe of ``punica-awq``.

Step functions share the engine's calling convention; the page-table
arguments are accepted and used only for their seq-len content.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from atom_tpu.models.configs import ModelConfig
from atom_tpu.models.nn import apply_rope, causal_mask, repeat_kv, rmsnorm, rope_tables


class DenseKV(NamedTuple):
    """Per-layer dense KV cache [B, maxT, H, Dh]."""

    k: jnp.ndarray
    v: jnp.ndarray


def make_dense_kv(
    n_layers: int, batch: int, max_t: int, kv_heads: int, head_dim: int,
    dtype=jnp.bfloat16,
) -> List[DenseKV]:
    return [
        DenseKV(
            jnp.zeros((batch, max_t, kv_heads, head_dim), dtype),
            jnp.zeros((batch, max_t, kv_heads, head_dim), dtype),
        )
        for _ in range(n_layers)
    ]


# The w8a8 stack stores 8-bit KV (punica-int8 keeps an FP8 decode-attention
# variant).  v5e has no fp8 datapath (and fp8 converts wedge the remote
# XLA service), so the TPU analog is int8 codes with a STATIC scale —
# SmoothQuant-style static activation scaling applied to the cache.  Range
# +-7.94 covers post-norm K/V magnitudes; this baseline measures memory/
# bandwidth behavior, which is what the ratio table compares.
KV8_INV_SCALE = 16.0


def _kv_enc(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Encode bf16/f32 K or V rows for storage dtype ``dtype``."""
    if dtype == jnp.int8:
        return jnp.clip(
            jnp.round(x.astype(jnp.float32) * KV8_INV_SCALE), -127, 127
        ).astype(jnp.int8)
    return x.astype(dtype)


def _kv_dec(arr: jnp.ndarray) -> jnp.ndarray:
    """Decode a stored KV array to bf16 (fuses into the attention einsum)."""
    if arr.dtype == jnp.int8:
        return (arr.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / KV8_INV_SCALE))
    return arr.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# bf16 baseline
# ---------------------------------------------------------------------------


class Bf16Layer(NamedTuple):
    ln_attn: jnp.ndarray
    ln_mlp: jnp.ndarray
    wq: jnp.ndarray
    wk: jnp.ndarray
    wv: jnp.ndarray
    wo: jnp.ndarray
    wgate: jnp.ndarray
    wup: jnp.ndarray
    wdown: jnp.ndarray


class Bf16Params(NamedTuple):
    embed: jnp.ndarray
    final_norm: jnp.ndarray
    lm_head: jnp.ndarray
    layers: List[Bf16Layer]


def _init_bf16_layer(keys7, cfg: ModelConfig) -> Bf16Layer:
    d = cfg.hidden_size
    n_q = cfg.num_heads * cfg.head_dim
    n_kv = cfg.num_kv_heads * cfg.head_dim
    inter = cfg.intermediate_size

    def w(k, i, o):
        return (jax.random.normal(k, (i, o), jnp.bfloat16) * (i ** -0.5))

    return Bf16Layer(
        ln_attn=jnp.ones((d,), jnp.bfloat16),
        ln_mlp=jnp.ones((d,), jnp.bfloat16),
        wq=w(keys7[0], d, n_q),
        wk=w(keys7[1], d, n_kv),
        wv=w(keys7[2], d, n_kv),
        wo=w(keys7[3], n_q, d),
        wgate=w(keys7[4], d, inter),
        wup=w(keys7[5], d, inter),
        wdown=w(keys7[6], inter, d),
    )


def init_bf16_params(key, cfg: ModelConfig) -> Bf16Params:
    d = cfg.hidden_size
    keys = jax.random.split(key, 2 + 7 * cfg.num_layers)
    layers = [
        _init_bf16_layer(keys[2 + 7 * l : 2 + 7 * (l + 1)], cfg)
        for l in range(cfg.num_layers)
    ]
    return Bf16Params(
        embed=jax.random.normal(keys[0], (cfg.vocab_size, d), jnp.bfloat16) * 0.02,
        final_norm=jnp.ones((d,), jnp.bfloat16),
        lm_head=jax.random.normal(keys[1], (d, cfg.vocab_size), jnp.bfloat16) * 0.02,
        layers=layers,
    )


def _dense_decode_attention(q, kv: DenseKV, seq_lens, cfg):
    """q [B, Hq, Dh]; dense causal attention over the ring buffer.

    K is stored POST-RoPE (rotated once at append, like the W4A4 stack), so
    the per-step work is two bf16 MXU einsums + an f32 softmax — the
    strongest simple dense-cache baseline."""
    b, hq, dh = q.shape
    max_t = kv.k.shape[1]
    # KV may be stored sub-bf16 (fp8 for the w8a8 stack, punica-int8's 8-bit
    # KV analog); the cast fuses into the einsum operand load.
    k = repeat_kv(
        _kv_dec(kv.k).transpose(0, 2, 1, 3), cfg.kv_groups
    )  # [B, Hq, T, Dh]
    v = repeat_kv(_kv_dec(kv.v).transpose(0, 2, 1, 3), cfg.kv_groups)
    scores = jnp.einsum(
        "bhd,bhtd->bht", q, k, preferred_element_type=jnp.float32
    ) * (dh ** -0.5)
    mask = jnp.arange(max_t)[None, None, :] < seq_lens[:, None, None]
    scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    return jnp.einsum(
        "bht,bhtd->bhd", probs, v, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


def _decode_layer_common(x, lp, matmul, kv, seq_lens, cfg):
    """One decoder layer of the baseline decode step; ``matmul(x, w)`` is the
    precision-specific GEMM."""
    b = x.shape[0]
    dh = cfg.head_dim
    pos = jnp.maximum(seq_lens - 1, 0)
    cos, sin = rope_tables(pos, dh, cfg.rope_theta)

    h = rmsnorm(x, lp.ln_attn, cfg.norm_eps)
    q = matmul(h, lp.wq).reshape(b, cfg.num_heads, dh)
    k_new = matmul(h, lp.wk).reshape(b, cfg.num_kv_heads, dh)
    v_new = matmul(h, lp.wv).reshape(b, cfg.num_kv_heads, dh)
    q = apply_rope(q, cos[:, None, :], sin[:, None, :])
    k_new = apply_rope(k_new, cos[:, None, :], sin[:, None, :])
    # append at seq_lens - 1 (K stored post-RoPE)
    bidx = jnp.arange(b)
    kv = DenseKV(
        kv.k.at[bidx, pos].set(_kv_enc(k_new, kv.k.dtype)),
        kv.v.at[bidx, pos].set(_kv_enc(v_new, kv.v.dtype)),
    )
    attn = _dense_decode_attention(q, kv, seq_lens, cfg)
    x = x + matmul(attn.reshape(b, -1), lp.wo)
    h = rmsnorm(x, lp.ln_mlp, cfg.norm_eps)
    g = matmul(h, lp.wgate)
    u = matmul(h, lp.wup)
    act = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    return x + matmul(act, lp.wdown), kv


def _bf16_matmul(x, w):
    return jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kvs",))
def bf16_decode_step(params: Bf16Params, kvs, ids, seq_lens, cfg: ModelConfig):
    from atom_tpu.serving.model import _embed_lookup, _lm_head_logits

    x = _embed_lookup(params.embed, ids)
    new_kvs = []
    for lp, kv in zip(params.layers, kvs):
        x, kv = _decode_layer_common(x, lp, _bf16_matmul, kv, seq_lens, cfg)
        new_kvs.append(kv)
    x = rmsnorm(x, params.final_norm, cfg.norm_eps)
    logits = _lm_head_logits(x, params.lm_head)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_kvs


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kvs",))
def bf16_decode_burst(params, kvs, ids, seq_lens, n_steps, cfg: ModelConfig):
    def body(_, carry):
        ids_, kvs_, lens_ = carry
        new_lens = lens_ + 1
        ids_, kvs_ = bf16_decode_step(params, kvs_, ids_, new_lens, cfg)
        return ids_, kvs_, new_lens

    return jax.lax.fori_loop(0, n_steps, body, (ids, kvs, seq_lens))


# ---------------------------------------------------------------------------
# W8A8 baseline (SmoothQuant recipe)
# ---------------------------------------------------------------------------


class W8Weight(NamedTuple):
    codes: jnp.ndarray  # int8 [in, out]
    scale: jnp.ndarray  # f32 [out] (per output channel)


class W8Layer(NamedTuple):
    ln_attn: jnp.ndarray
    ln_mlp: jnp.ndarray
    wq: W8Weight
    wk: W8Weight
    wv: W8Weight
    wo: W8Weight
    wgate: W8Weight
    wup: W8Weight
    wdown: W8Weight


class W8Params(NamedTuple):
    embed: jnp.ndarray
    final_norm: jnp.ndarray
    lm_head: jnp.ndarray
    layers: List[W8Layer]


def _quant_w8(w: jnp.ndarray) -> W8Weight:
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
    s = jnp.maximum(s, 1e-8)
    return W8Weight(
        codes=jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8),
        scale=s,
    )


def init_w8_params(key, cfg: ModelConfig) -> W8Params:
    # Layer-by-layer: generate one bf16 layer, quantize it, drop it — the
    # full-geometry bf16 model (13.5 GB at 7B) never coexists with its
    # quantized copy in HBM (it wouldn't fit on a 16 GB v5e).
    d = cfg.hidden_size
    keys = jax.random.split(key, 2 + 7 * cfg.num_layers)
    layers = []
    for l in range(cfg.num_layers):
        lp = _init_bf16_layer(keys[2 + 7 * l : 2 + 7 * (l + 1)], cfg)
        layers.append(W8Layer(
            ln_attn=lp.ln_attn,
            ln_mlp=lp.ln_mlp,
            wq=_quant_w8(lp.wq),
            wk=_quant_w8(lp.wk),
            wv=_quant_w8(lp.wv),
            wo=_quant_w8(lp.wo),
            wgate=_quant_w8(lp.wgate),
            wup=_quant_w8(lp.wup),
            wdown=_quant_w8(lp.wdown),
        ))
        jax.block_until_ready(layers[-1])
        del lp
    return W8Params(
        embed=jax.random.normal(keys[0], (cfg.vocab_size, d), jnp.bfloat16) * 0.02,
        final_norm=jnp.ones((d,), jnp.bfloat16),
        lm_head=jax.random.normal(keys[1], (d, cfg.vocab_size), jnp.bfloat16) * 0.02,
        layers=layers,
    )


def _w8a8_matmul(x, w: W8Weight):
    """Dynamic per-token INT8 activation quant + int8 MXU dot + dequant
    (``punica-int8``'s linear_a8_w8_bfp32_ofp32 pattern, round+clamp in
    Python at ``llama.py:82``)."""
    x32 = x.astype(jnp.float32)
    s_a = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / s_a), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w.codes, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * s_a * w.scale[None, :]).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kvs",))
def w8a8_decode_step(params: W8Params, kvs, ids, seq_lens, cfg: ModelConfig):
    from atom_tpu.serving.model import _embed_lookup, _lm_head_logits

    x = _embed_lookup(params.embed, ids)
    new_kvs = []
    for lp, kv in zip(params.layers, kvs):
        x, kv = _decode_layer_common(x, lp, _w8a8_matmul, kv, seq_lens, cfg)
        new_kvs.append(kv)
    x = rmsnorm(x, params.final_norm, cfg.norm_eps)
    logits = _lm_head_logits(x, params.lm_head)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_kvs


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kvs",))
def w8a8_decode_burst(params, kvs, ids, seq_lens, n_steps, cfg: ModelConfig):
    def body(_, carry):
        ids_, kvs_, lens_ = carry
        new_lens = lens_ + 1
        ids_, kvs_ = w8a8_decode_step(params, kvs_, ids_, new_lens, cfg)
        return ids_, kvs_, new_lens

    return jax.lax.fori_loop(0, n_steps, body, (ids, kvs, seq_lens))


# ---------------------------------------------------------------------------
# W4A16 baseline (AWQ recipe: weight-only INT4, full-precision activations)
# ---------------------------------------------------------------------------


class W4A16Layer(NamedTuple):
    ln_attn: jnp.ndarray
    ln_mlp: jnp.ndarray
    wq: "W4A16Weight"
    wk: "W4A16Weight"
    wv: "W4A16Weight"
    wo: "W4A16Weight"
    wgate: "W4A16Weight"
    wup: "W4A16Weight"
    wdown: "W4A16Weight"


class W4A16Params(NamedTuple):
    embed: jnp.ndarray
    final_norm: jnp.ndarray
    lm_head: jnp.ndarray
    layers: List[W4A16Layer]


def init_w4a16_params(key, cfg: ModelConfig) -> W4A16Params:
    from atom_tpu.ops.pallas_gemm_w4a16 import quantize_w4a16

    # Layer-by-layer for the same HBM reason as init_w8_params.
    d = cfg.hidden_size
    # Pre-pad the MLP weights to the w4a16_gemm tile grid (intermediate dim
    # -> mult of 1024 = KBLK*GROUP, which is also a mult of tile_n=512) so the
    # gemm never pads weights INSIDE the jitted decode loop — each in-loop
    # jnp.pad of an 11008-wide weight is a ~22 MB XLA temp, and at 32 layers
    # the burst OOMs.  Zero pad rows/cols quantize to zero codes (exact-zero
    # contribution), and the padded width flows consistently gate/up -> down.
    ip = -(-cfg.intermediate_size // 1024) * 1024
    pad_i = ip - cfg.intermediate_size
    # At 7B geometry the remaining dims (hidden 4096, kv width 4096) already
    # sit on the tile grid, so nothing else pads in-loop; tiny test configs
    # fall back to the gemm's internal pad, whose temps are tiny there.
    if d % 1024 or (cfg.num_kv_heads * cfg.head_dim) % 512:
        pad_i = 0

    def _q(name, w):
        w = w.astype(jnp.float32)
        if pad_i and name in ("gate", "up"):
            w = jnp.pad(w, ((0, 0), (0, pad_i)))
        elif pad_i and name == "down":
            w = jnp.pad(w, ((0, pad_i), (0, 0)))
        return quantize_w4a16(w)

    keys = jax.random.split(key, 2 + 7 * cfg.num_layers)
    layers = []
    for l in range(cfg.num_layers):
        lp = _init_bf16_layer(keys[2 + 7 * l : 2 + 7 * (l + 1)], cfg)
        layers.append(W4A16Layer(
            ln_attn=lp.ln_attn,
            ln_mlp=lp.ln_mlp,
            **{
                f"w{n}": _q(n, getattr(lp, f"w{n}"))
                for n in ("q", "k", "v", "o", "gate", "up", "down")
            },
        ))
        jax.block_until_ready(layers[-1])
        del lp
    return W4A16Params(
        embed=jax.random.normal(keys[0], (cfg.vocab_size, d), jnp.bfloat16) * 0.02,
        final_norm=jnp.ones((d,), jnp.bfloat16),
        lm_head=jax.random.normal(keys[1], (d, cfg.vocab_size), jnp.bfloat16) * 0.02,
        layers=layers,
    )


def _w4a16_matmul(x, wq):
    from atom_tpu.ops.pallas_gemm_w4a16 import w4a16_gemm

    return w4a16_gemm(x.astype(jnp.bfloat16), wq)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kvs",))
def w4a16_decode_step(params: W4A16Params, kvs, ids, seq_lens, cfg: ModelConfig):
    from atom_tpu.serving.model import _embed_lookup, _lm_head_logits

    x = _embed_lookup(params.embed, ids)
    new_kvs = []
    for lp, kv in zip(params.layers, kvs):
        x, kv = _decode_layer_common(x, lp, _w4a16_matmul, kv, seq_lens, cfg)
        new_kvs.append(kv)
    x = rmsnorm(x, params.final_norm, cfg.norm_eps)
    logits = _lm_head_logits(x, params.lm_head)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_kvs


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kvs",))
def w4a16_decode_burst(params, kvs, ids, seq_lens, n_steps, cfg: ModelConfig):
    def body(_, carry):
        ids_, kvs_, lens_ = carry
        new_lens = lens_ + 1
        ids_, kvs_ = w4a16_decode_step(params, kvs_, ids_, new_lens, cfg)
        return ids_, kvs_, new_lens

    return jax.lax.fori_loop(0, n_steps, body, (ids, kvs, seq_lens))


# ---------------------------------------------------------------------------
# Prefill + engine adapters (all three stacks)
# ---------------------------------------------------------------------------


def _prefill_layer_common(x, lp, matmul, kv, slot, cfg, cos, sin, mask):
    """One decoder layer of single-sequence prefill; fills the slot's dense-KV
    rows [0, bucket) (rows past ``true_len`` hold garbage that decode appends
    overwrite before attention can ever see them)."""
    t = x.shape[0]
    dh = cfg.head_dim
    h = rmsnorm(x, lp.ln_attn, cfg.norm_eps)
    q = matmul(h, lp.wq).reshape(t, cfg.num_heads, dh)
    k = matmul(h, lp.wk).reshape(t, cfg.num_kv_heads, dh)
    v = matmul(h, lp.wv).reshape(t, cfg.num_kv_heads, dh)
    q = apply_rope(q, cos[:, None, :], sin[:, None, :])
    k = apply_rope(k.astype(jnp.float32), cos[:, None, :], sin[:, None, :])
    kv = DenseKV(
        jax.lax.dynamic_update_slice(
            kv.k, _kv_enc(k, kv.k.dtype)[None], (slot, 0, 0, 0)
        ),
        jax.lax.dynamic_update_slice(
            kv.v, _kv_enc(v, kv.v.dtype)[None], (slot, 0, 0, 0)
        ),
    )
    kf = repeat_kv(k.transpose(1, 0, 2)[None], cfg.kv_groups)[0]  # [Hq, T, Dh]
    vf = repeat_kv(
        v.astype(jnp.float32).transpose(1, 0, 2)[None], cfg.kv_groups
    )[0]
    scores = jnp.einsum(
        "qhd,hkd->hqk", q.astype(jnp.float32), kf,
        preferred_element_type=jnp.float32,
    ) * (dh ** -0.5)
    probs = jax.nn.softmax(scores + mask[0], axis=-1)  # mask [1, T, T]
    attn = jnp.einsum(
        "hqk,hkd->qhd", probs, vf, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    x = x + matmul(attn.reshape(t, -1), lp.wo)
    h = rmsnorm(x, lp.ln_mlp, cfg.norm_eps)
    g = matmul(h, lp.wgate)
    u = matmul(h, lp.wup)
    act = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    return x + matmul(act, lp.wdown), kv


@functools.partial(
    jax.jit, static_argnames=("cfg", "matmul_name"), donate_argnames=("kvs",)
)
def baseline_prefill_step(
    params, kvs, ids, true_len, slot, cfg: ModelConfig, matmul_name: str
):
    """Single-sequence bucketed prefill shared by all baseline stacks.

    ``ids`` is a zero-padded [bucket] prompt; fills the slot's dense-KV rows
    and returns the argmax token at position ``true_len - 1``.
    """
    from atom_tpu.serving.model import _embed_lookup, _lm_head_logits

    matmul = {
        "bf16": _bf16_matmul,
        "w8a8": _w8a8_matmul,
        "w4a16": _w4a16_matmul,
    }[matmul_name]
    t = ids.shape[0]
    x = _embed_lookup(params.embed, ids)  # [T, d]
    cos, sin = rope_tables(jnp.arange(t), cfg.head_dim, cfg.rope_theta)
    mask = causal_mask(t, t)
    new_kvs = []
    for lp, kv in zip(params.layers, kvs):
        x, kv = _prefill_layer_common(
            x, lp, matmul, kv, slot, cfg, cos, sin, mask
        )
        new_kvs.append(kv)
    x = rmsnorm(x, params.final_norm, cfg.norm_eps)
    x_last = jax.lax.dynamic_slice_in_dim(x, true_len - 1, 1, axis=0)
    logits = _lm_head_logits(x_last, params.lm_head)
    return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), new_kvs


def make_baseline_step_fns(params, cfg: ModelConfig, stack: str):
    """Engine adapters: (prefill_fn, decode_fn) with dense-KV state.

    ``stack`` is one of bf16/w8a8/w4a16.  The engine's page tables carry no
    information for a dense cache — only ``seq_lens`` is consumed — but the
    calling convention matches the W4A4 stack so the same ``TextGenEngine``
    drives all four (the reference benches its stacks through one
    ``bench_textgen.py`` driver the same way).
    """
    step = {
        "bf16": bf16_decode_step,
        "w8a8": w8a8_decode_step,
        "w4a16": w4a16_decode_step,
    }[stack]

    def prefill_fn(state, ids, table_row, true_len, slot):
        tok, state = baseline_prefill_step(
            params, state, ids, true_len, slot, cfg, stack
        )
        return tok, state

    def decode_fn(state, ids, page_table, seq_lens):
        tok, state = step(params, state, ids, seq_lens, cfg)
        return tok, state

    return prefill_fn, decode_fn
