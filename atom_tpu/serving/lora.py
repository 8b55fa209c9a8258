"""Multi-adapter LoRA serving on top of the W4A4 stack (Punica analog).

TPU-native equivalent of the reference's LoRA serving infrastructure
(``e2e/punica-atom/punica/utils/lora.py:16``, ``ops/__init__.py:62-110``,
``models/llama_lora.py:77-211``): every request in the continuous batch may
carry its OWN rank-r adapter, applied as a bf16 side-path at the reference's
seven projection sites (q, k, v, o, gate, up, down) on the UNQUANTIZED
activations — base weights stay INT4, adapters stay dense.

The reference's CUDA BGMV kernel gathers each request's adapter rows and
does two skinny matmuls per site.  The TPU formulation is the same math as
XLA ops: one ``take`` along the adapter axis (B rows of [r, d] — the same
bytes BGMV streams) and two batched einsums that the compiler fuses with
their neighbors.  At decode shapes the per-site traffic is B*r*(d_in+d_out)
bf16 — for B=32, r=16, 7 sites, 32 layers that's ~0.9 GB/step of adapter
reads when every request uses a DISTINCT adapter, identical to the CUDA
kernel's bytes (it is inherent to per-request adapters, not the gather).

Integration: ``make_lora_step_fns`` builds prefill/decode steps that thread
a per-slot adapter index; ``TextGenEngine(lora=True)`` maintains the slot →
adapter mapping from ``RequestSet.adapter_ids``.  LoRA forces the UNFUSED
qkv path (k/v deltas must land before RoPE + KV quantization — the fused
GEMM quantizes in-kernel), so a LoRA deployment trades the fused-path
savings for adapter math, exactly like the reference trades its plain GEMM
for GEMM+BGMV.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import ModelConfig
from atom_tpu.models.nn import apply_rope, rmsnorm, rope_tables
from atom_tpu.ops import reference as R
from atom_tpu.ops.formats import quantize_activation_packed
from atom_tpu.ops.kv_hot import write_hot
from atom_tpu.ops.pallas_gemm_packed import quant_gemm_packed
from atom_tpu.serving.model import (
    ServingParams,
    ServingState,
    _embed_lookup,
    _lm_head_logits,
    causal_code_attention,
    decode_hidden,
    prefill_hidden,
)


class LoraSite(NamedTuple):
    """Stacked adapters for one projection site (the reference's LoraManager
    buffer shapes, ``lora.py:28-33``)."""

    wa: jnp.ndarray  # bf16 [A, L, r, d_in]   (x @ wa.T -> rank space)
    wb: jnp.ndarray  # bf16 [A, L, d_out, r]  (rank space @ wb.T -> out)


class LlamaLora(NamedTuple):
    """Per-site adapter stores + the global scale (lora_alpha / r)."""

    q: LoraSite
    k: LoraSite
    v: LoraSite
    o: LoraSite
    gate: LoraSite
    up: LoraSite
    down: LoraSite


def init_llama_lora(
    key,
    cfg: ModelConfig,
    capacity: int,
    rank: int,
    dtype=jnp.bfloat16,
    zero_b: bool = False,
) -> LlamaLora:
    """Random adapter store ([A, L, ...] per site).  ``zero_b=True`` zeroes
    every wb — the standard LoRA init, and a delta-free store for tests."""
    d = cfg.hidden_size
    n_q = cfg.num_heads * cfg.head_dim
    n_kv = cfg.num_kv_heads * cfg.head_dim
    inter = cfg.intermediate_size
    dims = {
        "q": (d, n_q), "k": (d, n_kv), "v": (d, n_kv), "o": (n_q, d),
        "gate": (d, inter), "up": (d, inter), "down": (inter, d),
    }
    ks = jax.random.split(key, 2 * len(dims))
    sites = {}
    for i, (name, (d_in, d_out)) in enumerate(dims.items()):
        wa = jax.random.normal(
            ks[2 * i], (capacity, cfg.num_layers, rank, d_in), dtype
        ) * (d_in ** -0.5)
        wb = (
            jnp.zeros((capacity, cfg.num_layers, d_out, rank), dtype)
            if zero_b
            else jax.random.normal(
                ks[2 * i + 1], (capacity, cfg.num_layers, d_out, rank), dtype
            ) * (rank ** -0.5)
        )
        sites[name] = LoraSite(wa=wa, wb=wb)
    return LlamaLora(**sites)


def add_lora(
    x: jnp.ndarray,        # [B, d_in] (or [T, d_in] with scalar idx)
    site: LoraSite,
    idx: jnp.ndarray,      # int32 [B] (per-row adapter) or scalar
    layer: int,
    scale: float,
) -> jnp.ndarray:
    """The reference's ``add_lora`` semantics (``ops/__init__.py:90-110``):

        delta[i] = x[i] @ wa[idx[i], layer].T @ wb[idx[i], layer].T * scale

    returned as f32 (caller adds it to the base GEMM output)."""
    if idx.ndim == 0:  # whole batch shares one adapter (prefill)
        wa = site.wa[idx, layer].astype(jnp.float32)  # [r, d_in]
        wb = site.wb[idx, layer].astype(jnp.float32)  # [d_out, r]
        t = x.astype(jnp.float32) @ wa.T
        return (t @ wb.T) * scale
    wa = site.wa[idx, layer].astype(jnp.float32)  # [B, r, d_in]
    wb = site.wb[idx, layer].astype(jnp.float32)  # [B, d_out, r]
    t = jnp.einsum("bd,brd->br", x.astype(jnp.float32), wa)
    return jnp.einsum("br,bor->bo", t, wb) * scale


class LoraManager:
    """Host-side adapter slot allocator over a device ``LlamaLora`` store
    (the reference's alloc/free protocol, ``lora.py:73-86``)."""

    def __init__(self, store: LlamaLora):
        self.store = store
        self._free = set(range(store.q.wa.shape[0]))

    @property
    def capacity(self) -> int:
        return self.store.q.wa.shape[0]

    def alloc(self) -> int:
        return self._free.pop()

    def free(self, idx: int) -> None:
        assert 0 <= idx < self.capacity and idx not in self._free
        self._free.add(idx)

    def load(self, idx: int, site_name: str, wa, wb) -> None:
        """Install one site's [L, r, d_in]/[L, d_out, r] adapter weights."""
        site: LoraSite = getattr(self.store, site_name)
        self.store = self.store._replace(**{
            site_name: LoraSite(
                wa=site.wa.at[idx].set(wa), wb=site.wb.at[idx].set(wb)
            )
        })


# ---------------------------------------------------------------------------
# LoRA-aware layer blocks (mirror serving.model's blocks + the 7 deltas)
# ---------------------------------------------------------------------------


def _lora_attn_block(
    x, lp, cfg: ModelConfig, spec: QuantSpec, rope, lw: LlamaLora, idx,
    layer: int, scale: float,
):
    """``_attn_block_common``'s unfused branch + q/k/v deltas BEFORE RoPE and
    KV quantization (the reference adds LoRA to the fp16 projections before
    its cache append, ``llama_lora.py:77-145``).  With zero adapters this is
    bitwise the unfused base path (+0.0 in f32)."""
    n_q = cfg.num_heads * cfg.head_dim
    n_kv = cfg.num_kv_heads * cfg.head_dim
    dh = cfg.head_dim
    cos, sin = rope
    t = x.shape[0]
    xn = rmsnorm(x, lp.ln_attn, cfg.norm_eps)
    h_in = quantize_activation_packed(
        jnp.take(xn, lp.attn_reorder, axis=-1), spec
    )
    qkv = quant_gemm_packed(h_in, lp.wqkv, out_dtype=jnp.float32)
    qh = (
        qkv[:, :n_q] + add_lora(xn, lw.q, idx, layer, scale)
    ).reshape(t, cfg.num_heads, dh)
    kh = (
        qkv[:, n_q : n_q + n_kv] + add_lora(xn, lw.k, idx, layer, scale)
    ).reshape(t, cfg.num_kv_heads, dh)
    vh = (
        qkv[:, n_q + n_kv :] + add_lora(xn, lw.v, idx, layer, scale)
    ).reshape(t, cfg.num_kv_heads, dh)
    q = apply_rope(qh, cos[:, None, :], sin[:, None, :]).astype(jnp.bfloat16)
    k = apply_rope(kh, cos[:, None, :], sin[:, None, :])
    return q, R.quantize_kv_asym(k), R.quantize_kv_asym(vh)


def _lora_post_attn(
    x, attn_out, lp, spec: QuantSpec, lw: LlamaLora, idx, layer: int,
    scale: float, norm_eps: float,
):
    """``_post_attn`` + o/gate/up/down deltas (``llama_lora.py:152-211``).
    Single-chip only (LoRA+TP composes like the base model but is not wired
    here yet)."""
    a_in = R.reorder_quant(attn_out, lp.o_reorder, spec)
    x = x + quant_gemm_packed(a_in, lp.wo) + add_lora(
        attn_out, lw.o, idx, layer, scale
    )
    xm = rmsnorm(x, lp.ln_mlp, norm_eps)
    m_in = quantize_activation_packed(
        jnp.take(xm, lp.mlp_reorder, axis=-1), spec
    )
    gu = quant_gemm_packed(m_in, lp.wgateup, out_dtype=jnp.float32)
    inter = gu.shape[1] // 2
    gate = gu[:, :inter] + add_lora(xm, lw.gate, idx, layer, scale)
    up = gu[:, inter:] + add_lora(xm, lw.up, idx, layer, scale)
    act = jax.nn.silu(gate) * up
    d_in = quantize_activation_packed(act, spec)
    return x + quant_gemm_packed(d_in, lp.wdown) + add_lora(
        act, lw.down, idx, layer, scale
    )


# ---------------------------------------------------------------------------
# Step functions (threading a per-slot adapter index)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "spec", "scale", "flush"),
    donate_argnames=("state",),
)
def lora_decode_step(
    params: ServingParams,
    lw: LlamaLora,
    state: ServingState,
    ids: jnp.ndarray,         # int32 [B]
    page_table: jnp.ndarray,  # int32 [B, max_pages]
    seq_lens: jnp.ndarray,    # int32 [B]
    adapters: jnp.ndarray,    # int32 [B] — per-slot adapter index
    cfg: ModelConfig,
    spec: QuantSpec,
    scale: float,
    flush: bool = False,
):
    """``decode_step`` with per-request adapters (Punica's decode contract)."""

    def attn_fn(x, lp, layer, rope, hot, row):
        q, kq, vq = _lora_attn_block(
            x, lp, cfg, spec, rope, lw, adapters, layer, scale
        )
        return q, write_hot(hot, row, kq, vq)

    def post_fn(x, attn, lp, layer, gather):
        return _lora_post_attn(
            x, attn, lp, spec, lw, adapters, layer, scale, cfg.norm_eps
        )

    x, new_state = decode_hidden(
        params, state, ids, page_table, seq_lens, cfg, spec, flush=flush,
        attn_block_fn=attn_fn, post_attn_fn=post_fn,
    )
    logits = _lm_head_logits(x, params.lm_head, cfg.vocab_size)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_state


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "spec", "scale"),
    donate_argnames=("state",),
)
def lora_prefill_step(
    params: ServingParams,
    lw: LlamaLora,
    state: ServingState,
    ids: jnp.ndarray,        # int32 [T]
    table_row: jnp.ndarray,  # int32 [max_pages]
    true_len: jnp.ndarray,   # int32 scalar
    slot: jnp.ndarray,       # int32 scalar
    adapter: jnp.ndarray,    # int32 scalar — this sequence's adapter
    cfg: ModelConfig,
    spec: QuantSpec,
    scale: float,
):
    """``prefill_step`` with one adapter for the whole prompt."""

    def attn_fn(x, lp, layer, rope):
        return _lora_attn_block(
            x, lp, cfg, spec, rope, lw, adapter, layer, scale
        )

    def post_fn(x, attn, lp, layer, gather):
        return _lora_post_attn(
            x, attn, lp, spec, lw, adapter, layer, scale, cfg.norm_eps
        )

    x, new_pages = prefill_hidden(
        params, state.pages, ids, table_row, cfg, spec,
        attn_block_fn=attn_fn, post_attn_fn=post_fn,
    )
    last = x[jnp.maximum(true_len - 1, 0)]
    logits = _lm_head_logits(last[None], params.lm_head, cfg.vocab_size)[0]
    new_state = ServingState(
        pages=new_pages,
        hot=state.hot,
        row=state.row,
        flushed=state.flushed.at[slot].set(true_len),
    )
    return jnp.argmax(logits).astype(jnp.int32), new_state


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "spec", "scale"),
    donate_argnames=("state",),
)
def lora_decode_burst(
    params: ServingParams,
    lw: LlamaLora,
    state: ServingState,
    ids: jnp.ndarray,         # int32 [B]
    page_table: jnp.ndarray,  # int32 [B, max_pages] — must pre-cover the burst
    seq_lens: jnp.ndarray,    # int32 [B] — current lengths (EXCLUDING ids)
    n_steps: jnp.ndarray,     # int32 scalar — number of W-step ring WINDOWS
    adapters: jnp.ndarray,    # int32 [B] — per-slot adapter index
    cfg: ModelConfig,
    spec: QuantSpec,
    scale: float = 1.0,
):
    """``decode_burst`` with per-request adapters: ``n_steps`` whole ring
    windows in ONE compiled program, dispatch-free (the ``bench_lora.py``
    measurement analog — the reference times its BGMV+GEMM decode step the
    same way it times the base stack, ``benchmarks/bench_lora.py``)."""
    w = state.hot[0].window

    def step(carry, flush):
        ids_, state_, lens_ = carry
        new_lens = lens_ + 1
        ids_, state_ = lora_decode_step(
            params, lw, state_, ids_, page_table, new_lens, adapters,
            cfg, spec, scale, flush=flush,
        )
        return ids_, state_, new_lens

    def window(_, carry):
        carry = jax.lax.fori_loop(
            0, w - 1, lambda _i, c: step(c, False), carry
        )
        return step(carry, True)

    return jax.lax.fori_loop(0, n_steps, window, (ids, state, seq_lens))


def make_lora_step_fns(
    params: ServingParams,
    lw: LlamaLora,
    cfg: ModelConfig,
    spec: QuantSpec,
    scale: float = 1.0,
):
    """(prefill_fn, decode_fn) for ``TextGenEngine(lora=True)`` — same
    signatures as ``make_step_fns`` plus the trailing adapter argument."""

    def prefill_fn(state, ids, table_row, true_len, slot, adapter):
        return lora_prefill_step(
            params, lw, state, ids, table_row, true_len, slot, adapter,
            cfg, spec, scale,
        )

    counter = {"n": 0}  # ring-wrap flush cadence, as in make_step_fns

    def decode_fn(state, ids, page_table, seq_lens, adapters):
        counter["n"] += 1
        from atom_tpu.ops.kv_hot import HOT_W

        return lora_decode_step(
            params, lw, state, ids, page_table, seq_lens, adapters,
            cfg, spec, scale, flush=counter["n"] % HOT_W == 0,
        )

    return prefill_fn, decode_fn
