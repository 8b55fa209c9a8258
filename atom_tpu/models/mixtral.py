"""Functional fake-quant Mixtral (top-2 MoE) — third model family.

Capability equivalent of ``model/qMixtralLayer.py`` / ``modelutils_mixtral.py``.
Quantizer placement (reference lines):

  * input RMSNorm -> reorder -> act quant before attention
    (``qMixtralLayer.py:414-417``, norm reorder ``:126-135``);
  * attention identical to Llama incl. GQA: K per-head pre-RoPE, V per-head,
    attention output reorder -> act quant -> o_proj (``:180-230``);
  * post-attention RMSNorm output is reordered but fed UNQUANTIZED to the router
    gate (which stays float — ``enable_quant=False``, ``:289``); the hidden
    state is act-quantized only AFTER the router logits are computed
    (``:303-311``);
  * per expert: silu(w1(x)) * w3(x) -> act quant -> w2 (``:254-258``);
  * all experts share expert-0's reorder indices (``modelutils_mixtral.py:63-85``)
    so one gather serves the whole MoE block.

TPU-first MoE: instead of the reference's host-side expert loop with
``index_add_`` (``qMixtralLayer.py:328-348``), every expert runs as one batched
einsum over all tokens and the top-2 routing enters as a dense [tokens, experts]
weight matrix (zeros for unrouted pairs).  Static shapes, MXU-friendly, and the
expert axis shards directly for expert parallelism.  Calibration taps preserve
routed-token semantics by masking: zeroed rows contribute nothing to Hessians
or saliency sums.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from atom_tpu.config import QuantSpec
from atom_tpu.models.base import get_layer, set_layer, stack_layers
from atom_tpu.models.configs import ModelConfig
from atom_tpu.models.nn import (
    apply_rope,
    attention,
    causal_mask,
    repeat_kv,
    rmsnorm,
    rope_tables,
)
from atom_tpu.quant.core import quantize_activation, quantize_kv_head

Params = Dict[str, Any]


def init_layer_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16) -> Params:
    h = cfg.hidden_size
    kvh = cfg.num_kv_heads * cfg.head_dim
    qh = cfg.num_heads * cfg.head_dim
    inter = cfg.intermediate_size
    E = cfg.num_experts
    ks = jax.random.split(key, 8)
    init = lambda k, shape: (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)
    return {
        "input_ln": jnp.ones((h,), dtype),
        "post_ln": jnp.ones((h,), dtype),
        "wq": init(ks[0], (h, qh)),
        "wk": init(ks[1], (h, kvh)),
        "wv": init(ks[2], (h, kvh)),
        "wo": init(ks[3], (qh, h)),
        "router": init(ks[4], (h, E)),
        "w1": init(ks[5], (E, h, inter)),
        "w3": init(ks[6], (E, h, inter)),
        "w2": init(ks[7], (E, inter, h)),
        "attn_ln_idx": jnp.arange(h, dtype=jnp.int32),
        "mlp_ln_idx": jnp.arange(h, dtype=jnp.int32),
        "attn_out_idx": jnp.arange(qh, dtype=jnp.int32),
    }


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16) -> Params:
    kE, kH, kL = jax.random.split(key, 3)
    layer_keys = jax.random.split(kL, cfg.num_layers)
    return {
        "embed": (
            jax.random.normal(kE, (cfg.vocab_size, cfg.hidden_size), jnp.float32) * 0.02
        ).astype(dtype),
        "final_norm": jnp.ones((cfg.hidden_size,), dtype),
        "lm_head": (
            jax.random.normal(kH, (cfg.hidden_size, cfg.vocab_size), jnp.float32) * 0.02
        ).astype(dtype),
        "layers": stack_layers(
            [init_layer_params(k, cfg, dtype) for k in layer_keys]
        ),
    }


def route_top_k(router_logits: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Dense routing weights [tokens, experts]: renormalized top-k softmax probs,
    zero for unrouted (token, expert) pairs (``qMixtralLayer.py:313-318``)."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    # Scatter the renormalized top-k weights into a dense [T, E] matrix.
    one_hot = jax.nn.one_hot(top_idx, probs.shape[-1], dtype=probs.dtype)
    return jnp.sum(one_hot * top_vals[..., None], axis=-2)


def moe_block(
    lp: Params,
    hid: jnp.ndarray,  # [tokens, h] — reordered, NOT yet quantized
    cfg: ModelConfig,
    spec: QuantSpec,
    tap,
) -> jnp.ndarray:
    """Top-2 MoE block with dense expert dispatch."""
    tap("block_sparse_moe.gate.input", hid)
    router_logits = hid @ lp["router"]
    tap("block_sparse_moe.gate.output", router_logits)

    hidq = quantize_activation(hid, spec)
    weights = route_top_k(router_logits, cfg)  # [T, E] fp32

    routed = (weights > 0).astype(hidq.dtype)  # [T, E]

    # All experts over all tokens; routing zeros unrouted contributions.
    g = jnp.einsum("th,ehf->etf", hidq, lp["w1"])
    u = jnp.einsum("th,ehf->etf", hidq, lp["w3"])
    act = jax.nn.silu(g.astype(jnp.float32)).astype(g.dtype) * u
    act = quantize_activation(act, spec)
    down = jnp.einsum("etf,efh->eth", act, lp["w2"])
    out = jnp.einsum("eth,te->th", down.astype(jnp.float32), weights)

    # Calibration taps with routed-token masking (zero rows drop out of both
    # the Hessian X^T X and the saliency sums).
    for e in range(cfg.num_experts if tap.collecting else 0):
        m_e = routed[:, e][:, None]
        tap(f"block_sparse_moe.experts.{e}.w1.input", hidq * m_e)
        tap(f"block_sparse_moe.experts.{e}.w3.input", hidq * m_e)
        tap(f"block_sparse_moe.experts.{e}.w1.output", g[e] * m_e)
        tap(f"block_sparse_moe.experts.{e}.w3.output", u[e] * m_e)
        tap(f"block_sparse_moe.experts.{e}.w2.input", act[e] * m_e)
        tap(f"block_sparse_moe.experts.{e}.w2.output", down[e] * m_e)

    return out.astype(hid.dtype)


def forward_layer(
    lp: Params,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: ModelConfig,
    spec: QuantSpec,
    collect_taps: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    b, t, h = x.shape
    taps: Dict[str, jnp.ndarray] = {}

    def tap(name, val):
        if collect_taps:
            taps[name] = val

    tap.collecting = collect_taps

    residual = x
    hid = rmsnorm(x, lp["input_ln"], cfg.norm_eps)
    hid = jnp.take(hid, lp["attn_ln_idx"], axis=-1)
    hid = quantize_activation(hid, spec)

    for nm in ("q_proj", "k_proj", "v_proj"):
        tap(f"self_attn.{nm}.input", hid)
    q = hid @ lp["wq"]
    k = hid @ lp["wk"]
    v = hid @ lp["wv"]
    tap("self_attn.q_proj.output", q)
    tap("self_attn.k_proj.output", k)
    tap("self_attn.v_proj.output", v)

    q = q.reshape(b, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)

    k = quantize_kv_head(k, spec)  # pre-RoPE, as in Llama
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    v = quantize_kv_head(v, spec)

    attn = attention(
        q, repeat_kv(k, cfg.kv_groups), repeat_kv(v, cfg.kv_groups), mask
    )
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, cfg.num_heads * cfg.head_dim)
    attn = jnp.take(attn, lp["attn_out_idx"], axis=-1)
    attn = quantize_activation(attn, spec)
    tap("self_attn.o_proj.input", attn)
    o = attn @ lp["wo"]
    tap("self_attn.o_proj.output", o)
    x = residual + o

    residual = x
    hid = rmsnorm(x, lp["post_ln"], cfg.norm_eps)
    hid = jnp.take(hid, lp["mlp_ln_idx"], axis=-1)
    moe_out = moe_block(lp, hid.reshape(b * t, h), cfg, spec, tap)
    return residual + moe_out.reshape(b, t, h), taps


def embed(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed"], input_ids, axis=0)


def head(params: Params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    return (x @ params["lm_head"]).astype(jnp.float32)


def layer_aux(params: Params, cfg: ModelConfig, seqlen: int):
    positions = jnp.arange(seqlen)
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    return cos, sin, causal_mask(seqlen, seqlen)


@functools.partial(jax.jit, static_argnames=("cfg", "spec"))
def forward(
    params: Params, input_ids: jnp.ndarray, cfg: ModelConfig, spec: QuantSpec
) -> jnp.ndarray:
    x = embed(params, input_ids)
    aux = layer_aux(params, cfg, input_ids.shape[1])

    def body(carry, lp):
        y, _ = forward_layer(lp, carry, *aux, cfg, spec)
        return y, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return head(params, x, cfg)


def forward_collect_taps(
    params: Params, input_ids: jnp.ndarray, cfg: ModelConfig, spec: QuantSpec
):
    x = embed(params, input_ids)
    aux = layer_aux(params, cfg, input_ids.shape[1])
    all_taps: Dict[str, jnp.ndarray] = {}
    for i in range(cfg.num_layers):
        lp = get_layer(params, i)
        x, taps = forward_layer(lp, x, *aux, cfg, spec, collect_taps=True)
        for name, val in taps.items():
            all_taps[f"layers.{i}.{name}"] = val
    return head(params, x, cfg), all_taps


# ---------------------------------------------------------------------------
# Calibration wiring
# ---------------------------------------------------------------------------


def apply_reorder_layer(lp: Params, idx: Dict[str, jnp.ndarray], prefix: str) -> Params:
    """All experts share expert-0's indices (modelutils_mixtral.py:63-85)."""
    n = lambda mod: idx[f"{prefix}.{mod}.input"]
    lp = dict(lp)
    e0w1_in = n("block_sparse_moe.experts.0.w1")
    e0w2_in = n("block_sparse_moe.experts.0.w2")
    lp["router"] = lp["router"][e0w1_in]
    lp["w1"] = lp["w1"][:, e0w1_in][:, :, e0w2_in]
    lp["w3"] = lp["w3"][:, e0w1_in][:, :, e0w2_in]
    lp["w2"] = lp["w2"][:, e0w2_in]
    lp["wq"] = lp["wq"][n("self_attn.q_proj")]
    lp["wk"] = lp["wk"][n("self_attn.k_proj")]
    lp["wv"] = lp["wv"][n("self_attn.v_proj")]
    lp["wo"] = lp["wo"][n("self_attn.o_proj")]
    lp["attn_ln_idx"] = n("self_attn.k_proj").astype(jnp.int32)
    lp["mlp_ln_idx"] = e0w1_in.astype(jnp.int32)
    lp["attn_out_idx"] = n("self_attn.o_proj").astype(jnp.int32)
    return lp


def apply_reorder(params: Params, cfg: ModelConfig, idx: Dict[str, jnp.ndarray]) -> Params:
    for i in range(cfg.num_layers):
        params = set_layer(
            params, i, apply_reorder_layer(get_layer(params, i), idx, f"layers.{i}")
        )
    return params


def quantize_layer_weights_rtn(lp: Params, spec: QuantSpec) -> Params:
    """RTN quant; the router gate stays float (enable_quant=False, :289)."""
    from atom_tpu.quant.core import quantize_weight

    lp = dict(lp)
    for wname in ("wq", "wk", "wv", "wo"):
        lp[wname] = quantize_weight(lp[wname].T, spec).T
    for wname in ("w1", "w3", "w2"):
        lp[wname] = jnp.stack(
            [quantize_weight(w.T, spec).T for w in lp[wname]]
        )
    return lp


def quantize_weights_rtn(params: Params, cfg: ModelConfig, spec: QuantSpec) -> Params:
    for i in range(cfg.num_layers):
        params = set_layer(
            params, i, quantize_layer_weights_rtn(get_layer(params, i), spec)
        )
    return params


def hessian_tap_specs(cfg: ModelConfig) -> Dict[str, int]:
    h = cfg.hidden_size
    specs = {
        "self_attn.q_proj.input": h,
        "self_attn.o_proj.input": cfg.num_heads * cfg.head_dim,
    }
    for e in range(cfg.num_experts):
        specs[f"block_sparse_moe.experts.{e}.w1.input"] = h
        specs[f"block_sparse_moe.experts.{e}.w2.input"] = cfg.intermediate_size
    return specs


def gptq_apply(lp: Params, hessians: Dict[str, jnp.ndarray], quantize_fn) -> Params:
    lp = dict(lp)
    for wname, tapname in (
        ("wq", "self_attn.q_proj.input"),
        ("wk", "self_attn.q_proj.input"),
        ("wv", "self_attn.q_proj.input"),
        ("wo", "self_attn.o_proj.input"),
    ):
        lp[wname] = quantize_fn(lp[wname].T, hessians[tapname], name=wname).T
    E = lp["w1"].shape[0]
    for stacked, tap_tmpl in (
        ("w1", "block_sparse_moe.experts.{}.w1.input"),
        ("w3", "block_sparse_moe.experts.{}.w1.input"),
        ("w2", "block_sparse_moe.experts.{}.w2.input"),
    ):
        lp[stacked] = jnp.stack(
            [
                quantize_fn(
                    lp[stacked][e].T,
                    hessians[tap_tmpl.format(e)],
                    name=f"{stacked}.{e}",
                ).T
                for e in range(E)
            ]
        )
    return lp


def load_hf_params(path: str, cfg: ModelConfig, dtype=None):
    """Local HF checkpoint -> this module's params (see models.hf_loader)."""
    import jax.numpy as jnp

    from atom_tpu.models.hf_loader import load_mixtral_params

    return load_mixtral_params(path, cfg, dtype or jnp.bfloat16)
