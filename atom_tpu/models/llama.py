"""Functional fake-quant Llama (1/2, incl. GQA) — the accuracy pipeline model.

Equivalent in capability to the reference's ``model/qLlamaLayer.py`` (a wrapper
hierarchy over HF modules with quantizer hook points), re-designed TPU-first:

  * parameters are a plain pytree with all decoder layers STACKED on a leading
    axis, so the whole forward is one ``lax.scan`` — one compiled layer body,
    mesh-shardable along every axis;
  * quantizers are not module state but pure functions of (x, QuantSpec), applied
    at exactly the reference's hook points (see ``forward_layer``):
      - input RMSNorm -> channel reorder -> dynamic act quant   (qLlamaLayer.py:142-151)
      - K quantized per-head BEFORE RoPE                        (qLlamaLayer.py:246-249)
      - V quantized per-head after softmax weights computed     (qLlamaLayer.py:285-287)
      - attention output -> reorder -> act quant -> o_proj      (qLlamaLayer.py:300-306)
      - MLP: act quant of silu(gate) * up before down_proj      (qLlamaLayer.py:345-351)
  * calibration taps (the inputs/outputs of every linear) are explicit aux
    outputs instead of forward hooks (``model/outlier.py:44-51``).

Weights are stored in kernel convention ``[in, out]`` (right-multiply); the
calibration utilities transpose to the reference's ``[out, in]`` convention at
quantization time.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import ModelConfig
from atom_tpu.models.nn import (
    apply_rope,
    attention,
    causal_mask,
    repeat_kv,
    rmsnorm,
    rope_tables,
)
from atom_tpu.quant.core import (
    quantize_activation,
    quantize_kv_head,
)

Params = Dict[str, Any]

_LINEAR_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def init_layer_params(
    key: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16
) -> Params:
    h = cfg.hidden_size
    kvh = cfg.num_kv_heads * cfg.head_dim
    qh = cfg.num_heads * cfg.head_dim
    inter = cfg.intermediate_size
    ks = jax.random.split(key, 7)
    init = lambda k, i, o: (jax.random.normal(k, (i, o), jnp.float32) * 0.02).astype(dtype)
    return {
        "input_ln": jnp.ones((h,), dtype),
        "post_ln": jnp.ones((h,), dtype),
        "wq": init(ks[0], h, qh),
        "wk": init(ks[1], h, kvh),
        "wv": init(ks[2], h, kvh),
        "wo": init(ks[3], qh, h),
        "wgate": init(ks[4], h, inter),
        "wup": init(ks[5], h, inter),
        "wdown": init(ks[6], inter, h),
        # Reorder gathers (identity until calibration installs real indices).
        "attn_ln_idx": jnp.arange(h, dtype=jnp.int32),
        "mlp_ln_idx": jnp.arange(h, dtype=jnp.int32),
        "attn_out_idx": jnp.arange(qh, dtype=jnp.int32),
    }


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16) -> Params:
    kE, kH, kL = jax.random.split(key, 3)
    layer_keys = jax.random.split(kL, cfg.num_layers)
    layers = [init_layer_params(k, cfg, dtype) for k in layer_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "embed": (
            jax.random.normal(kE, (cfg.vocab_size, cfg.hidden_size), jnp.float32) * 0.02
        ).astype(dtype),
        "final_norm": jnp.ones((cfg.hidden_size,), dtype),
        "lm_head": (
            jax.random.normal(kH, (cfg.hidden_size, cfg.vocab_size), jnp.float32) * 0.02
        ).astype(dtype),
        "layers": stacked,
    }


def get_layer(params: Params, i: int) -> Params:
    return jax.tree.map(lambda a: a[i], params["layers"])


def set_layer(params: Params, i: int, lp: Params) -> Params:
    new_layers = jax.tree.map(
        lambda stack, leaf: stack.at[i].set(leaf), params["layers"], lp
    )
    return {**params, "layers": new_layers}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def forward_layer(
    lp: Params,
    x: jnp.ndarray,  # [b, t, hidden]
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: ModelConfig,
    spec: QuantSpec,
    collect_taps: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One decoder layer of the simulated-quantization model.

    Returns (output, taps); taps is empty unless ``collect_taps``.  Tap names
    mirror the reference's module paths so the calibration wiring reads the same
    (``modelutils_llama.py:31-69``).
    """
    b, t, h = x.shape
    taps: Dict[str, jnp.ndarray] = {}

    def tap(name: str, val: jnp.ndarray):
        if collect_taps:
            taps[name] = val

    residual = x
    hid = rmsnorm(x, lp["input_ln"], cfg.norm_eps)
    hid = jnp.take(hid, lp["attn_ln_idx"], axis=-1)
    hid = quantize_activation(hid, spec)

    tap("self_attn.q_proj.input", hid)
    tap("self_attn.k_proj.input", hid)
    tap("self_attn.v_proj.input", hid)
    q = hid @ lp["wq"]
    k = hid @ lp["wk"]
    v = hid @ lp["wv"]
    tap("self_attn.q_proj.output", q)
    tap("self_attn.k_proj.output", k)
    tap("self_attn.v_proj.output", v)

    q = q.reshape(b, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)

    # K quantized per-head BEFORE RoPE: position info is applied on top of the
    # quantized codes, exactly how the paged KV cache stores pre-RoPE K and the
    # decode kernel applies RoPE on the fly (qLlamaLayer.py:246-254,
    # flashinfer decode.cuh:92-126).
    k = quantize_kv_head(k, spec)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # V quantized per-head (after the softmax weights exist in the reference's
    # ordering; V itself is independent of softmax, qLlamaLayer.py:285-287).
    v = quantize_kv_head(v, spec)

    attn = attention(
        q, repeat_kv(k, cfg.kv_groups), repeat_kv(v, cfg.kv_groups), mask
    )
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, cfg.num_heads * cfg.head_dim)

    # Reorder + quantize the attention output for o_proj (qLlamaLayer.py:300-306).
    attn = jnp.take(attn, lp["attn_out_idx"], axis=-1)
    attn = quantize_activation(attn, spec)
    tap("self_attn.o_proj.input", attn)
    o = attn @ lp["wo"]
    tap("self_attn.o_proj.output", o)
    x = residual + o

    residual = x
    hid = rmsnorm(x, lp["post_ln"], cfg.norm_eps)
    hid = jnp.take(hid, lp["mlp_ln_idx"], axis=-1)
    hid = quantize_activation(hid, spec)
    tap("mlp.gate_proj.input", hid)
    tap("mlp.up_proj.input", hid)
    g = hid @ lp["wgate"]
    u = hid @ lp["wup"]
    tap("mlp.gate_proj.output", g)
    tap("mlp.up_proj.output", u)
    act = jax.nn.silu(g.astype(jnp.float32)).astype(g.dtype) * u
    act = quantize_activation(act, spec)
    tap("mlp.down_proj.input", act)
    d = act @ lp["wdown"]
    tap("mlp.down_proj.output", d)
    return residual + d, taps


def embed(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed"], input_ids, axis=0)


def layer_aux(params: Params, cfg: ModelConfig, seqlen: int):
    """Positional/mask auxiliaries shared by every layer at a given seqlen."""
    positions = jnp.arange(seqlen)
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    return cos, sin, causal_mask(seqlen, seqlen)


def hessian_tap_specs(cfg: ModelConfig) -> Dict[str, int]:
    """Distinct linear-input taps needing a GPTQ Hessian -> input feature count.

    q/k/v see the same (normed, reordered, quantized) tensor; so do gate/up —
    one Hessian each instead of the reference's three separate accumulators.
    """
    h = cfg.hidden_size
    return {
        "self_attn.q_proj.input": h,
        "self_attn.o_proj.input": cfg.num_heads * cfg.head_dim,
        "mlp.gate_proj.input": h,
        "mlp.down_proj.input": cfg.intermediate_size,
    }


def gptq_apply(lp: Params, hessians: Dict[str, jnp.ndarray], quantize_fn) -> Params:
    """Quantize one layer's linears against their input Hessians.

    ``quantize_fn(w_out_in, hessian, name=wname) -> w_q`` operates in [out, in]
    convention; ``name`` identifies the param so callers can record per-weight
    aux data (e.g. the GPTQ group scales the serving export needs).
    """
    wiring = {
        "self_attn.q_proj.input": ("wq", "wk", "wv"),
        "self_attn.o_proj.input": ("wo",),
        "mlp.gate_proj.input": ("wgate", "wup"),
        "mlp.down_proj.input": ("wdown",),
    }
    lp = dict(lp)
    for tapname, wnames in wiring.items():
        h = hessians[tapname]
        for wname in wnames:
            lp[wname] = quantize_fn(lp[wname].T, h, name=wname).T
    return lp


def head(params: Params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    return (x @ params["lm_head"]).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "spec"))
def forward(
    params: Params,
    input_ids: jnp.ndarray,  # [b, t]
    cfg: ModelConfig,
    spec: QuantSpec,
) -> jnp.ndarray:
    """Full-model forward -> fp32 logits [b, t, vocab].

    Layers run under ``lax.scan`` over the stacked parameters: one compiled
    layer body regardless of depth.
    """
    b, t = input_ids.shape
    x = embed(params, input_ids)
    positions = jnp.arange(t)
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    mask = causal_mask(t, t)

    def body(carry, lp):
        y, _ = forward_layer(lp, carry, cos, sin, mask, cfg, spec)
        return y, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return head(params, x, cfg)


def forward_collect_taps(
    params: Params,
    input_ids: jnp.ndarray,
    cfg: ModelConfig,
    spec: QuantSpec,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Forward with calibration taps for every linear (host-loop over layers).

    Tap keys: ``layers.{i}.{module}.{input|output}`` — the reference's naming
    (``model/outlier.py:241-249``).
    """
    b, t = input_ids.shape
    x = embed(params, input_ids)
    positions = jnp.arange(t)
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    mask = causal_mask(t, t)
    all_taps: Dict[str, jnp.ndarray] = {}
    for i in range(cfg.num_layers):
        lp = get_layer(params, i)
        x, taps = forward_layer(
            lp, x, cos, sin, mask, cfg, spec, collect_taps=True
        )
        for name, val in taps.items():
            all_taps[f"layers.{i}.{name}"] = val
    return head(params, x, cfg), all_taps


# ---------------------------------------------------------------------------
# Calibration wiring: reorder + weight quantization
# ---------------------------------------------------------------------------


LAYER_WEIGHT_OF = {
    "q_proj": "wq",
    "k_proj": "wk",
    "v_proj": "wv",
    "o_proj": "wo",
    "gate_proj": "wgate",
    "up_proj": "wup",
    "down_proj": "wdown",
}


def apply_reorder_layer(
    lp: Params, idx: Dict[str, jnp.ndarray], layer_prefix: str
) -> Params:
    """Permute one layer's weights + install activation gather indices.

    Mirrors ``reorder_model_llama`` (modelutils_llama.py:15-75):
      - gate/up: input index own, OUTPUT index = down_proj's input index (so the
        silu(gate)*up product is already in down_proj's order and the MLP
        epilogue needs no gather — Activate kernel note, SURVEY §2.2);
      - down: input index own;
      - q/k/v/o: input index own, outputs NOT reordered (RoPE constraint);
      - norm gathers: input_ln <- k_proj's input idx, post_ln <- gate's,
        attention output <- o_proj's.
    Our weights are [in, out]: input reorder indexes axis 0, output axis 1.
    """
    n = lambda mod: idx[f"{layer_prefix}.{mod}.input"]
    lp = dict(lp)
    down_in = n("mlp.down_proj")
    lp["wgate"] = lp["wgate"][n("mlp.gate_proj")][:, down_in]
    lp["wup"] = lp["wup"][n("mlp.up_proj")][:, down_in]
    lp["wdown"] = lp["wdown"][down_in]
    lp["wq"] = lp["wq"][n("self_attn.q_proj")]
    lp["wk"] = lp["wk"][n("self_attn.k_proj")]
    lp["wv"] = lp["wv"][n("self_attn.v_proj")]
    lp["wo"] = lp["wo"][n("self_attn.o_proj")]
    lp["attn_ln_idx"] = n("self_attn.k_proj").astype(jnp.int32)
    lp["mlp_ln_idx"] = n("mlp.gate_proj").astype(jnp.int32)
    lp["attn_out_idx"] = n("self_attn.o_proj").astype(jnp.int32)
    return lp


def apply_reorder(params: Params, cfg: ModelConfig, idx: Dict[str, jnp.ndarray]) -> Params:
    for i in range(cfg.num_layers):
        lp = apply_reorder_layer(get_layer(params, i), idx, f"layers.{i}")
        params = set_layer(params, i, lp)
    return params


def quantize_layer_weights_rtn(lp: Params, spec: QuantSpec) -> Params:
    """Round-to-nearest weight quantization of one layer (``quantize_model_llama``)."""
    from atom_tpu.quant.core import quantize_weight

    lp = dict(lp)
    for wname in ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown"):
        # Core operates in [out, in] (reference convention, keeper = trailing
        # input channels); our storage is [in, out].
        lp[wname] = quantize_weight(lp[wname].T, spec).T
    return lp


def quantize_weights_rtn(params: Params, cfg: ModelConfig, spec: QuantSpec) -> Params:
    for i in range(cfg.num_layers):
        params = set_layer(
            params, i, quantize_layer_weights_rtn(get_layer(params, i), spec)
        )
    return params


def load_hf_params(path: str, cfg: ModelConfig, dtype=None):
    """Local HF checkpoint -> this module's params (see models.hf_loader)."""
    import jax.numpy as jnp

    from atom_tpu.models.hf_loader import load_llama_params

    return load_llama_params(path, cfg, dtype or jnp.bfloat16)
