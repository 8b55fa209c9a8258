"""Functional fake-quant OPT — second model family of the accuracy pipeline.

Capability equivalent of the reference's ``model/qOPTLayer.py`` /
``modelutils_opt.py``.  Differences from Llama (see ``qOPTLayer.py``):

  * LayerNorm (with bias) instead of RMSNorm; all linears carry biases;
  * learned positional embeddings (HF offset +2), no RoPE — K is quantized
    directly before the QK product (``qOPTLayer.py:104-106``), V before the
    attn·V product (``qOPTLayer.py:156-160``);
  * pre-norm ("do_layer_norm_before") architecture: 125M..66B;
  * MLP is fc1 -> ReLU -> act quant -> fc2 (``qOPTLayer.py:290-298``);
  * queries are pre-scaled by 1/sqrt(head_dim) at projection
    (``qOPTLayer.py:70``).

Reorder wiring (``modelutils_opt.py:13-76``): fc1 is out-reordered by fc2's
input index; q/k/v/out_proj in-reordered by their own indices;
self_attn_layer_norm gathers by k_proj's input index, final_layer_norm by fc1's,
and the attention output by out_proj's.  NOTE: unlike the reference (which
permutes only the weight in ``QLinearLayer.reorder``, leaving fc1's bias
unpermuted — a latent bug its Llama path never hits because Llama has no
biases), we permute the bias together with the output channels.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from atom_tpu.config import QuantSpec
from atom_tpu.models.base import get_layer, set_layer, stack_layers
from atom_tpu.models.configs import ModelConfig
from atom_tpu.models.nn import attention, causal_mask, layernorm
from atom_tpu.quant.core import quantize_activation, quantize_kv_head

Params = Dict[str, Any]


def init_layer_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16) -> Params:
    h = cfg.hidden_size
    inter = cfg.intermediate_size
    ks = jax.random.split(key, 6)
    init = lambda k, i, o: (jax.random.normal(k, (i, o), jnp.float32) * 0.02).astype(dtype)
    zeros = lambda n: jnp.zeros((n,), dtype)
    return {
        "attn_ln_w": jnp.ones((h,), dtype),
        "attn_ln_b": zeros(h),
        "final_ln_w": jnp.ones((h,), dtype),
        "final_ln_b": zeros(h),
        "wq": init(ks[0], h, h), "bq": zeros(h),
        "wk": init(ks[1], h, h), "bk": zeros(h),
        "wv": init(ks[2], h, h), "bv": zeros(h),
        "wo": init(ks[3], h, h), "bo": zeros(h),
        "fc1_w": init(ks[4], h, inter), "fc1_b": zeros(inter),
        "fc2_w": init(ks[5], inter, h), "fc2_b": zeros(h),
        "attn_ln_idx": jnp.arange(h, dtype=jnp.int32),
        "mlp_ln_idx": jnp.arange(h, dtype=jnp.int32),
        "attn_out_idx": jnp.arange(h, dtype=jnp.int32),
    }


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16) -> Params:
    kE, kP, kL = jax.random.split(key, 3)
    layer_keys = jax.random.split(kL, cfg.num_layers)
    embed = (
        jax.random.normal(kE, (cfg.vocab_size, cfg.hidden_size), jnp.float32) * 0.02
    ).astype(dtype)
    return {
        "embed": embed,
        # HF OPT reserves 2 leading positions (padding offset).
        "pos_embed": (
            jax.random.normal(
                kP, (cfg.max_position_embeddings + 2, cfg.hidden_size), jnp.float32
            ) * 0.02
        ).astype(dtype),
        "final_ln_w": jnp.ones((cfg.hidden_size,), dtype),
        "final_ln_b": jnp.zeros((cfg.hidden_size,), dtype),
        # OPT ties lm_head to the token embedding.
        "layers": stack_layers(
            [init_layer_params(k, cfg, dtype) for k in layer_keys]
        ),
    }


def forward_layer(
    lp: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: ModelConfig,
    spec: QuantSpec,
    collect_taps: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    b, t, h = x.shape
    eps = cfg.norm_eps
    taps: Dict[str, jnp.ndarray] = {}

    def tap(name, val):
        if collect_taps:
            taps[name] = val

    residual = x
    hid = layernorm(x, lp["attn_ln_w"], lp["attn_ln_b"], eps)
    hid = jnp.take(hid, lp["attn_ln_idx"], axis=-1)
    hid = quantize_activation(hid, spec)

    for nm in ("q_proj", "k_proj", "v_proj"):
        tap(f"self_attn.{nm}.input", hid)
    q = hid @ lp["wq"] + lp["bq"]
    k = hid @ lp["wk"] + lp["bk"]
    v = hid @ lp["wv"] + lp["bv"]
    tap("self_attn.q_proj.output", q)
    tap("self_attn.k_proj.output", k)
    tap("self_attn.v_proj.output", v)

    to_heads = lambda z: z.reshape(b, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    q, k, v = to_heads(q), to_heads(k), to_heads(v)

    # K/V quantized per-head (no RoPE in OPT; qOPTLayer.py:104-106,156-160).
    k = quantize_kv_head(k, spec)
    v = quantize_kv_head(v, spec)

    attn = attention(q, k, v, mask)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, h)
    attn = jnp.take(attn, lp["attn_out_idx"], axis=-1)
    attn = quantize_activation(attn, spec)
    tap("self_attn.out_proj.input", attn)
    o = attn @ lp["wo"] + lp["bo"]
    tap("self_attn.out_proj.output", o)
    x = residual + o

    residual = x
    hid = layernorm(x, lp["final_ln_w"], lp["final_ln_b"], eps)
    hid = jnp.take(hid, lp["mlp_ln_idx"], axis=-1)
    hid = quantize_activation(hid, spec)
    tap("fc1.input", hid)
    f = hid @ lp["fc1_w"] + lp["fc1_b"]
    tap("fc1.output", f)
    f = jnp.maximum(f, 0)  # ReLU
    f = quantize_activation(f, spec)
    tap("fc2.input", f)
    out = f @ lp["fc2_w"] + lp["fc2_b"]
    tap("fc2.output", out)
    return residual + out, taps


def embed(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    t = input_ids.shape[-1]
    tok = jnp.take(params["embed"], input_ids, axis=0)
    pos = params["pos_embed"][jnp.arange(t) + 2]
    return tok + pos


def head(params: Params, x: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    x = layernorm(x, params["final_ln_w"], params["final_ln_b"], cfg.norm_eps)
    return (x @ params["embed"].T).astype(jnp.float32)


def layer_aux(params: Params, cfg: ModelConfig, seqlen: int):
    return (causal_mask(seqlen, seqlen),)


@functools.partial(jax.jit, static_argnames=("cfg", "spec"))
def forward(
    params: Params, input_ids: jnp.ndarray, cfg: ModelConfig, spec: QuantSpec
) -> jnp.ndarray:
    x = embed(params, input_ids)
    (mask,) = layer_aux(params, cfg, input_ids.shape[1])

    def body(carry, lp):
        y, _ = forward_layer(lp, carry, mask, cfg, spec)
        return y, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return head(params, x, cfg)


def forward_collect_taps(
    params: Params, input_ids: jnp.ndarray, cfg: ModelConfig, spec: QuantSpec
):
    x = embed(params, input_ids)
    (mask,) = layer_aux(params, cfg, input_ids.shape[1])
    all_taps: Dict[str, jnp.ndarray] = {}
    for i in range(cfg.num_layers):
        lp = get_layer(params, i)
        x, taps = forward_layer(lp, x, mask, cfg, spec, collect_taps=True)
        for name, val in taps.items():
            all_taps[f"layers.{i}.{name}"] = val
    return head(params, x, cfg), all_taps


# ---------------------------------------------------------------------------
# Calibration wiring
# ---------------------------------------------------------------------------


def apply_reorder_layer(lp: Params, idx: Dict[str, jnp.ndarray], prefix: str) -> Params:
    n = lambda mod: idx[f"{prefix}.{mod}.input"]
    lp = dict(lp)
    fc2_in = n("fc2")
    lp["fc1_w"] = lp["fc1_w"][n("fc1")][:, fc2_in]
    lp["fc1_b"] = lp["fc1_b"][fc2_in]  # bias follows the output permutation
    lp["fc2_w"] = lp["fc2_w"][fc2_in]
    lp["wq"] = lp["wq"][n("self_attn.q_proj")]
    lp["wk"] = lp["wk"][n("self_attn.k_proj")]
    lp["wv"] = lp["wv"][n("self_attn.v_proj")]
    lp["wo"] = lp["wo"][n("self_attn.out_proj")]
    lp["attn_ln_idx"] = n("self_attn.k_proj").astype(jnp.int32)
    lp["mlp_ln_idx"] = n("fc1").astype(jnp.int32)
    lp["attn_out_idx"] = n("self_attn.out_proj").astype(jnp.int32)
    return lp


def apply_reorder(params: Params, cfg: ModelConfig, idx: Dict[str, jnp.ndarray]) -> Params:
    for i in range(cfg.num_layers):
        params = set_layer(
            params, i, apply_reorder_layer(get_layer(params, i), idx, f"layers.{i}")
        )
    return params


_WEIGHTS = ("wq", "wk", "wv", "wo", "fc1_w", "fc2_w")


def quantize_layer_weights_rtn(lp: Params, spec: QuantSpec) -> Params:
    from atom_tpu.quant.core import quantize_weight

    lp = dict(lp)
    for wname in _WEIGHTS:
        lp[wname] = quantize_weight(lp[wname].T, spec).T
    return lp


def quantize_weights_rtn(params: Params, cfg: ModelConfig, spec: QuantSpec) -> Params:
    for i in range(cfg.num_layers):
        params = set_layer(
            params, i, quantize_layer_weights_rtn(get_layer(params, i), spec)
        )
    return params


def hessian_tap_specs(cfg: ModelConfig) -> Dict[str, int]:
    h = cfg.hidden_size
    return {
        "self_attn.q_proj.input": h,
        "self_attn.out_proj.input": h,
        "fc1.input": h,
        "fc2.input": cfg.intermediate_size,
    }


def gptq_apply(lp: Params, hessians: Dict[str, jnp.ndarray], quantize_fn) -> Params:
    wiring = {
        "self_attn.q_proj.input": ("wq", "wk", "wv"),
        "self_attn.out_proj.input": ("wo",),
        "fc1.input": ("fc1_w",),
        "fc2.input": ("fc2_w",),
    }
    lp = dict(lp)
    for tapname, wnames in wiring.items():
        for wname in wnames:
            lp[wname] = quantize_fn(lp[wname].T, hessians[tapname], name=wname).T
    return lp


def load_hf_params(path: str, cfg: ModelConfig, dtype=None):
    """Local HF checkpoint -> this module's params (see models.hf_loader)."""
    import jax.numpy as jnp

    from atom_tpu.models.hf_loader import load_opt_params

    return load_opt_params(path, cfg, dtype or jnp.bfloat16)
