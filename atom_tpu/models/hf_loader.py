"""HF checkpoint loading: local safetensors/PyTorch weights -> our pytrees.

The reference loads models with ``AutoModelForCausalLM.from_pretrained``
(``model/main.py:17-51``); this environment has no network egress, so loading
works from LOCAL checkpoint directories only (anything
``transformers``-savable: Llama 1/2, OPT, Mixtral).  Weight orientation: HF
``nn.Linear`` stores [out, in]; our functional models use [in, out], so every
matrix transposes on the way in.

Also provides ``pack_calibrated_params``: calibrated fake-quant Llama params
(reordered + RTN/GPTQ weights + reorder indices) -> the packed serving
``ServingParams`` consumed by the real-kernel engine, closing the loop from
the accuracy pipeline to deployment.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

from atom_tpu.models.configs import Arch, ModelConfig


def _to_np(t) -> np.ndarray:
    import torch

    if t.dtype == torch.bfloat16:
        return t.detach().to(torch.float32).numpy()
    return t.detach().numpy()


def _load_state_dict(path: str) -> Dict[str, Any]:
    """State dict from a local HF checkpoint dir (safetensors or .bin)."""
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(path)
    return {k: _to_np(v) for k, v in model.state_dict().items()}


def config_from_hf(path: str) -> ModelConfig:
    """ModelConfig from a local HF config.json."""
    from transformers import AutoConfig

    c = AutoConfig.from_pretrained(path)
    mt = c.model_type
    if mt == "llama":
        return ModelConfig(
            arch=Arch.LLAMA,
            vocab_size=c.vocab_size,
            hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_layers=c.num_hidden_layers,
            num_heads=c.num_attention_heads,
            num_kv_heads=getattr(c, "num_key_value_heads", c.num_attention_heads),
            head_dim=c.hidden_size // c.num_attention_heads,
            max_position_embeddings=c.max_position_embeddings,
            rope_theta=getattr(c, "rope_theta", 10000.0),
            norm_eps=c.rms_norm_eps,
        )
    if mt == "opt":
        return ModelConfig(
            arch=Arch.OPT,
            vocab_size=c.vocab_size,
            hidden_size=c.hidden_size,
            intermediate_size=c.ffn_dim,
            num_layers=c.num_hidden_layers,
            num_heads=c.num_attention_heads,
            num_kv_heads=c.num_attention_heads,
            head_dim=c.hidden_size // c.num_attention_heads,
            max_position_embeddings=c.max_position_embeddings,
            do_layer_norm_before=c.do_layer_norm_before,
            tie_word_embeddings=True,
        )
    if mt == "mixtral":
        return ModelConfig(
            arch=Arch.MIXTRAL,
            vocab_size=c.vocab_size,
            hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_layers=c.num_hidden_layers,
            num_heads=c.num_attention_heads,
            num_kv_heads=c.num_key_value_heads,
            head_dim=c.hidden_size // c.num_attention_heads,
            max_position_embeddings=c.max_position_embeddings,
            rope_theta=getattr(c, "rope_theta", 1e6),
            norm_eps=c.rms_norm_eps,
            num_experts=c.num_local_experts,
            num_experts_per_tok=c.num_experts_per_tok,
        )
    raise ValueError(f"unsupported model_type {mt!r}")


def _stack_layers(layers):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def load_llama_params(path: str, cfg: ModelConfig, dtype=jnp.bfloat16):
    sd = _load_state_dict(path)

    def w(name):
        return jnp.asarray(sd[name].T, dtype)  # [in, out]

    def v(name):
        return jnp.asarray(sd[name], dtype)

    d, qh = cfg.hidden_size, cfg.num_heads * cfg.head_dim
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layers.append({
            "input_ln": v(p + "input_layernorm.weight"),
            "post_ln": v(p + "post_attention_layernorm.weight"),
            "wq": w(p + "self_attn.q_proj.weight"),
            "wk": w(p + "self_attn.k_proj.weight"),
            "wv": w(p + "self_attn.v_proj.weight"),
            "wo": w(p + "self_attn.o_proj.weight"),
            "wgate": w(p + "mlp.gate_proj.weight"),
            "wup": w(p + "mlp.up_proj.weight"),
            "wdown": w(p + "mlp.down_proj.weight"),
            "attn_ln_idx": jnp.arange(d, dtype=jnp.int32),
            "mlp_ln_idx": jnp.arange(d, dtype=jnp.int32),
            "attn_out_idx": jnp.arange(qh, dtype=jnp.int32),
        })
    lm_head = (
        w("lm_head.weight") if "lm_head.weight" in sd
        else jnp.asarray(sd["model.embed_tokens.weight"], dtype).T
    )
    return {
        "embed": v("model.embed_tokens.weight"),
        "final_norm": v("model.norm.weight"),
        "lm_head": lm_head,
        "layers": _stack_layers(layers),
    }


def load_opt_params(path: str, cfg: ModelConfig, dtype=jnp.bfloat16):
    sd = _load_state_dict(path)
    pre = "model.decoder."

    def w(name):
        return jnp.asarray(sd[pre + name].T, dtype)

    def v(name):
        return jnp.asarray(sd[pre + name], dtype)

    d = cfg.hidden_size
    layers = []
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        layers.append({
            "attn_ln_w": v(p + "self_attn_layer_norm.weight"),
            "attn_ln_b": v(p + "self_attn_layer_norm.bias"),
            "final_ln_w": v(p + "final_layer_norm.weight"),
            "final_ln_b": v(p + "final_layer_norm.bias"),
            "wq": w(p + "self_attn.q_proj.weight"),
            "bq": v(p + "self_attn.q_proj.bias"),
            "wk": w(p + "self_attn.k_proj.weight"),
            "bk": v(p + "self_attn.k_proj.bias"),
            "wv": w(p + "self_attn.v_proj.weight"),
            "bv": v(p + "self_attn.v_proj.bias"),
            "wo": w(p + "self_attn.out_proj.weight"),
            "bo": v(p + "self_attn.out_proj.bias"),
            "fc1_w": w(p + "fc1.weight"),
            "fc1_b": v(p + "fc1.bias"),
            "fc2_w": w(p + "fc2.weight"),
            "fc2_b": v(p + "fc2.bias"),
            "attn_ln_idx": jnp.arange(d, dtype=jnp.int32),
            "mlp_ln_idx": jnp.arange(d, dtype=jnp.int32),
            "attn_out_idx": jnp.arange(d, dtype=jnp.int32),
        })
    return {
        "embed": v("embed_tokens.weight"),
        "pos_embed": v("embed_positions.weight"),
        "final_ln_w": v("final_layer_norm.weight"),
        "final_ln_b": v("final_layer_norm.bias"),
        "layers": _stack_layers(layers),
    }


def load_mixtral_params(path: str, cfg: ModelConfig, dtype=jnp.bfloat16):
    sd = _load_state_dict(path)

    def w(name):
        return jnp.asarray(sd[name].T, dtype)

    def v(name):
        return jnp.asarray(sd[name], dtype)

    d, qh = cfg.hidden_size, cfg.num_heads * cfg.head_dim
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        moe = p + "block_sparse_moe."
        layers.append({
            "input_ln": v(p + "input_layernorm.weight"),
            "post_ln": v(p + "post_attention_layernorm.weight"),
            "wq": w(p + "self_attn.q_proj.weight"),
            "wk": w(p + "self_attn.k_proj.weight"),
            "wv": w(p + "self_attn.v_proj.weight"),
            "wo": w(p + "self_attn.o_proj.weight"),
            "router": w(moe + "gate.weight"),
            "w1": jnp.stack([
                w(moe + f"experts.{e}.w1.weight") for e in range(cfg.num_experts)
            ]),
            "w3": jnp.stack([
                w(moe + f"experts.{e}.w3.weight") for e in range(cfg.num_experts)
            ]),
            "w2": jnp.stack([
                w(moe + f"experts.{e}.w2.weight") for e in range(cfg.num_experts)
            ]),
            "attn_ln_idx": jnp.arange(d, dtype=jnp.int32),
            "mlp_ln_idx": jnp.arange(d, dtype=jnp.int32),
            "attn_out_idx": jnp.arange(qh, dtype=jnp.int32),
        })
    return {
        "embed": v("model.embed_tokens.weight"),
        "final_norm": v("model.norm.weight"),
        "lm_head": w("lm_head.weight"),
        "layers": _stack_layers(layers),
    }


# ---------------------------------------------------------------------------
# Calibrated fake-quant Llama -> packed serving weights
# ---------------------------------------------------------------------------


def pack_calibrated_params(
    params, cfg: ModelConfig, spec, *, orig_params=None, gptq_scales=None
):
    """Calibrated (reordered, weight-quantized) Llama accuracy-pipeline params
    -> ``serving.model.ServingParams``, closing the calibrate -> serve loop.

    Exactness depends on what the caller supplies (both are cheap to have):

    * ``gptq_scales`` (GPTQ calibration): the per-group scales exported by
      ``calibrate(..., scales_out=...)``.  GPTQ derives each group's grid from
      the error-compensated weights mid-loop, so the grid is NOT recoverable
      from the fake values; with the export, code recovery is exact
      (:func:`ops.formats.pack_gptq_output`).
    * ``orig_params`` (RTN calibration): the REORDERED, weight-UNQUANTIZED
      params (``reorder_model(original, cfg, indices)``).  The serving RTN
      quantizer shares its scale math with the accuracy fake-quant
      (``compute_scale_sym`` absmax*clip/7 per channel-grouped 128-group), so
      packing the originals reproduces the fake-quant weights exactly.
    * Neither: the fake values are re-quantized with the clip ratio DISABLED
      (they already sit on the clipped grid; clipping twice would shrink it
      again).  Near-exact — groups whose minimum sits on the -2^(b-1) clamp
      re-derive a slightly wide scale and may move a few codes by one step.

    Reorder indices transfer as-is; q/k/v and gate/up fuse into the wide
    serving GEMMs (per-piece packing concatenated on the output axis, valid
    since scales are per-output-channel-group and ``out % channel_group == 0``
    for every piece).
    """
    from atom_tpu.ops.formats import (
        concat_packed_out,
        pack_for_kernel,
        pack_gptq_output,
        quantize_weight_packed,
    )
    from atom_tpu.serving.model import ServingLayerParams, ServingParams

    rtn_spec = spec if orig_params is not None else spec.replace(
        w_clip_ratio=1.0
    )

    def packed(i, lp, lp_orig, *wnames):
        pws = []
        for wname in wnames:
            if gptq_scales is not None:
                pws.append(
                    pack_gptq_output(
                        lp[wname], gptq_scales[f"{i}.{wname}"], spec
                    )
                )
            else:
                src = lp_orig[wname] if lp_orig is not None else lp[wname]
                pws.append(quantize_weight_packed(src, rtn_spec))
        return pack_for_kernel(pws[0] if len(pws) == 1 else concat_packed_out(pws))

    layers = []
    for i in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        lp_orig = (
            None
            if orig_params is None
            else jax.tree.map(lambda a: a[i], orig_params["layers"])
        )
        layers.append(ServingLayerParams(
            ln_attn=lp["input_ln"].astype(jnp.bfloat16),
            ln_mlp=lp["post_ln"].astype(jnp.bfloat16),
            attn_reorder=lp["attn_ln_idx"],
            o_reorder=lp["attn_out_idx"],
            mlp_reorder=lp["mlp_ln_idx"],
            wqkv=packed(i, lp, lp_orig, "wq", "wk", "wv"),
            wo=packed(i, lp, lp_orig, "wo"),
            wgateup=packed(i, lp, lp_orig, "wgate", "wup"),
            wdown=packed(i, lp, lp_orig, "wdown"),
            ln_attn_g=jnp.take(
                lp["input_ln"].astype(jnp.bfloat16), lp["attn_ln_idx"]
            ),
            ln_mlp_g=jnp.take(
                lp["post_ln"].astype(jnp.bfloat16), lp["mlp_ln_idx"]
            ),
        ))
    return ServingParams(
        embed=params["embed"].astype(jnp.bfloat16),
        final_norm=params["final_norm"].astype(jnp.bfloat16),
        lm_head=params["lm_head"].astype(jnp.bfloat16),
        layers=layers,
    )


def pack_calibrated_params_moe(
    params, cfg: ModelConfig, spec, *, orig_params=None, gptq_scales=None
):
    """Mixtral analog of :func:`pack_calibrated_params`: calibrated fake-quant
    MoE params -> ``serving.moe.MoEServingParams``.

    Same exactness contract (GPTQ scales keyed ``"{layer}.{w}"`` and per
    expert ``"{layer}.{w}.{e}"`` as exported by ``calibrate(...,
    scales_out=...)``; RTN from the reordered originals).  Expert w1/w3 fuse
    into the stacked ``wgateup`` (gate = w1, up = w3, matching
    ``_moe_mlp``'s silu(w1)·w3); the float router's rows are already in
    mlp_reorder order (``modelutils_mixtral.py:63-85``) and transfer as-is.
    """
    from atom_tpu.ops.formats import (
        concat_packed_out,
        pack_for_kernel,
        pack_gptq_output,
        quantize_weight_packed,
    )
    from atom_tpu.serving.moe import (
        MoEServingLayerParams,
        MoEServingParams,
        _stack_experts,
    )

    rtn_spec = spec if orig_params is not None else spec.replace(
        w_clip_ratio=1.0
    )

    def one(i, lp, lp_orig, wname, e=None):
        if gptq_scales is not None:
            key = f"{i}.{wname}" if e is None else f"{i}.{wname}.{e}"
            w = lp[wname] if e is None else lp[wname][e]
            return pack_gptq_output(w, gptq_scales[key], spec)
        src_lp = lp_orig if lp_orig is not None else lp
        src = src_lp[wname] if e is None else src_lp[wname][e]
        return quantize_weight_packed(src, rtn_spec)

    layers = []
    for i in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        lp_orig = (
            None
            if orig_params is None
            else jax.tree.map(lambda a: a[i], orig_params["layers"])
        )
        wqkv = pack_for_kernel(concat_packed_out(
            [one(i, lp, lp_orig, n) for n in ("wq", "wk", "wv")]
        ))
        gus = [
            pack_for_kernel(concat_packed_out(
                [one(i, lp, lp_orig, "w1", e), one(i, lp, lp_orig, "w3", e)]
            ))
            for e in range(cfg.num_experts)
        ]
        downs = [
            pack_for_kernel(one(i, lp, lp_orig, "w2", e))
            for e in range(cfg.num_experts)
        ]
        layers.append(MoEServingLayerParams(
            ln_attn=lp["input_ln"].astype(jnp.bfloat16),
            ln_mlp=lp["post_ln"].astype(jnp.bfloat16),
            attn_reorder=lp["attn_ln_idx"],
            o_reorder=lp["attn_out_idx"],
            mlp_reorder=lp["mlp_ln_idx"],
            wqkv=wqkv,
            wo=pack_for_kernel(one(i, lp, lp_orig, "wo")),
            router=lp["router"].astype(jnp.bfloat16),
            wgateup=_stack_experts(gus),
            wdown=_stack_experts(downs),
        ))
    return MoEServingParams(
        embed=params["embed"].astype(jnp.bfloat16),
        final_norm=params["final_norm"].astype(jnp.bfloat16),
        lm_head=params["lm_head"].astype(jnp.bfloat16),
        layers=layers,
    )
