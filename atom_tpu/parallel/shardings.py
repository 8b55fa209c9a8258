"""Parameter sharding specs: Megatron-style tensor parallelism + DP + EP.

New capability relative to the reference (SURVEY.md §2.4: no TP/DP/EP exists
there).  Layout follows the standard transformer TP recipe:

  * q/k/v and gate/up projections are column-parallel (output/head axis on
    ``tp``) — no communication on entry;
  * o and down projections are row-parallel (input axis on ``tp``) — XLA emits
    one psum per block where the partial sums meet the residual stream;
  * norms, reorder indices and the residual stream stay replicated on ``tp``;
  * activations shard batch on ``dp``;
  * Mixtral experts shard their stacked expert axis on ``tp`` (expert
    parallelism); attention within the MoE model follows the Llama TP recipe.

All specs address the STACKED layer layout ([num_layers, ...] leaves), so one
spec tree covers the whole model.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _llama_layer_specs() -> Dict[str, P]:
    return {
        "input_ln": P(),
        "post_ln": P(),
        "wq": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "wgate": P(None, None, "tp"),
        "wup": P(None, None, "tp"),
        "wdown": P(None, "tp", None),
        "attn_ln_idx": P(),
        "mlp_ln_idx": P(),
        "attn_out_idx": P(),
    }


def llama_param_specs() -> Dict[str, Any]:
    return {
        "embed": P(None, "tp"),
        "final_norm": P(),
        "lm_head": P(None, "tp"),
        "layers": _llama_layer_specs(),
    }


def opt_param_specs() -> Dict[str, Any]:
    # Stacked layout: every leaf has a leading layer axis.
    layer = {
        "attn_ln_w": P(), "attn_ln_b": P(),
        "final_ln_w": P(), "final_ln_b": P(),
        "wq": P(None, None, "tp"), "bq": P(None, "tp"),
        "wk": P(None, None, "tp"), "bk": P(None, "tp"),
        "wv": P(None, None, "tp"), "bv": P(None, "tp"),
        "wo": P(None, "tp", None), "bo": P(),
        "fc1_w": P(None, None, "tp"), "fc1_b": P(None, "tp"),
        "fc2_w": P(None, "tp", None), "fc2_b": P(),
        "attn_ln_idx": P(), "mlp_ln_idx": P(), "attn_out_idx": P(),
    }
    return {
        "embed": P(None, "tp"),
        "pos_embed": P(None, "tp"),
        "final_ln_w": P(),
        "final_ln_b": P(),
        "layers": layer,
    }


def mixtral_param_specs() -> Dict[str, Any]:
    layer = {
        "input_ln": P(),
        "post_ln": P(),
        "wq": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "router": P(),
        # Expert parallelism: stacked [L, E, in, out] experts shard on E.
        "w1": P(None, "tp", None, None),
        "w3": P(None, "tp", None, None),
        "w2": P(None, "tp", None, None),
        "attn_ln_idx": P(),
        "mlp_ln_idx": P(),
        "attn_out_idx": P(),
    }
    return {
        "embed": P(None, "tp"),
        "final_norm": P(),
        "lm_head": P(None, "tp"),
        "layers": layer,
    }


def shard_params(params, specs, mesh: Mesh):
    """Device-put a parameter pytree according to a spec tree."""

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(
        place,
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))
