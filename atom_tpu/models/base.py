"""Shared helpers for stacked-layer functional models."""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def stack_layers(layers: List[Params]) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def get_layer(params: Params, i: int) -> Params:
    return jax.tree.map(lambda a: a[i], params["layers"])


def set_layer(params: Params, i: int, lp: Params) -> Params:
    new_layers = jax.tree.map(
        lambda stack, leaf: stack.at[i].set(leaf), params["layers"], lp
    )
    return {**params, "layers": new_layers}
