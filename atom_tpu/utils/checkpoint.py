"""Checkpointing: calibrated/quantized model state + calibration artifacts.

The reference persists only reorder indices (``model/main.py:237-245``) and
earmarks ``--save_dir`` for quantized weights (``main.py:182-185``).  Here the
whole calibrated state round-trips: the params pytree (fake-quant weights, or
packed serving weights via ``ops.formats.pack_weight_storage``), the reorder
indices, and the (cfg, spec) metadata that produced them.

Format: one ``.npz`` per save (pytree flattened by keypath) + a JSON sidecar.
Dependency-light and portable; orbax remains an option for sharded multi-host
checkpoints later.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _keypaths(tree):
    return [
        "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in path
        )
        for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    ]


_DTYPES_KEY = "__saved_dtypes__"


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    dtypes = {}
    for key, leaf in zip(_keypaths(tree), jax.tree_util.tree_leaves(tree)):
        arr = np.asarray(leaf)
        dtypes[key] = str(arr.dtype)
        # bf16 has no portable npz dtype; store the raw bits (restore views
        # back through the RECORDED dtype, never the target leaf's).
        if arr.dtype == jax.numpy.bfloat16:
            arr = arr.view(np.uint16)
        flat[key] = arr
    # Leaf dtypes ride along in the archive so restore can decode bit-views
    # and detect dtype drift instead of reinterpreting raw bits.
    flat[_DTYPES_KEY] = np.frombuffer(
        json.dumps(dtypes).encode(), dtype=np.uint8
    )
    return flat


def save_pytree(path: str, tree) -> None:
    np.savez(path, **_flatten(tree))


def restore_pytree(path: str, like):
    """Restore into the structure of ``like`` (keypaths must match).

    Each saved leaf is first decoded through its RECORDED dtype (so bf16
    bit-views are always undone, even if the target leaf's dtype drifted),
    then cast to the target leaf's dtype.
    """
    data = np.load(path)
    keys = _keypaths(like)
    saved_dtypes = {}
    files = set(data.files)
    if _DTYPES_KEY in files:
        saved_dtypes = json.loads(bytes(data[_DTYPES_KEY]).decode())
        files.discard(_DTYPES_KEY)
    assert set(keys) == files, (
        f"checkpoint keys mismatch: {set(keys) ^ files}"
    )
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = []
    for k, l in zip(keys, leaves_like):
        arr = data[k]
        # Shape mismatches must be loud: scan-based forwards iterate the
        # leading (layer) axis of whatever is restored, so a silently
        # differently-shaped stack runs a different model than the config
        # says (e.g. a full-depth checkpoint behind a truncated cfg).
        assert arr.shape == tuple(l.shape), (
            f"checkpoint leaf {k}: saved shape {arr.shape} != expected "
            f"{tuple(l.shape)}"
        )
        saved = saved_dtypes.get(k)
        if saved == "bfloat16":
            arr = arr.view("uint16").view(jax.numpy.bfloat16)
        elif saved is None and l.dtype == jax.numpy.bfloat16:
            # legacy checkpoint (no dtype sidecar): old behavior
            arr = arr.view("uint16").view(jax.numpy.bfloat16)
        new_leaves.append(jax.numpy.asarray(arr).astype(l.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _write_meta(save_dir: str, cfg, spec) -> None:
    meta = {
        "cfg": dataclasses.asdict(cfg),
        "spec": {
            k: (v.value if hasattr(v, "value") else v)
            for k, v in dataclasses.asdict(spec).items()
        },
    }
    with open(os.path.join(save_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def save_quantized(save_dir: str, params, indices, cfg, spec) -> None:
    os.makedirs(save_dir, exist_ok=True)
    save_pytree(os.path.join(save_dir, "params.npz"), params)
    if indices:
        save_pytree(os.path.join(save_dir, "reorder_indices.npz"), indices)
    _write_meta(save_dir, cfg, spec)


def restore_model_params(path: str, m, full_cfg, layers: int = 0):
    """Restore accuracy-model params saved by :func:`save_pytree`.

    The template comes from ``jax.eval_shape`` over ``m.init_params`` (no
    weight materialization).  The checkpoint is tried at ``full_cfg``'s depth
    first, then — if it was itself saved truncated — at ``layers`` depth; a
    full-depth restore is sliced down to ``layers`` when given.  Centralizes
    the truncation handling main.py and scripts share (a silent depth
    mismatch makes scan-based forwards run a different model than the cfg
    says — see restore_pytree's shape assert).
    """
    import jax.numpy as jnp

    def _like(c):
        return jax.eval_shape(
            lambda k: m.init_params(k, c, jnp.bfloat16), jax.random.PRNGKey(0)
        )

    try:
        params = restore_pytree(path, _like(full_cfg))
        if layers:
            params = {
                **params,
                "layers": jax.tree.map(
                    lambda a: a[:layers], params["layers"]
                ),
            }
        return params
    except AssertionError:
        if not layers:
            raise
        # checkpoint itself saved at truncated depth
        return restore_pytree(path, _like(full_cfg.replace(num_layers=layers)))


def load_meta(save_dir: str) -> Tuple[Any, Any]:
    from atom_tpu.config import KeeperPrecision, QuantSpec, QuantType
    from atom_tpu.models.configs import Arch, ModelConfig

    with open(os.path.join(save_dir, "meta.json")) as f:
        meta = json.load(f)
    cfg = ModelConfig(**{**meta["cfg"], "arch": Arch(meta["cfg"]["arch"])})
    sd = meta["spec"]
    sd["keeper_precision"] = KeeperPrecision(int(sd["keeper_precision"]))
    sd["quant_type"] = QuantType(sd["quant_type"])
    spec = QuantSpec(**sd)
    return cfg, spec


def save_serving(save_dir: str, serving_params, cfg, spec) -> None:
    """Persist packed real-kernel ``ServingParams`` (+ the producing cfg/spec).

    The deployment half of the reference's offline split: its serving stacks
    load converted quantized checkpoints (``e2e/punica-atom/punica/models/
    llama.py:35-59``); here ``main.py --export_serving`` writes this directory
    and the engine restores it with :func:`load_serving`.
    """
    os.makedirs(save_dir, exist_ok=True)
    save_pytree(os.path.join(save_dir, "serving_params.npz"), serving_params)
    _write_meta(save_dir, cfg, spec)


def load_serving(save_dir: str):
    """Restore ``(serving_params, cfg, spec)`` saved by :func:`save_serving`.

    The template comes from ``jax.eval_shape`` over ``init_serving_params`` —
    structure and dtypes without materializing a second copy of the weights.
    """
    import functools

    import jax.numpy as jnp  # noqa: F401  (bf16 decoding in restore_pytree)

    from atom_tpu.models.configs import Arch

    cfg, spec = load_meta(save_dir)
    if cfg.arch == Arch.MIXTRAL:
        from atom_tpu.serving.moe import init_moe_serving_params as init_fn
    else:
        from atom_tpu.serving.model import init_serving_params as init_fn
    like = jax.eval_shape(
        functools.partial(init_fn, cfg=cfg, spec=spec),
        jax.random.PRNGKey(0),
    )
    params = restore_pytree(
        os.path.join(save_dir, "serving_params.npz"), like
    )
    return params, cfg, spec


def load_quantized(save_dir: str, params_like, indices_like=None):
    params = restore_pytree(os.path.join(save_dir, "params.npz"), params_like)
    indices = None
    idx_path = os.path.join(save_dir, "reorder_indices.npz")
    if indices_like is not None and os.path.exists(idx_path):
        indices = restore_pytree(idx_path, indices_like)
    return params, indices
