"""Tensor-parallel serving: the W4A4 decode/prefill steps over a device mesh.

New capability over the reference (SURVEY.md §2.4 — it has no distributed
backend at all): the quantized serving model shards over a ``tp`` mesh axis
with XLA collectives riding ICI.

Sharding scheme — column-parallel everywhere, chosen because Atom's dual-path
format makes row-parallel awkward (the INT8 keeper block is the last 128
channels of the FULL reordered input; splitting the contraction dim would
strand it on one shard):

  * ``wqkv`` / ``wo`` / ``wgateup`` / ``wdown`` / ``lm_head``: output-column
    sharded; each GEMM computes a [T, N/tp] slice from a replicated quantized
    activation, then all-gathers (decode activations are tiny — [B, D] bf16 is
    256 KB at batch 32; ICI noise).
  * ``wqkv`` shards by head (q heads ++ k heads ++ v heads per shard);
    ``wgateup`` keeps each shard's (gate ++ up) halves adjacent so the
    SiLU·mul stays local.
  * KV pages + paged attention: sharded by kv head, fully communication-free.
  * Quantize epilogues (reorder+group-quant+keeper) always run on FULL
    gathered activations, so group boundaries and the keeper block are
    identical to the single-chip model: **TP output is bitwise-equal to the
    single-chip step** (asserted in tests).

Data parallelism composes at the ENGINE level (each dp group runs its own
workset and KV pool — request-level DP, the production pattern), so the
in-step mesh only needs the tp axis.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import ModelConfig
from atom_tpu.ops.formats import KernelPackedWeight
from atom_tpu.ops.kv_layout import KVPages
from atom_tpu.serving.model import (
    ServingLayerParams,
    ServingParams,
    ServingState,
    decode_hidden,
    prefill_hidden,
)


def _slice_cols(kw: KernelPackedWeight, lo: int, hi: int) -> KernelPackedWeight:
    return KernelPackedWeight(
        body_packed=kw.body_packed[:, lo:hi],
        body_scale=kw.body_scale[:, lo:hi],
        keeper=kw.keeper[:, lo:hi],
        keeper_scale=kw.keeper_scale[lo:hi],
    )


def _cat_w(parts: List[KernelPackedWeight]) -> KernelPackedWeight:
    return KernelPackedWeight(
        body_packed=jnp.concatenate([p.body_packed for p in parts], axis=1),
        body_scale=jnp.concatenate([p.body_scale for p in parts], axis=1),
        keeper=jnp.concatenate([p.keeper for p in parts], axis=1),
        keeper_scale=jnp.concatenate([p.keeper_scale for p in parts], axis=0),
    )


def _shard_cols(kw, tp, i):
    n = kw.body_packed.shape[1]
    return _slice_cols(kw, i * n // tp, (i + 1) * n // tp)


def _shard_qkv(kw, cfg: ModelConfig, tp, i):
    n_q = cfg.num_heads * cfg.head_dim
    n_kv = cfg.num_kv_heads * cfg.head_dim
    return _cat_w([
        _slice_cols(kw, i * n_q // tp, (i + 1) * n_q // tp),
        _slice_cols(kw, n_q + i * n_kv // tp, n_q + (i + 1) * n_kv // tp),
        _slice_cols(
            kw, n_q + n_kv + i * n_kv // tp, n_q + n_kv + (i + 1) * n_kv // tp
        ),
    ])


def _shard_gateup(kw, tp, i):
    inter = kw.body_packed.shape[1] // 2
    return _cat_w([
        _slice_cols(kw, i * inter // tp, (i + 1) * inter // tp),
        _slice_cols(kw, inter + i * inter // tp, inter + (i + 1) * inter // tp),
    ])


def _stack(parts):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *parts)


def shard_serving_params(
    params: ServingParams, cfg: ModelConfig, mesh: Mesh, axis: str = "tp"
) -> ServingParams:
    """tp-sharded params: every weight gains a leading [tp] axis sharded over
    the mesh; small tensors (norms, reorder indices, embed) replicate."""
    tp = mesh.shape[axis]
    assert cfg.num_kv_heads % tp == 0 and cfg.num_heads % tp == 0

    shd = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put_w(stacked):
        return jax.tree.map(lambda x: jax.device_put(x, shd), stacked)

    layers = []
    for lp in params.layers:
        layers.append(ServingLayerParams(
            ln_attn=jax.device_put(lp.ln_attn, rep),
            ln_mlp=jax.device_put(lp.ln_mlp, rep),
            attn_reorder=jax.device_put(lp.attn_reorder, rep),
            o_reorder=jax.device_put(lp.o_reorder, rep),
            mlp_reorder=jax.device_put(lp.mlp_reorder, rep),
            wqkv=put_w(_stack([_shard_qkv(lp.wqkv, cfg, tp, i) for i in range(tp)])),
            wo=put_w(_stack([_shard_cols(lp.wo, tp, i) for i in range(tp)])),
            wgateup=put_w(_stack([_shard_gateup(lp.wgateup, tp, i) for i in range(tp)])),
            wdown=put_w(_stack([_shard_cols(lp.wdown, tp, i) for i in range(tp)])),
            ln_attn_g=(
                None if lp.ln_attn_g is None
                else jax.device_put(lp.ln_attn_g, rep)
            ),
            ln_mlp_g=(
                None if lp.ln_mlp_g is None
                else jax.device_put(lp.ln_mlp_g, rep)
            ),
        ))
    return ServingParams(
        embed=jax.device_put(params.embed, rep),
        final_norm=jax.device_put(params.final_norm, rep),
        lm_head=jax.device_put(
            jnp.stack(jnp.split(params.lm_head, tp, axis=1)), shd
        ),
        layers=layers,
    )


def make_state_sharded(
    n_layers: int, n_pages: int, batch: int, kv_heads: int, page_size: int,
    head_dim: int, mesh: Mesh, axis: str = "tp",
) -> ServingState:
    """Serving state with KV pages and the hot ring sharded by kv head."""
    from atom_tpu.serving.model import make_serving_state

    state = make_serving_state(
        n_layers, n_pages, batch, kv_heads, page_size, head_dim
    )
    pg_shd = NamedSharding(mesh, P(None, axis))        # [P, H, ...]
    prm_shd = NamedSharding(mesh, P(None, None, axis))  # [P, 4, H, S]
    hotc_shd = NamedSharding(mesh, P(None, axis))      # codes [B, H, ...]
    hotp_shd = NamedSharding(mesh, P(None, None, axis))  # prm [B, 4, H, W]
    rep = NamedSharding(mesh, P())

    def place_hot(h):
        from atom_tpu.ops.kv_hot import HotKV

        return HotKV(
            k_codes=jax.device_put(h.k_codes, hotc_shd),
            prm=jax.device_put(h.prm, hotp_shd),
            v_codes=jax.device_put(h.v_codes, hotc_shd),
        )

    def place_pages(pg):
        return pg._replace(
            k_pages=jax.device_put(pg.k_pages, pg_shd),
            v_pages=jax.device_put(pg.v_pages, pg_shd),
            params=jax.device_put(pg.params, prm_shd),
        )

    return ServingState(
        pages=[place_pages(pg) for pg in state.pages],
        hot=[place_hot(h) for h in state.hot],
        row=jax.device_put(state.row, rep),
        flushed=jax.device_put(state.flushed, rep),
    )


def make_tp_step_fns(
    params_sharded: ServingParams,
    cfg: ModelConfig,
    spec: QuantSpec,
    mesh: Mesh,
    axis: str = "tp",
):
    """(prefill_fn, decode_fn) with the engine's calling convention, running
    the single-chip layer code per shard inside ``shard_map`` with
    all-gathers at the column cuts (``model._post_attn``'s ``gather`` hook).
    """
    tp = mesh.shape[axis]
    shard_cfg = cfg.replace(
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
    )

    def gather(x):
        return jax.lax.all_gather(x, axis, axis=x.ndim - 1, tiled=True)

    def unstack(p: ServingParams) -> ServingParams:
        layers = [
            lp._replace(
                wqkv=jax.tree.map(lambda x: x[0], lp.wqkv),
                wo=jax.tree.map(lambda x: x[0], lp.wo),
                wgateup=jax.tree.map(lambda x: x[0], lp.wgateup),
                wdown=jax.tree.map(lambda x: x[0], lp.wdown),
            )
            for lp in p.layers
        ]
        return ServingParams(p.embed, p.final_norm, p.lm_head[0], layers)

    def shard_argmax(logits_local):
        """argmax over the vocab with column-sharded logits [..., V/tp]."""
        vshard = logits_local.shape[-1]
        my = jax.lax.axis_index(axis)
        local_max = jnp.max(logits_local, axis=-1)
        local_arg = jnp.argmax(logits_local, axis=-1) + my * vshard
        all_max = jax.lax.all_gather(local_max, axis)  # [tp, ...]
        all_arg = jax.lax.all_gather(local_arg, axis)
        winner = jnp.argmax(all_max, axis=0)
        return jnp.take_along_axis(all_arg, winner[None], axis=0)[0].astype(
            jnp.int32
        )

    w_spec = jax.tree.map(lambda _: P(axis), params_sharded)
    w_spec = w_spec._replace(
        embed=P(), final_norm=P(),
        layers=[
            lp._replace(
                ln_attn=P(), ln_mlp=P(),
                attn_reorder=P(), o_reorder=P(), mlp_reorder=P(),
                ln_attn_g=None if lp.ln_attn_g is None else P(),
                ln_mlp_g=None if lp.ln_mlp_g is None else P(),
            )
            for lp in w_spec.layers
        ],
    )
    from atom_tpu.ops.kv_hot import HotKV

    state_spec = ServingState(
        pages=[
            KVPages(
                k_pages=P(None, axis),
                v_pages=P(None, axis),
                params=P(None, None, axis),
            )
            for _ in range(cfg.num_layers)
        ],
        hot=[
            HotKV(P(None, axis), P(None, None, axis), P(None, axis))
            for _ in range(cfg.num_layers)
        ],
        row=P(),
        flushed=P(),
    )

    def _decode_tp(p, state, ids, page_table, seq_lens, flush):
        local = unstack(p)
        hidden, new_state = decode_hidden(
            local, state, ids, page_table, seq_lens,
            shard_cfg, spec, gather=gather, flush=flush,
        )
        logits_local = jnp.dot(
            hidden.astype(jnp.bfloat16), local.lm_head,
            preferred_element_type=jnp.float32,
        )  # [B, V/tp]
        return shard_argmax(logits_local), new_state

    def _make_decode_tp(flush: bool):
        return functools.partial(
            shard_map, mesh=mesh,
            in_specs=(w_spec, state_spec, P(), P(), P()),
            out_specs=(P(), state_spec),
            check_vma=False,
        )(functools.partial(_decode_tp, flush=flush))

    decode_tp_flush = _make_decode_tp(True)
    decode_tp_noflush = _make_decode_tp(False)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(w_spec, state_spec, P(), P(), P(), P()),
        out_specs=(P(), state_spec),
        check_vma=False,
    )
    def prefill_tp(p, state, ids, table_row, true_len, slot):
        local = unstack(p)
        x, new_pages = prefill_hidden(
            local, state.pages, ids, table_row, shard_cfg, spec, gather=gather
        )
        last = x[jnp.maximum(true_len - 1, 0)]
        logits_local = jnp.dot(
            last[None].astype(jnp.bfloat16), local.lm_head,
            preferred_element_type=jnp.float32,
        )
        new_state = ServingState(
            pages=new_pages,
            hot=state.hot,
            row=state.row,
            flushed=state.flushed.at[slot].set(true_len),
        )
        return shard_argmax(logits_local)[0], new_state

    @functools.partial(jax.jit, donate_argnums=(0,))
    def decode_jit_flush(state, ids, page_table, seq_lens):
        return decode_tp_flush(params_sharded, state, ids, page_table, seq_lens)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def decode_jit_noflush(state, ids, page_table, seq_lens):
        return decode_tp_noflush(
            params_sharded, state, ids, page_table, seq_lens
        )

    # Same host-side flush cadence as the single-chip ``make_step_fns``: the
    # ring wraps every HOT_W decode steps, so the W-th call MUST run the
    # flush variant or the ring silently overwrites unflushed KV.
    from atom_tpu.ops.kv_hot import HOT_W

    counter = {"n": 0}

    def decode_fn(state, ids, page_table, seq_lens):
        counter["n"] += 1
        if counter["n"] % HOT_W == 0:
            return decode_jit_flush(state, ids, page_table, seq_lens)
        return decode_jit_noflush(state, ids, page_table, seq_lens)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def prefill_fn(state, ids, table_row, true_len, slot):
        return prefill_tp(params_sharded, state, ids, table_row, true_len, slot)

    return prefill_fn, decode_fn
