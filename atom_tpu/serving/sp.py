"""Sequence-parallel prefill: the long-context capability (new vs reference).

The reference has no context-parallelism story at all (SURVEY.md §5 — max
context 2048; its only long-sequence mechanism is the paged KV cache).  Here
long prompts prefill across an ``sp`` mesh axis:

  * The TOKEN axis shards: every GEMM and quantize epilogue is row-parallel
    in tokens — zero communication, each chip runs the identical single-chip
    layer code on its T/sp rows (RoPE/mask use global positions).
  * Attention needs every query row to see all earlier keys: the
    just-quantized K/V stream is all-gathered over sp.  Gathering the
    QUANTIZED codes is the Atom-specific win — ICI traffic is 4-bit + per
    token-head params, ~4x less than gathering bf16 KV (the usual ring/
    all-gather attention cost).
  * KV page writes run on gathered codes on every shard, so the paged cache
    stays replicated (P()) and decode proceeds exactly as single-chip.

Composes with engine DP at the request level; TP composition (2-D mesh) is a
round-2 item.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

import atom_tpu.ops.reference as R
from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import ModelConfig
from atom_tpu.models.nn import repeat_kv, rmsnorm, rope_tables
from atom_tpu.ops.kv_layout import append_kv_prefill_kernel
from atom_tpu.serving.model import (
    ServingState,
    _attn_block_common,
    _embed_lookup,
    _lm_head_logits,
    _post_attn,
)


def _gather_kv(kq, axis):
    """All-gather a KVQuant token-shard along the token axis (codes are u4 in
    int8 carriers: 1 byte per 2 elements on the wire)."""
    return R.KVQuant(
        codes=jax.lax.all_gather(kq.codes, axis, axis=0, tiled=True),
        params=jax.lax.all_gather(kq.params, axis, axis=0, tiled=True),
    )


def sp_prefill_hidden(
    params, pages, ids_local, table_row, cfg: ModelConfig, spec: QuantSpec,
    axis: str = "sp",
):
    """Per-shard body (runs inside shard_map): local token rows, full KV.

    Numerics match ``model.prefill_hidden`` row-for-row (same op order per
    token row; only the GEMM M-tiling differs).
    """
    t_loc = ids_local.shape[0]
    sp = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)
    pos0 = my * t_loc
    dh = cfg.head_dim
    groups = cfg.kv_groups

    x = _embed_lookup(params.embed, ids_local)  # [T/sp, D]
    positions = pos0 + jnp.arange(t_loc)
    cos, sin = rope_tables(positions, dh, cfg.rope_theta)
    t_full = sp * t_loc
    import atom_tpu.serving.model as _SM
    from atom_tpu.serving.model import causal_code_attention
    key_block = _SM.PREFILL_KEY_BLOCK if t_full > _SM.PREFILL_SCAN_THRESHOLD else 0
    use_kernel = t_full > _SM.PREFILL_KERNEL_THRESHOLD and cfg.head_dim == 128

    new_pages = []
    for l, lp in enumerate(params.layers):
        q, kq, vq = _attn_block_common(x, lp, cfg, spec, (cos, sin))
        kq_f = _gather_kv(kq, axis)  # [T, Hkv, ...]
        vq_f = _gather_kv(vq, axis)
        # replicated page write (identical on every shard)
        new_pages.append(
            append_kv_prefill_kernel(pages[l], kq_f, vq_f, table_row)
        )
        # local query rows vs the full gathered keys; flash-style scanned
        # past PREFILL_SCAN_THRESHOLD total tokens (no [H, T/sp, T] blowup)
        attn = causal_code_attention(
            q, kq_f, vq_f, groups, dh ** -0.5, row_pos=positions,
            key_block=key_block, kernel=use_kernel,
        )
        x = _post_attn(x, attn, lp, spec)

    return rmsnorm(x, params.final_norm, cfg.norm_eps), new_pages


def make_sp_prefill_fn(
    params, cfg: ModelConfig, spec: QuantSpec, mesh: Mesh, axis: str = "sp"
):
    """Engine-convention prefill over a sequence-parallel mesh.

    ``prefill_fn(state, ids [T], table_row, true_len, slot)`` — ``T`` must be
    divisible by the sp axis size; buckets should be sized accordingly.
    Decode continues on any (single-chip or TP) step function: the page state
    it leaves behind is identical to single-chip prefill's.
    """
    def body(p, pages, flushed, ids, table_row, true_len, slot):
        t_loc = ids.shape[0]  # already the local shard
        x, new_pages = sp_prefill_hidden(
            p, pages, ids, table_row, cfg, spec, axis=axis
        )
        # the last valid row lives on one shard; fetch + sum-select
        my = jax.lax.axis_index(axis)
        idx = jnp.maximum(true_len - 1, 0)
        local_idx = jnp.clip(idx - my * t_loc, 0, t_loc - 1)
        has = (idx >= my * t_loc) & (idx < (my + 1) * t_loc)
        last = jnp.where(has, x[local_idx], jnp.zeros_like(x[0]))
        last = jax.lax.psum(last, axis)
        logits = _lm_head_logits(last[None], p.lm_head, cfg.vocab_size)[0]
        tok = jnp.argmax(logits).astype(jnp.int32)
        return tok, new_pages, flushed.at[slot].set(true_len)

    def run(state: ServingState, ids, table_row, true_len, slot):
        n_layers = len(state.pages)
        pg_spec = [
            jax.tree.map(lambda _: P(), state.pages[l]) for l in range(n_layers)
        ]
        sm = shard_map(
            body, mesh=mesh,
            in_specs=(
                jax.tree.map(lambda _: P(), params),
                pg_spec, P(), P(axis), P(), P(), P(),
            ),
            out_specs=(P(), pg_spec, P()),
            check_vma=False,
        )
        tok, new_pages, flushed = sm(
            params, state.pages, state.flushed, ids, table_row, true_len, slot
        )
        return tok, ServingState(
            pages=new_pages, hot=state.hot, row=state.row, flushed=flushed
        )

    return jax.jit(run, donate_argnums=(0,))


def make_sp_tp_prefill_fn(
    params_sharded,
    cfg: ModelConfig,
    spec: QuantSpec,
    mesh: Mesh,
    sp_axis: str = "sp",
    tp_axis: str = "tp",
):
    """2-D long-context prefill: tokens shard over ``sp``, heads/columns over
    ``tp`` (the 70B-at-long-context shape: tp for memory, sp for prompt
    latency).

    ``params_sharded`` comes from ``parallel.shard_serving_params`` over the
    2-D mesh's tp axis (each weight carries a leading [tp] shard axis,
    replicated over sp).  KV pages shard by head over tp and stay replicated
    over sp; decode can continue on ``parallel.make_tp_step_fns`` over the
    same tp axis.
    """
    tp = mesh.shape[tp_axis]
    shard_cfg = cfg.replace(
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
    )

    def body(p, pages, flushed, ids, table_row, true_len, slot):
        # local = this chip's tp shard of every weight
        layers = [
            lp._replace(
                wqkv=jax.tree.map(lambda x: x[0], lp.wqkv),
                wo=jax.tree.map(lambda x: x[0], lp.wo),
                wgateup=jax.tree.map(lambda x: x[0], lp.wgateup),
                wdown=jax.tree.map(lambda x: x[0], lp.wdown),
            )
            for lp in p.layers
        ]
        local = p._replace(lm_head=p.lm_head[0], layers=layers)

        def gather_tp(x):
            return jax.lax.all_gather(x, tp_axis, axis=x.ndim - 1, tiled=True)

        t_loc = ids.shape[0]
        sp = jax.lax.axis_size(sp_axis)
        my_sp = jax.lax.axis_index(sp_axis)
        pos0 = my_sp * t_loc
        dh = cfg.head_dim
        groups = cfg.kv_groups

        x = _embed_lookup(local.embed, ids)
        positions = pos0 + jnp.arange(t_loc)
        cos, sin = rope_tables(positions, dh, cfg.rope_theta)
        t_full = sp * t_loc
        import atom_tpu.serving.model as _SM
        from atom_tpu.serving.model import causal_code_attention
        key_block = (
            _SM.PREFILL_KEY_BLOCK if t_full > _SM.PREFILL_SCAN_THRESHOLD else 0
        )
        use_kernel = (
            t_full > _SM.PREFILL_KERNEL_THRESHOLD and cfg.head_dim == 128
        )

        new_pages = []
        for l, lp in enumerate(local.layers):
            # local tp heads, local sp tokens
            q, kq, vq = _attn_block_common(x, lp, shard_cfg, spec, (cos, sin))
            kq_f = _gather_kv(kq, sp_axis)  # full tokens, LOCAL heads
            vq_f = _gather_kv(vq, sp_axis)
            new_pages.append(
                append_kv_prefill_kernel(pages[l], kq_f, vq_f, table_row)
            )
            attn = causal_code_attention(
                q, kq_f, vq_f, groups, dh ** -0.5, row_pos=positions,
                key_block=key_block, kernel=use_kernel,
            )
            x = _post_attn(x, attn, lp, spec, gather=gather_tp)
        x = rmsnorm(x, local.final_norm, cfg.norm_eps)

        # last valid row: select over sp, then tp-sharded vocab argmax
        my = jax.lax.axis_index(sp_axis)
        idx = jnp.maximum(true_len - 1, 0)
        local_idx = jnp.clip(idx - my * t_loc, 0, t_loc - 1)
        has = (idx >= my * t_loc) & (idx < (my + 1) * t_loc)
        last = jnp.where(has, x[local_idx], jnp.zeros_like(x[0]))
        last = jax.lax.psum(last, sp_axis)
        logits_local = _lm_head_logits(last[None], local.lm_head)[0]
        vshard = logits_local.shape[-1]
        my_tp = jax.lax.axis_index(tp_axis)
        local_max = jnp.max(logits_local)
        local_arg = jnp.argmax(logits_local) + my_tp * vshard
        all_max = jax.lax.all_gather(local_max, tp_axis)
        all_arg = jax.lax.all_gather(local_arg, tp_axis)
        tok = all_arg[jnp.argmax(all_max)].astype(jnp.int32)
        return tok, new_pages, flushed.at[slot].set(true_len)

    w_spec = jax.tree.map(lambda _: P(tp_axis), params_sharded)
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

    def run(state: ServingState, ids, table_row, true_len, slot):
        from atom_tpu.ops.kv_layout import KVPages

        pg_spec = [
            KVPages(
                k_pages=P(None, tp_axis),
                v_pages=P(None, tp_axis),
                params=P(None, None, tp_axis),  # [P, 4, H, S]: shard heads
            )
            for _ in state.pages
        ]
        sm = shard_map(
            body, mesh=mesh,
            in_specs=(w_spec, pg_spec, P(), P(sp_axis), P(), P(), P()),
            out_specs=(P(), pg_spec, P()),
            check_vma=False,
        )
        tok, new_pages, flushed = sm(
            params_sharded, state.pages, state.flushed, ids, table_row,
            true_len, slot,
        )
        return tok, ServingState(
            pages=new_pages, hot=state.hot, row=state.row, flushed=flushed
        )

    return jax.jit(run, donate_argnums=(0,))
