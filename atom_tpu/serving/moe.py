"""Real-kernel W4A4 Mixtral serving: packed expert GEMMs + expert parallelism.

North-star capability (the reference only serves Llama; its Mixtral exists in
the fake-quant accuracy path, ``model/qMixtralLayer.py:237-348``).  The layer
semantics mirror that file:

  * attention identical to the Llama serving layer (shared code);
  * post-attention norm output is REORDERED but fed unquantized to the float
    router (``qMixtralLayer.py:289,303-311``; router weight rows carry the
    expert-0 reorder, ``modelutils_mixtral.py:63-85``);
  * per expert: silu(w1(x)) * w3(x) -> act quant -> w2 (``:254-258``), all
    experts sharing the expert-0 reorder indices so ONE reorder+quant serves
    the whole MoE block.

TPU-first MoE serving: DENSE routing — every expert runs its packed W4A4
GEMMs over the whole token batch and the renormalized top-2 weights enter as
a [T, E] matrix (zeros unrouted).  At decode batch sizes every expert is hit
with high probability anyway, so expert WEIGHT traffic (the bottleneck) is
identical to gather-based routing while shapes stay static and the expert
axis shards cleanly: under expert parallelism each shard computes its local
experts' partial sum and one psum combines them (attention runs head-sharded
over the same axis — config-5's "EP over the tp axis").
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import ModelConfig
from atom_tpu.models.nn import rmsnorm, rope_tables
from atom_tpu.ops import reference as R
from atom_tpu.ops.formats import (
    KernelPackedWeight,
    quantize_activation_packed,
)
from atom_tpu.ops.kv_hot import (
    HOT_W,
    hot_flush_blocks,
)
from atom_tpu.ops.kv_layout import append_kv_prefill_kernel
from atom_tpu.ops.pallas_decode import (
    flush_hot_pallas,
    paged_ring_decode_attention,
)
from atom_tpu.ops.pallas_gemm_packed import quant_gemm_packed
from atom_tpu.serving.model import (
    ServingState,
    _attn_block_common,
    _attn_block_decode_ring,
    _embed_lookup,
    _lm_head_logits,
    causal_code_attention,
    make_serving_state,
    _rand_packed,
)


class MoEServingLayerParams(NamedTuple):
    """Expert weights are STACKED with a leading [E] axis (shardable)."""

    ln_attn: jnp.ndarray
    ln_mlp: jnp.ndarray
    attn_reorder: jnp.ndarray
    o_reorder: jnp.ndarray
    mlp_reorder: jnp.ndarray   # expert-0 input order, shared by all experts
    wqkv: KernelPackedWeight
    wo: KernelPackedWeight
    router: jnp.ndarray        # bf16 [D, E] (rows in mlp_reorder order)
    wgateup: KernelPackedWeight  # leaves lead with [E]
    wdown: KernelPackedWeight    # leaves lead with [E]


class MoEServingParams(NamedTuple):
    embed: jnp.ndarray
    final_norm: jnp.ndarray
    lm_head: jnp.ndarray
    layers: List[MoEServingLayerParams]


def _stack_experts(parts: List[KernelPackedWeight]) -> KernelPackedWeight:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *parts)


@functools.partial(jax.jit, static_argnames=("cfg", "spec"))
def init_moe_serving_params(key, cfg: ModelConfig, spec: QuantSpec):
    d = cfg.hidden_size
    n_q = cfg.num_heads * cfg.head_dim
    n_kv = cfg.num_kv_heads * cfg.head_dim
    inter = cfg.intermediate_size
    e = cfg.num_experts
    keys = jax.random.split(key, 3 + (4 + 2 * e) * cfg.num_layers)
    embed = jax.random.normal(keys[0], (cfg.vocab_size, d), jnp.bfloat16) * 0.02
    lm_head = jax.random.normal(keys[1], (d, cfg.vocab_size), jnp.bfloat16) * 0.02
    layers = []
    k_i = 3
    for _ in range(cfg.num_layers):
        wqkv = _rand_packed(keys[k_i], d, n_q + 2 * n_kv, spec)
        wo = _rand_packed(keys[k_i + 1], n_q, d, spec)
        router = (
            jax.random.normal(keys[k_i + 2], (d, e), jnp.float32) * 0.02
        ).astype(jnp.bfloat16)
        gus = [
            _rand_packed(keys[k_i + 3 + j], d, 2 * inter, spec)
            for j in range(e)
        ]
        downs = [
            _rand_packed(keys[k_i + 3 + e + j], inter, d, spec)
            for j in range(e)
        ]
        layers.append(MoEServingLayerParams(
            ln_attn=jnp.ones((d,), jnp.bfloat16),
            ln_mlp=jnp.ones((d,), jnp.bfloat16),
            attn_reorder=jnp.arange(d, dtype=jnp.int32),
            o_reorder=jnp.arange(n_q, dtype=jnp.int32),
            mlp_reorder=jnp.arange(d, dtype=jnp.int32),
            wqkv=wqkv,
            wo=wo,
            router=router,
            wgateup=_stack_experts(gus),
            wdown=_stack_experts(downs),
        ))
        k_i += 3 + 2 * e
    return MoEServingParams(
        embed=embed, final_norm=jnp.ones((d,), jnp.bfloat16),
        lm_head=lm_head, layers=layers,
    )


def _route_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Dense [T, E] renormalized top-k routing weights (float router,
    ``qMixtralLayer.py:303-311`` semantics)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, k)
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    one_hot = jax.nn.one_hot(top_idx, probs.shape[-1], dtype=probs.dtype)
    return jnp.sum(one_hot * top_vals[..., None], axis=-2)


def _moe_mlp(
    x, attn_out, lp: MoEServingLayerParams, cfg: ModelConfig,
    spec: QuantSpec, gather=None, expert_slice=None, psum=None,
):
    """o_proj + router + dense-routed expert MLP -> new residual stream.

    ``expert_slice``: (e0, n_local) — under expert parallelism each shard
    runs its local experts only and ``psum`` combines the partial sums
    (routing weights are computed from the replicated hidden, so the
    combined result is bitwise the single-chip dense-routing sum).
    """
    g = gather or (lambda v: v)
    if gather is None and _fused_expert_ok(attn_out.shape, lp, spec):
        from atom_tpu.ops.pallas_gemm_packed import packed_w4_gemm_fused_in

        ao = jnp.take(attn_out, lp.o_reorder, axis=-1)
        x = packed_w4_gemm_fused_in(
            ao, lp.wo, resid=x, abits=spec.abits, a_clip=spec.a_clip_ratio,
        )
    else:
        a_in = R.reorder_quant(g(attn_out), lp.o_reorder, spec)
        x = x + g(quant_gemm_packed(a_in, lp.wo))

    h = rmsnorm(x, lp.ln_mlp, cfg.norm_eps)
    h_r = jnp.take(h, lp.mlp_reorder, axis=-1)
    weights = _route_top_k(
        jnp.dot(
            h_r.astype(jnp.bfloat16), lp.router,
            preferred_element_type=jnp.float32,
        ),
        cfg.num_experts_per_tok,
    )  # [T, E] f32
    e0, n_local = expert_slice if expert_slice is not None else (0, cfg.num_experts)

    if _fused_expert_ok(h_r.shape, lp, spec):
        # One fused kernel per expert: in-kernel input quant (bitwise ==
        # ``quantize_activation_packed``) -> gate/up dots -> SiLU*mul ->
        # requant -> down dots -> ``acc + w_e * out_e`` — replaces the two
        # GEMMs and two dynamic-quant XLA chains per expert.  The norm stays
        # outside (the float router needs h_r).
        from atom_tpu.ops.pallas_mlp import fused_mlp_packed

        acc = jnp.zeros(x.shape, jnp.float32)
        for j in range(n_local):
            wg = jax.tree.map(lambda a: a[e0 + j], lp.wgateup)
            wd = jax.tree.map(lambda a: a[e0 + j], lp.wdown)
            acc = fused_mlp_packed(
                h_r, acc, wg, wd, row_scale=weights[:, e0 + j],
                abits=spec.abits, a_clip=spec.a_clip_ratio,
            )
        if psum is not None:
            acc = psum(acc)
        return x + acc.astype(x.dtype)

    a_q = quantize_activation_packed(h_r.astype(jnp.float32), spec)
    acc = jnp.zeros(x.shape, jnp.float32)
    for j in range(n_local):
        wg = jax.tree.map(lambda a: a[e0 + j], lp.wgateup)
        wd = jax.tree.map(lambda a: a[e0 + j], lp.wdown)
        gu = quant_gemm_packed(a_q, wg, out_dtype=jnp.float32)
        inter = gu.shape[1] // 2
        act = jax.nn.silu(gu[:, :inter]) * gu[:, inter:]
        d_in = quantize_activation_packed(act, spec)
        out_e = quant_gemm_packed(d_in, wd, out_dtype=jnp.float32)
        acc = acc + weights[:, e0 + j : e0 + j + 1] * out_e
    if psum is not None:
        acc = psum(acc)
    return x + acc.astype(x.dtype)


def _fused_expert_ok(h_shape, lp: MoEServingLayerParams, spec) -> bool:
    """Gate for the fused per-expert MLP kernel (decode batches only).

    OPT-IN from round 5 (``ATOM_TPU_FUSED_MLP=1``) — same kernel and same
    step-level measurement as ``model._fused_mlp_enabled``, which see.
    """
    from atom_tpu.ops.pallas_mlp import fused_mlp_supported
    from atom_tpu.serving.model import _fused_mlp_enabled, _fused_spec_ok

    m, d = h_shape
    inter = lp.wgateup.body_packed.shape[-1] // 2
    return (
        _fused_mlp_enabled()
        and m <= 32
        and _fused_spec_ok(spec)
        and fused_mlp_supported(d, inter, spec.keeper, spec.act_group_size)
    )


def _moe_mlp_routed(
    x, attn_out, lp: MoEServingLayerParams, cfg: ModelConfig,
    spec: QuantSpec, capacity: int, gather=None, expert_slice=None, psum=None,
):
    """Routed (sort-by-expert gather) expert MLP for PREFILL token counts.

    Dense routing runs every expert over every token — right for decode
    batches (expert weight traffic dominates; ``_moe_mlp`` doc) but ~E/k x
    the routed FLOPs at prefill lengths.  This path:

      * computes each routed (token, expert) pair's rank within its expert
        (cumsum over the [T, E] routing mask — no sort needed);
      * scatter-builds a static [E, capacity] token-index table (overflow
        past ``capacity`` and the unrouted sentinel land in a dead slot);
      * gathers the ALREADY-QUANTIZED activation rows per expert, runs the
        expert's packed GEMMs at static [capacity, ...] shapes, and
        gathers-back each token's row, accumulating in the same
        expert-major f32 order as the dense path (bitwise-equal when no
        token overflows capacity).

    ``capacity`` >= ceil(T * k / E) * slack; tokens past an expert's
    capacity are dropped from that expert (GShard-style).  The default
    ``slack=2.0`` (see ``_moe_capacity``) means drops need a >2x-unbalanced
    router (slightly more after 128-alignment rounds capacity up).
    """
    g = gather or (lambda v: v)
    a_in = R.reorder_quant(g(attn_out), lp.o_reorder, spec)
    x = x + g(quant_gemm_packed(a_in, lp.wo))

    h = rmsnorm(x, lp.ln_mlp, cfg.norm_eps)
    h_r = jnp.take(h, lp.mlp_reorder, axis=-1)
    weights = _route_top_k(
        jnp.dot(
            h_r.astype(jnp.bfloat16), lp.router,
            preferred_element_type=jnp.float32,
        ),
        cfg.num_experts_per_tok,
    )  # [T, E] f32
    a_q = quantize_activation_packed(h_r.astype(jnp.float32), spec)

    t = x.shape[0]
    n_exp = cfg.num_experts
    routed = weights > 0.0                                    # [T, E]
    pos = jnp.cumsum(routed.astype(jnp.int32), axis=0) - 1    # rank in expert
    valid = routed & (pos < capacity)
    # scatter token ids into the [E, capacity] dispatch table (+1 dead slot)
    flat = jnp.where(
        valid,
        jnp.arange(n_exp)[None, :] * capacity + pos,
        n_exp * capacity,
    )  # [T, E]
    tok_tbl = (
        jnp.full((n_exp * capacity + 1,), t, jnp.int32)
        .at[flat.reshape(-1)]
        .set(jnp.repeat(jnp.arange(t, dtype=jnp.int32), n_exp))
    )[:-1].reshape(n_exp, capacity)
    # pad row t of the activation: zero codes (contributes nothing)
    a_pad = jax.tree.map(
        lambda v: jnp.concatenate([v, jnp.zeros_like(v[:1])], axis=0), a_q
    )

    e0, n_local = expert_slice if expert_slice is not None else (0, n_exp)
    acc = jnp.zeros(x.shape, jnp.float32)
    for j in range(n_local):
        e = e0 + j
        rows = tok_tbl[e]                                     # [C]
        a_e = jax.tree.map(lambda v: v[rows], a_pad)
        wg = jax.tree.map(lambda a: a[e], lp.wgateup)
        wd = jax.tree.map(lambda a: a[e], lp.wdown)
        gu = quant_gemm_packed(a_e, wg, out_dtype=jnp.float32)
        inter = gu.shape[1] // 2
        act = jax.nn.silu(gu[:, :inter]) * gu[:, inter:]
        d_in = quantize_activation_packed(act, spec)
        out_e = quant_gemm_packed(d_in, wd, out_dtype=jnp.float32)  # [C, D]
        back = jnp.where(
            valid[:, e : e + 1],
            jnp.take(out_e, jnp.clip(pos[:, e], 0, capacity - 1), axis=0),
            0.0,
        )
        acc = acc + weights[:, e : e + 1] * back
    if psum is not None:
        acc = psum(acc)
    return x + acc.astype(x.dtype)


# Dense expert execution wins below this prefill length (every expert is hit
# by ~all-token batches anyway and the dispatch/gather overhead is pure
# loss); above it the routed path runs ~E/k x fewer MLP FLOPs.
MOE_ROUTED_THRESHOLD = 512


def _moe_capacity(t: int, cfg: ModelConfig, slack: float = 2.0) -> int:
    """Per-expert token capacity: mean load x ``slack``, 128-aligned.

    At the uniform-ish routing of a balanced Mixtral router the load's std
    is ~sqrt(T k/E), so 2x mean is >> 4 sigma of headroom; a router
    unbalanced beyond 2x mean drops its overflow tokens (documented
    GShard-style semantics).
    """
    per_expert = t * cfg.num_experts_per_tok / cfg.num_experts
    return min(t, int(-(-per_expert * slack // 128)) * 128)


def decode_hidden_moe(
    params: MoEServingParams, state: ServingState, ids, page_table, seq_lens,
    cfg: ModelConfig, spec: QuantSpec, gather=None, expert_slice=None,
    psum=None, flush: bool = False,
):
    """MoE decode layer stack — attention identical to the Llama serving
    path (hot ring + paged kernel + merge), MLP replaced by ``_moe_mlp``."""
    b = ids.shape[0]
    dh = cfg.head_dim
    x = _embed_lookup(params.embed, ids)
    pos = jnp.maximum(seq_lens - 1, 0)
    cos, sin = rope_tables(pos, dh, cfg.rope_theta)

    w = state.hot[0].window
    s_page = state.pages[0].page_size
    row = state.row
    max_pg = page_table.shape[1]
    if flush:
        active = (seq_lens > 0) & (seq_lens > state.flushed)
        page_lo = (seq_lens - w) // s_page
        slot0 = page_lo * s_page
        o_lane = seq_lens - w - slot0

        def tbl(idx):
            return jnp.take_along_axis(
                page_table, jnp.clip(idx, 0, max_pg - 1)[:, None], axis=1
            )[:, 0]

        pg_a = jnp.where(active & (page_lo >= 0), tbl(page_lo), 0)
        pg_b = jnp.where(
            active & ((page_lo + 1) * s_page < seq_lens), tbl(page_lo + 1), 0
        )
        lo, hi = state.flushed, seq_lens
        flushed_new = jnp.where(active, seq_lens, state.flushed)
    else:
        flushed_new = state.flushed
    n_hot = seq_lens - flushed_new

    new_pages, new_hot = [], []
    for l, lp in enumerate(params.layers):
        # same attention machinery as the Llama decode path (round 3):
        # fused qkv GEMM storing K/V straight into the hot ring on the
        # production geometry, and ONE merged paged+ring attention kernel
        q, hot_l = _attn_block_decode_ring(
            x, lp, cfg, spec, (cos, sin), state.hot[l], row
        )
        new_hot.append(hot_l)
        if flush:
            pg = flush_hot_pallas(
                state.pages[l], *hot_flush_blocks(hot_l, row),
                pg_a, pg_b, slot0, o_lane, lo, hi,
            )
        else:
            pg = state.pages[l]
        new_pages.append(pg)
        attn = paged_ring_decode_attention(
            q, pg, page_table, flushed_new, hot_l, n_hot, row,
        ).reshape(b, cfg.num_heads * dh)
        x = _moe_mlp(x, attn, lp, cfg, spec, gather, expert_slice, psum)

    new_state = ServingState(
        pages=new_pages, hot=new_hot, row=(row + 1) % w, flushed=flushed_new
    )
    return rmsnorm(x, params.final_norm, cfg.norm_eps), new_state


@functools.partial(
    jax.jit, static_argnames=("cfg", "spec", "flush"), donate_argnames=("state",)
)
def decode_step_moe(
    params, state, ids, page_table, seq_lens, cfg: ModelConfig,
    spec: QuantSpec, flush: bool = False,
):
    x, new_state = decode_hidden_moe(
        params, state, ids, page_table, seq_lens, cfg, spec, flush=flush
    )
    logits = _lm_head_logits(x, params.lm_head, cfg.vocab_size)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_state


def prefill_hidden_moe(
    params, pages, ids, table_row, cfg: ModelConfig, spec: QuantSpec,
    gather=None, expert_slice=None, psum=None,
):
    t = ids.shape[0]
    dh = cfg.head_dim
    groups = cfg.kv_groups
    x = _embed_lookup(params.embed, ids)
    cos, sin = rope_tables(jnp.arange(t), dh, cfg.rope_theta)

    routed = t >= MOE_ROUTED_THRESHOLD
    cap = _moe_capacity(t, cfg) if routed else 0
    new_pages = []
    for l, lp in enumerate(params.layers):
        q, kq, vq = _attn_block_common(x, lp, cfg, spec, (cos, sin))
        new_pages.append(append_kv_prefill_kernel(pages[l], kq, vq, table_row))
        attn = causal_code_attention(q, kq, vq, groups, dh ** -0.5)
        if routed:
            x = _moe_mlp_routed(
                x, attn, lp, cfg, spec, cap, gather, expert_slice, psum
            )
        else:
            x = _moe_mlp(x, attn, lp, cfg, spec, gather, expert_slice, psum)
    return rmsnorm(x, params.final_norm, cfg.norm_eps), new_pages


@functools.partial(
    jax.jit, static_argnames=("cfg", "spec"), donate_argnames=("state",)
)
def prefill_step_moe(
    params, state, ids, table_row, true_len, slot, cfg: ModelConfig,
    spec: QuantSpec,
):
    x, new_pages = prefill_hidden_moe(
        params, state.pages, ids, table_row, cfg, spec
    )
    last = x[jnp.maximum(true_len - 1, 0)]
    logits = _lm_head_logits(last[None], params.lm_head, cfg.vocab_size)[0]
    new_state = ServingState(
        pages=new_pages, hot=state.hot, row=state.row,
        flushed=state.flushed.at[slot].set(true_len),
    )
    return jnp.argmax(logits).astype(jnp.int32), new_state


def make_moe_step_fns(params, cfg: ModelConfig, spec: QuantSpec):
    counter = {"n": 0}

    def prefill_fn(state, ids, table_row, true_len, slot):
        return prefill_step_moe(
            params, state, ids, table_row, true_len, slot, cfg, spec
        )

    def decode_fn(state, ids, page_table, seq_lens):
        counter["n"] += 1
        return decode_step_moe(
            params, state, ids, page_table, seq_lens, cfg, spec,
            flush=counter["n"] % HOT_W == 0,
        )

    return prefill_fn, decode_fn


# ---------------------------------------------------------------------------
# Expert parallelism (experts + attention heads sharded over one mesh axis)
# ---------------------------------------------------------------------------


def shard_moe_serving_params(
    params: MoEServingParams, cfg: ModelConfig, mesh: Mesh, axis: str = "ep"
) -> MoEServingParams:
    """Experts shard over ``axis`` (leading [E] leaf axis); attention
    projections shard by head/column exactly like the Llama TP scheme; small
    tensors replicate."""
    from atom_tpu.serving.parallel import _shard_cols, _shard_qkv, _stack

    ep = mesh.shape[axis]
    assert cfg.num_experts % ep == 0
    assert cfg.num_heads % ep == 0 and cfg.num_kv_heads % ep == 0
    shd = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put_w(stacked):
        return jax.tree.map(lambda x: jax.device_put(x, shd), stacked)

    layers = []
    for lp in params.layers:
        layers.append(lp._replace(
            ln_attn=jax.device_put(lp.ln_attn, rep),
            ln_mlp=jax.device_put(lp.ln_mlp, rep),
            attn_reorder=jax.device_put(lp.attn_reorder, rep),
            o_reorder=jax.device_put(lp.o_reorder, rep),
            mlp_reorder=jax.device_put(lp.mlp_reorder, rep),
            router=jax.device_put(lp.router, rep),
            wqkv=put_w(_stack([_shard_qkv(lp.wqkv, cfg, ep, i) for i in range(ep)])),
            wo=put_w(_stack([_shard_cols(lp.wo, ep, i) for i in range(ep)])),
            wgateup=jax.tree.map(lambda x: jax.device_put(x, shd), lp.wgateup),
            wdown=jax.tree.map(lambda x: jax.device_put(x, shd), lp.wdown),
        ))
    return MoEServingParams(
        embed=jax.device_put(params.embed, rep),
        final_norm=jax.device_put(params.final_norm, rep),
        lm_head=jax.device_put(
            jnp.stack(jnp.split(params.lm_head, ep, axis=1)), shd
        ),
        layers=layers,
    )


def make_moe_ep_step_fns(
    params_sharded: MoEServingParams, cfg: ModelConfig, spec: QuantSpec,
    mesh: Mesh, axis: str = "ep",
):
    """(prefill_fn, decode_fn): attention head-sharded + experts sharded over
    the SAME axis; outputs bitwise-equal to the single-chip MoE step.

    Routing weights are computed REPLICATED from the gathered hidden state;
    each shard multiplies its local experts by its global weight columns and
    one psum reconstructs the dense-routing sum exactly.
    """
    from atom_tpu.ops.kv_hot import HotKV
    from atom_tpu.ops.kv_layout import KVPages

    ep = mesh.shape[axis]
    e_local = cfg.num_experts // ep
    shard_cfg = cfg.replace(
        num_heads=cfg.num_heads // ep,
        num_kv_heads=cfg.num_kv_heads // ep,
    )

    def gather(v):
        return jax.lax.all_gather(v, axis, axis=v.ndim - 1, tiled=True)

    def unstack(p: MoEServingParams) -> MoEServingParams:
        layers = [
            lp._replace(
                wqkv=jax.tree.map(lambda x: x[0], lp.wqkv),
                wo=jax.tree.map(lambda x: x[0], lp.wo),
            )
            for lp in p.layers
        ]
        return MoEServingParams(p.embed, p.final_norm, p.lm_head[0], layers)

    def shard_argmax(logits_local):
        vshard = logits_local.shape[-1]
        my = jax.lax.axis_index(axis)
        local_max = jnp.max(logits_local, axis=-1)
        local_arg = jnp.argmax(logits_local, axis=-1) + my * vshard
        all_max = jax.lax.all_gather(local_max, axis)
        all_arg = jax.lax.all_gather(local_arg, axis)
        winner = jnp.argmax(all_max, axis=0)
        return jnp.take_along_axis(all_arg, winner[None], axis=0)[0].astype(
            jnp.int32
        )

    def local_moe(x, attn_out, lp, my):
        """_moe_mlp body with LOCAL expert leaves + global weight slice."""
        a_in = R.reorder_quant(gather(attn_out), lp.o_reorder, spec)
        x = x + gather(quant_gemm_packed(a_in, lp.wo))
        h = rmsnorm(x, lp.ln_mlp, cfg.norm_eps)
        h_r = jnp.take(h, lp.mlp_reorder, axis=-1)
        weights = _route_top_k(
            jnp.dot(
                h_r.astype(jnp.bfloat16), lp.router,
                preferred_element_type=jnp.float32,
            ),
            cfg.num_experts_per_tok,
        )  # [T, E_global]
        w_local = jax.lax.dynamic_slice(
            weights, (0, my * e_local), (weights.shape[0], e_local)
        )
        a_q = quantize_activation_packed(h_r.astype(jnp.float32), spec)
        acc = jnp.zeros(x.shape, jnp.float32)
        for j in range(e_local):
            wg = jax.tree.map(lambda a: a[j], lp.wgateup)
            wd = jax.tree.map(lambda a: a[j], lp.wdown)
            gu = quant_gemm_packed(a_q, wg, out_dtype=jnp.float32)
            inter = gu.shape[1] // 2
            act = jax.nn.silu(gu[:, :inter]) * gu[:, inter:]
            d_in = quantize_activation_packed(act, spec)
            out_e = quant_gemm_packed(d_in, wd, out_dtype=jnp.float32)
            acc = acc + w_local[:, j : j + 1] * out_e
        acc = jax.lax.psum(acc, axis)
        return x + acc.astype(x.dtype)

    def decode_body(p, state, ids, page_table, seq_lens, flush):
        local = unstack(p)
        my = jax.lax.axis_index(axis)
        b = ids.shape[0]
        dh = cfg.head_dim
        x = _embed_lookup(local.embed, ids)
        pos = jnp.maximum(seq_lens - 1, 0)
        cos, sin = rope_tables(pos, dh, cfg.rope_theta)
        w = state.hot[0].window
        s_page = state.pages[0].page_size
        row = state.row
        max_pg = page_table.shape[1]
        if flush:
            active = (seq_lens > 0) & (seq_lens > state.flushed)
            page_lo = (seq_lens - w) // s_page
            slot0 = page_lo * s_page
            o_lane = seq_lens - w - slot0

            def tbl(idx):
                return jnp.take_along_axis(
                    page_table, jnp.clip(idx, 0, max_pg - 1)[:, None], axis=1
                )[:, 0]

            pg_a = jnp.where(active & (page_lo >= 0), tbl(page_lo), 0)
            pg_b = jnp.where(
                active & ((page_lo + 1) * s_page < seq_lens), tbl(page_lo + 1), 0
            )
            lo, hi = state.flushed, seq_lens
            flushed_new = jnp.where(active, seq_lens, state.flushed)
        else:
            flushed_new = state.flushed
        n_hot = seq_lens - flushed_new

        new_pages, new_hot = [], []
        for l, lp in enumerate(local.layers):
            # mirror decode_hidden_moe EXACTLY (the EP test asserts bitwise
            # equality with the single-chip step): ring-fused qkv where the
            # per-shard geometry allows, merged paged+ring attention kernel
            q, hot_l = _attn_block_decode_ring(
                x, lp, shard_cfg, spec, (cos, sin), state.hot[l], row
            )
            new_hot.append(hot_l)
            if flush:
                pg = flush_hot_pallas(
                    state.pages[l], *hot_flush_blocks(hot_l, row),
                    pg_a, pg_b, slot0, o_lane, lo, hi,
                )
            else:
                pg = state.pages[l]
            new_pages.append(pg)
            attn = paged_ring_decode_attention(
                q, pg, page_table, flushed_new, hot_l, n_hot, row,
            ).reshape(b, shard_cfg.num_heads * dh)
            x = local_moe(x, attn, lp, my)

        hidden = rmsnorm(x, local.final_norm, cfg.norm_eps)
        logits_local = jnp.dot(
            hidden.astype(jnp.bfloat16), local.lm_head,
            preferred_element_type=jnp.float32,
        )
        new_state = ServingState(
            pages=new_pages, hot=new_hot, row=(row + 1) % w,
            flushed=flushed_new,
        )
        return shard_argmax(logits_local), new_state

    def prefill_body(p, state, ids, table_row, true_len, slot):
        local = unstack(p)
        my = jax.lax.axis_index(axis)
        t = ids.shape[0]
        dh = cfg.head_dim
        groups = cfg.kv_groups
        x = _embed_lookup(local.embed, ids)
        cos, sin = rope_tables(jnp.arange(t), dh, cfg.rope_theta)
        new_pages = []
        for l, lp in enumerate(local.layers):
            q, kq, vq = _attn_block_common(x, lp, shard_cfg, spec, (cos, sin))
            new_pages.append(
                append_kv_prefill_kernel(state.pages[l], kq, vq, table_row)
            )
            attn = causal_code_attention(q, kq, vq, groups, dh ** -0.5)
            x = local_moe(x, attn, lp, my)
        x = rmsnorm(x, local.final_norm, cfg.norm_eps)
        last = x[jnp.maximum(true_len - 1, 0)]
        logits_local = jnp.dot(
            last[None].astype(jnp.bfloat16), local.lm_head,
            preferred_element_type=jnp.float32,
        )
        new_state = ServingState(
            pages=new_pages, hot=state.hot, row=state.row,
            flushed=state.flushed.at[slot].set(true_len),
        )
        return shard_argmax(logits_local)[0], new_state

    w_spec = jax.tree.map(lambda _: P(axis), params_sharded)
    w_spec = w_spec._replace(
        embed=P(), final_norm=P(),
        layers=[
            lp._replace(
                ln_attn=P(), ln_mlp=P(), attn_reorder=P(), o_reorder=P(),
                mlp_reorder=P(), router=P(),
            )
            for lp in w_spec.layers
        ],
    )
    state_spec = ServingState(
        pages=[
            KVPages(
                k_pages=P(None, axis), v_pages=P(None, axis),
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

    def _mk_decode(flush):
        return functools.partial(
            shard_map, mesh=mesh,
            in_specs=(w_spec, state_spec, P(), P(), P()),
            out_specs=(P(), state_spec),
            check_vma=False,
        )(functools.partial(decode_body, flush=flush))

    decode_flush = _mk_decode(True)
    decode_noflush = _mk_decode(False)
    prefill_sm = functools.partial(
        shard_map, mesh=mesh,
        in_specs=(w_spec, state_spec, P(), P(), P(), P()),
        out_specs=(P(), state_spec),
        check_vma=False,
    )(prefill_body)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def decode_jit_flush(state, ids, page_table, seq_lens):
        return decode_flush(params_sharded, state, ids, page_table, seq_lens)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def decode_jit_noflush(state, ids, page_table, seq_lens):
        return decode_noflush(params_sharded, state, ids, page_table, seq_lens)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def prefill_fn(state, ids, table_row, true_len, slot):
        return prefill_sm(params_sharded, state, ids, table_row, true_len, slot)

    counter = {"n": 0}

    def decode_fn(state, ids, page_table, seq_lens):
        counter["n"] += 1
        if counter["n"] % HOT_W == 0:
            return decode_jit_flush(state, ids, page_table, seq_lens)
        return decode_jit_noflush(state, ids, page_table, seq_lens)

    return prefill_fn, decode_fn


@functools.partial(
    jax.jit, static_argnames=("cfg", "spec"), donate_argnames=("state",)
)
def decode_burst_moe(
    params: MoEServingParams,
    state: ServingState,
    ids: jnp.ndarray,         # int32 [B]
    page_table: jnp.ndarray,  # int32 [B, max_pages] — must pre-cover the burst
    seq_lens: jnp.ndarray,    # int32 [B] — current lengths (EXCLUDING ids)
    n_steps: jnp.ndarray,     # int32 scalar — number of W-step ring WINDOWS
    cfg: ModelConfig,
    spec: QuantSpec,
):
    """MoE analog of ``model.decode_burst``: ``n_steps`` whole ring windows
    per program, all flush bookkeeping in-graph — the dispatch-free way to
    measure MoE decode throughput over the tunneled link."""
    w = state.hot[0].window

    def nf_body(_, carry):
        ids_, state_, lens_ = carry
        new_lens = lens_ + 1
        ids_, state_ = decode_step_moe(
            params, state_, ids_, page_table, new_lens, cfg, spec, flush=False
        )
        return ids_, state_, new_lens

    def window(_, carry):
        ids_, state_, lens_ = jax.lax.fori_loop(0, w - 1, nf_body, carry)
        new_lens = lens_ + 1
        ids_, state_ = decode_step_moe(
            params, state_, ids_, page_table, new_lens, cfg, spec, flush=True
        )
        return ids_, state_, new_lens

    return jax.lax.fori_loop(0, n_steps, window, (ids, state, seq_lens))
