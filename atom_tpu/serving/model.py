"""Quantized serving Llama: the real-kernel W4A4 forward path.

TPU-native equivalent of the reference's serving model
(``e2e/punica-atom/punica/models/llama.py``), improved per SURVEY.md §4: the
reference's prefill attends over RANDOM K/V (an efficiency-only hack,
``llama.py:171-174``); here prefill attends over the actually-quantized K/V, so
engine outputs are real model outputs end-to-end.

Two jitted step functions with static (bucketed) shapes:

  * ``prefill_step`` — one fresh sequence [T]; quantizes + appends its KV
    pages, full causal attention over the dequantized K/V, returns the first
    generated token.
  * ``decode_step``  — one token for each of B sequences; appends quantized
    KV, Pallas paged INT4 decode attention, returns next tokens.  KV pages are
    DONATED so appends update in place.

Per layer the op sequence mirrors the reference exactly
(``models/llama.py:242-306, 85-87``):
    rmsnorm+reorder+quant -> q/o: i4 GEMM, k/v: i4 GEMM w/ fused o4 requant ->
    append paged KV -> decode attention (fused dequant+RoPE) ->
    reorder+quant -> o_proj -> rmsnorm+reorder+quant -> gate/up GEMM ->
    silu*mul+quant -> down GEMM.

The layer loop is UNROLLED (per-layer weight buffers, not stacked): every
Pallas operand is a whole HBM buffer, so no per-iteration slice
materialization sits between the weights and the kernels.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple

import jax
import jax.numpy as jnp

from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import ModelConfig
from atom_tpu.models.nn import causal_mask, rmsnorm, rope_tables, apply_rope, repeat_kv
from atom_tpu.ops import reference as R
from atom_tpu.ops.formats import (
    KernelPackedWeight,
    pack_for_kernel,
    quantize_weight_packed,
)
from atom_tpu.ops.kv_hot import (
    HOT_W,
    HotKV,
    hot_attention,
    hot_flush_blocks,
    make_hot,
    merge_attention,
    write_hot,
)
from atom_tpu.ops.kv_layout import (
    KVPages,
    append_kv_prefill_kernel,
    make_kv_pages_kernel,
    pack_channel_planes,
)
from atom_tpu.ops.pallas_decode import (
    flush_hot_pallas,
    paged_decode_attention_rotated,
    paged_ring_decode_attention,
)
from atom_tpu.ops.pallas_gemm_packed import quant_gemm_packed


class ServingLayerParams(NamedTuple):
    """q/k/v and gate/up are FUSED into single wide GEMMs: at decode batch
    sizes the packed-4-bit GEMM is pipeline-limited at small N, and one
    [D, 3D] / [D, 2*inter] launch runs at full HBM bandwidth where three
    [D, D] launches do not (the CUDA reference keeps them separate because
    its 128x128-tile kernel is already saturated per launch)."""

    ln_attn: jnp.ndarray       # bf16 [D]
    ln_mlp: jnp.ndarray        # bf16 [D]
    attn_reorder: jnp.ndarray  # int32 [D]  (q/k/v input order)
    o_reorder: jnp.ndarray     # int32 [D]  (attn-out order before o_proj)
    mlp_reorder: jnp.ndarray   # int32 [D]  (gate/up input order)
    wqkv: KernelPackedWeight   # [D, n_q + 2 * n_kv]
    wo: KernelPackedWeight     # [n_q, D]
    wgateup: KernelPackedWeight  # [D, 2 * inter]
    wdown: KernelPackedWeight  # [inter, D]
    # Pre-gathered norm weights (ln[reorder]) for the fused norm+quant GEMM
    # prologues — one fewer XLA gather per fused kernel per layer.  None
    # falls back to gathering at trace time.
    ln_attn_g: jnp.ndarray = None
    ln_mlp_g: jnp.ndarray = None


class ServingParams(NamedTuple):
    embed: jnp.ndarray      # bf16 [V, D]
    final_norm: jnp.ndarray  # bf16 [D]
    lm_head: jnp.ndarray    # bf16 [D, V]
    layers: List[ServingLayerParams]


def _rand_packed(key, in_f: int, out_f: int, spec: QuantSpec) -> KernelPackedWeight:
    w = jax.random.normal(key, (in_f, out_f), jnp.float32) * (in_f ** -0.5)
    return pack_for_kernel(quantize_weight_packed(w, spec))


@functools.partial(jax.jit, static_argnames=("cfg", "spec"))
def init_serving_params(
    key, cfg: ModelConfig, spec: QuantSpec
) -> ServingParams:
    """Random-weight serving model (the reference benches random weights too,
    ``bench_textgen.py:78-86``; real checkpoints come via
    ``pack_calibrated_params``).  One jitted program: a single dispatch on
    high-latency links."""
    d = cfg.hidden_size
    n_q = cfg.num_heads * cfg.head_dim
    n_kv = cfg.num_kv_heads * cfg.head_dim
    inter = cfg.intermediate_size
    keys = jax.random.split(key, 3 + 7 * cfg.num_layers)
    embed = jax.random.normal(keys[0], (cfg.vocab_size, d), jnp.bfloat16) * 0.02
    lm_head = jax.random.normal(keys[1], (d, cfg.vocab_size), jnp.bfloat16) * 0.02
    layers = []
    ident = jnp.arange(d, dtype=jnp.int32)
    for l in range(cfg.num_layers):
        k = keys[3 + 7 * l : 3 + 7 * (l + 1)]
        layers.append(
            ServingLayerParams(
                ln_attn=jnp.ones((d,), jnp.bfloat16),
                ln_mlp=jnp.ones((d,), jnp.bfloat16),
                attn_reorder=ident,
                # o_proj input is n_q wide (!= hidden under GQA/MQA)
                o_reorder=jnp.arange(n_q, dtype=jnp.int32),
                mlp_reorder=ident,
                wqkv=_rand_packed(k[0], d, n_q + 2 * n_kv, spec),
                wo=_rand_packed(k[3], n_q, d, spec),
                wgateup=_rand_packed(k[4], d, 2 * inter, spec),
                wdown=_rand_packed(k[6], inter, d, spec),
                ln_attn_g=jnp.ones((d,), jnp.bfloat16),
                ln_mlp_g=jnp.ones((d,), jnp.bfloat16),
            )
        )
    return ServingParams(
        embed=embed,
        final_norm=jnp.ones((d,), jnp.bfloat16),
        lm_head=lm_head,
        layers=layers,
    )


# ---------------------------------------------------------------------------
# Step functions
# ---------------------------------------------------------------------------


def _embed_lookup(embed: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding row fetch via the Pallas block-gather kernel.

    Both XLA idioms lose on TPU at decode batch sizes: the plain row gather
    lowers to a ~750us serial path, and a one-hot matmul reads the WHOLE
    table (262 MB for 32k x 4096 bf16, ~320us of HBM).  The kernel fetches
    only the 8-row groups holding the requested ids (~2 MB).
    """
    from atom_tpu.ops.pallas_misc import embed_gather

    if ids.ndim == 1 and embed.shape[0] % 8 == 0:
        return embed_gather(embed, ids).astype(jnp.bfloat16)
    return jnp.take(embed, ids, axis=0).astype(jnp.bfloat16)


def quantize_lm_head(params: "ServingParams", bits: int = 8) -> "ServingParams":
    """Weight-only-quantized lm_head for serving (default W8A16).

    The reference keeps the head fp16 (lm_head is NOT part of Atom's W4A4
    scheme); a bf16 head costs 262 MB of HBM per decode step at Llama-7B
    vocab (~320 us on v5e, ~1.8%% of the step).  Measured on iid-gaussian
    worst-case logits (tests/test_serving.py::test_w4a16_head_logits_delta):

      * INT8 per-column (bits=8, DEFAULT): 0.7%% logits noise, 97%% argmax
        agreement even on that worst case — real-model top-1 margins are far
        larger, so this is accuracy-neutral in practice; halves head traffic.
      * INT4 g128 (bits=4, opt-in): 11%% noise / 77%% worst-case agreement —
        too coarse to default.

    Both prefill and decode share the quantized head, so decode==prefill
    consistency is preserved.
    """
    from atom_tpu.ops.pallas_gemm_w4a16 import quantize_w4a16, quantize_w8a16

    quant = quantize_w8a16 if bits == 8 else quantize_w4a16
    w = params.lm_head.astype(jnp.float32)
    # Pre-pad to the weight-only gemm tile grid (N -> mult of 512, K -> mult
    # of 1024).  Otherwise the gemm pads the weight INSIDE the jitted decode
    # step — a [4096, 32256] int8 pad is a ~132 MB XLA temp per step.
    # Padded cols quantize to zero codes; _lm_head_logits slices logits back
    # to the true vocab.
    pk = (-w.shape[0]) % 1024
    pn = (-w.shape[1]) % 512
    if pk or pn:
        w = jnp.pad(w, ((0, pk), (0, pn)))
    return params._replace(lm_head=quant(w))


def _lm_head_logits(x: jnp.ndarray, lm_head, vocab: int | None = None) -> jnp.ndarray:
    """bf16 MXU head matmul (f32 accumulation inside the MXU).  Both prefill
    and decode use this, so near-tie argmax decisions are identical.
    A ``W8A16Weight`` / ``W4A16Weight`` head (see ``quantize_lm_head``) runs
    the corresponding weight-only kernel instead; ``vocab`` slices off the
    tile-grid pad columns a quantized head carries."""
    from atom_tpu.ops.pallas_gemm_w4a16 import (
        W4A16Weight,
        W8A16Weight,
        w4a16_gemm,
        w8a16_gemm,
    )

    if isinstance(lm_head, W8A16Weight):
        out = w8a16_gemm(x.astype(jnp.bfloat16), lm_head, out_dtype=jnp.float32)
    elif isinstance(lm_head, W4A16Weight):
        out = w4a16_gemm(x.astype(jnp.bfloat16), lm_head, out_dtype=jnp.float32)
    else:
        out = jnp.dot(
            x.astype(jnp.bfloat16), lm_head, preferred_element_type=jnp.float32
        )
    if vocab is not None and out.shape[-1] != vocab:
        out = out[..., :vocab]
    return out


def _attn_block_common(
    x, lp: ServingLayerParams, cfg: ModelConfig, spec: QuantSpec, rope
):
    """norm+reorder+quant -> fused qkv projection (shared by prefill/decode).

    One f32 GEMM output split into q (RoPE'd, bf16) and k/v.  K is rotated in
    f32 BEFORE its asymmetric u4 quantization — the cache stores POST-RoPE
    codes so the decode kernel never touches trigonometry (see
    ``pallas_decode`` v2 block comment; the reference rotates after dequant
    instead, decode.cuh:92-126, same bit budget).  ``rope``: (cos, sin)
    broadcastable over heads for this token batch.
    """
    n_q = cfg.num_heads * cfg.head_dim
    n_kv = cfg.num_kv_heads * cfg.head_dim
    dh = cfg.head_dim
    cos, sin = rope  # [T, Dh]
    h_in = R.rmsnorm_reorder_quant(x, lp.ln_attn, lp.attn_reorder, spec)
    t = x.shape[0]

    if n_q % 512 == 0 and n_kv % 512 == 0 and dh == 128:
        # Fused path: RoPE + per-head KV quantization inside the GEMM tiles
        # (removes ~15 small XLA ops per layer).
        from atom_tpu.ops.pallas_gemm_packed import (
            assemble_activation,
            packed_w4_gemm_qkv,
        )

        a, sa = assemble_activation(h_in)
        sw = jnp.concatenate(
            [lp.wqkv.body_scale, lp.wqkv.keeper_scale[None, :]], axis=0
        )
        q, kc, kp, vc, vp = packed_w4_gemm_qkv(
            a, lp.wqkv.body_packed, lp.wqkv.keeper, sa, sw,
            cos.astype(jnp.float32), sin.astype(jnp.float32),
            n_q=n_q, n_kv=n_kv, head_dim=dh,
        )
        return (
            q.reshape(t, cfg.num_heads, dh),
            R.KVQuant(kc, kp),
            R.KVQuant(vc, vp),
        )

    qkv = quant_gemm_packed(h_in, lp.wqkv, out_dtype=jnp.float32)
    qh = qkv[:, :n_q].reshape(t, cfg.num_heads, dh)
    q = apply_rope(qh, cos[:, None, :], sin[:, None, :]).astype(jnp.bfloat16)
    k = apply_rope(
        qkv[:, n_q : n_q + n_kv].reshape(t, cfg.num_kv_heads, dh),
        cos[:, None, :], sin[:, None, :],
    )
    kq = R.quantize_kv_asym(k)
    vq = R.quantize_kv_asym(
        qkv[:, n_q + n_kv :].reshape(t, cfg.num_kv_heads, dh)
    )
    return q, kq, vq


def _rms_rstd(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm reciprocal std, computed in XLA exactly as ``nn.rmsnorm``
    does — passed INTO the fused kernels so their norm prologues share the
    statistic bitwise with the unfused chain (the in-kernel variance
    reduction and rsqrt were the only hardware-divergent ops; their rare
    input-code flips amplified through downstream dynamic act scales).
    Shared with the fused kernels' in-kernel fallbacks via
    ``numerics.rms_rstd`` (ADVICE r4: the fallbacks previously skipped the
    bf16 input pin)."""
    from atom_tpu.numerics import rms_rstd

    return rms_rstd(x, eps)


def _post_attn(
    x, attn_out, lp: ServingLayerParams, spec: QuantSpec, gather=None
):
    """reorder+quant -> o_proj -> residual; then the MLP block.

    ``gather``: under tensor parallelism, the all-gather applied to every
    column-sharded GEMM output / local attention heads (identity when None).
    The quantize epilogues always see FULL feature dims, so group boundaries
    and the keeper block are identical to the single-chip model — TP outputs
    are bitwise-equal to single-chip outputs.
    """
    g = gather or (lambda v: v)

    if gather is None and _fused_oproj_ok(x.shape, lp, spec):
        # Fused kernels for the post-attention half-layer; the only XLA ops
        # left are the reorder gathers.  (a) o_proj: in-kernel dynamic quant
        # prologue + GEMM + residual add (hardware-probe-clean, default on);
        # (b) MLP: in-kernel RMSNorm (rms stats are permutation-invariant,
        # so norm-after-gather with the pre-gathered weight is exact) +
        # input quant -> gate/up dots -> SiLU*mul -> requant -> down dots ->
        # residual add — OPT-IN until its Mosaic divergence is fixed (see
        # ``_fused_mlp_ok``).  The [B, 2*inter] f32 intermediate and the
        # dynamic-quant XLA chains never touch HBM (``ops/pallas_mlp.py``).
        # TP keeps the unfused path: its gathers must see full feature dims
        # for bitwise parity.
        from atom_tpu.ops.pallas_gemm_packed import packed_w4_gemm_fused_in

        ao = jnp.take(attn_out, lp.o_reorder, axis=-1)
        x = packed_w4_gemm_fused_in(
            ao, lp.wo, resid=x, abits=spec.abits, a_clip=spec.a_clip_ratio,
        )
        if _fused_mlp_ok(x.shape, lp, spec):
            from atom_tpu.ops.pallas_mlp import fused_mlp_packed

            wg = (
                lp.ln_mlp_g
                if lp.ln_mlp_g is not None
                else jnp.take(lp.ln_mlp, lp.mlp_reorder)
            )
            y = jnp.take(x, lp.mlp_reorder, axis=-1)
            # norm STATISTIC in XLA (bitwise-shared with the unfused
            # chain); the normalize/scale/quantize stay in-kernel.  See
            # ``_quant_prologue``'s rstd note: the in-kernel variance
            # reduction + rsqrt were the ONLY divergent ops on hardware.
            return fused_mlp_packed(
                y, x, lp.wgateup, lp.wdown, norm_w=wg, rstd=_rms_rstd(x),
                abits=spec.abits, a_clip=spec.a_clip_ratio,
            )
    else:
        a_in = R.reorder_quant(g(attn_out), lp.o_reorder, spec)
        x = x + g(quant_gemm_packed(a_in, lp.wo))
    m_in = R.rmsnorm_reorder_quant(x, lp.ln_mlp, lp.mlp_reorder, spec)
    gu = quant_gemm_packed(m_in, lp.wgateup, out_dtype=jnp.float32)
    inter = gu.shape[1] // 2
    act = jax.nn.silu(gu[:, :inter]) * gu[:, inter:]  # f32, local slice
    from atom_tpu.ops.formats import quantize_activation_packed

    d_in = quantize_activation_packed(g(act), spec)
    return x + g(quant_gemm_packed(d_in, lp.wdown))


def _fused_spec_ok(spec: QuantSpec) -> bool:
    """The canonical-Atom activation scheme the in-kernel quant prologues
    implement: symmetric INT4 128-groups + INT8 128-keeper."""
    from atom_tpu.config import KeeperPrecision, QuantType

    return (
        spec.fused_serving
        and spec.a_sym
        and spec.quant_type == QuantType.INT
        and not spec.exponential
        and spec.abits == 4
        and spec.act_group_size == 128
        and spec.keeper == 128
        and spec.keeper_precision == KeeperPrecision.INT8
    )


def _fused_mlp_enabled() -> bool:
    """Round-5 default: the fused o_proj/MLP kernels are OPT-IN
    (``ATOM_TPU_FUSED_MLP=1``; ``ATOM_TPU_NO_FUSED_MLP=1`` still forces
    off).  Under the pinned-ctx bench protocol the fused configuration is
    a reproducible step-level LOSS at 7B/32L/bs32 — 19.22 ms/step vs
    18.90 ms unfused — even though the kernels win in isolation (fused MLP
    142.8 us vs 188.4 unfused) and in a 2-layer in-situ marginal
    measurement (421 vs 500 us/layer).  The composition deficit at 32L is
    unexplained (prime suspect: VMEM-pressure-limited cross-kernel DMA
    prefetch); parity is NOT the issue (bitwise on hardware at production
    width, hw_smoke parity_7b)."""
    import os

    if os.environ.get("ATOM_TPU_NO_FUSED_MLP"):
        return False
    return bool(os.environ.get("ATOM_TPU_FUSED_MLP"))


def _fused_oproj_ok(x_shape, lp: ServingLayerParams, spec: QuantSpec) -> bool:
    """Gate for the fused-in o_proj GEMM (in-kernel quant prologue +
    residual): decode batches, canonical Atom spec.

    Above 32 rows each extra 32-row m-tile re-streams the full weights from
    HBM, so prefill keeps the wide unfused GEMMs.  Hardware-probe-clean on
    the current toolchain (scripts/probe_fused_divergence.py [quant]/[norm]:
    0% beyond flip noise); opt-in per ``_fused_mlp_enabled``.
    """
    m, _ = x_shape
    n_q = 2 * lp.wo.body_packed.shape[0] + 128  # o_proj input width
    return (
        _fused_mlp_enabled()
        and m <= 32
        and _fused_spec_ok(spec)
        and (n_q - 128) // 128 <= 112
    )


def _fused_mlp_ok(x_shape, lp: ServingLayerParams, spec: QuantSpec) -> bool:
    """Gate for the fused-MLP kernel (the whole gate/up->SiLU->requant->down
    block as one phased-grid kernel).

    DEFAULT ON (round 4).  Round 3 demoted this kernel to opt-in on a
    hardware-parity failure; round-4 bisection (scripts/probe_mlp_bisect.py,
    scripts/probe_mlp_min.py) proved the kernel was never miscompiled — the
    round-3 probe compared against an oracle fed a DIFFERENT-precision input
    (f32 prenorm vs the kernel's bf16), and the in-kernel variance/rsqrt
    ulp fuzz amplified through the dynamic act-block scales.  With the norm
    statistic hoisted to XLA (``rstd``) and the residual-add rounding pinned
    (``_rp``), the kernel is bitwise-equal to the unfused chain on identical
    inputs at full 7B geometry on hardware.  OPT-IN from round 5
    (``ATOM_TPU_FUSED_MLP=1``) — see ``_fused_mlp_enabled`` for the
    step-level measurement that demoted it.
    """
    from atom_tpu.ops.pallas_mlp import fused_mlp_supported

    m, d = x_shape
    inter = lp.wgateup.body_packed.shape[1] // 2
    return (
        _fused_mlp_enabled()
        and m <= 32
        and _fused_spec_ok(spec)
        and fused_mlp_supported(d, inter, spec.keeper, spec.act_group_size)
    )


def _attn_block_decode_ring(
    x, lp: ServingLayerParams, cfg: ModelConfig, spec: QuantSpec, rope,
    hot: HotKV, row,
):
    """Decode-only attn input block: fused qkv GEMM storing K/V DIRECTLY
    into the hot ring (``packed_w4_gemm_qkv_ring``) — removes the per-layer
    ``write_hot`` DUS chain and q/k/v slicing glue (~10 XLA ops/layer).

    Returns (q [B, heads, dh], updated HotKV).  Falls back to
    ``_attn_block_common`` + ``write_hot`` off the fused-geometry path.
    """
    n_q = cfg.num_heads * cfg.head_dim
    n_kv = cfg.num_kv_heads * cfg.head_dim
    dh = cfg.head_dim
    b = x.shape[0]
    if not (n_q % 512 == 0 and n_kv % 512 == 0 and dh == 128 and b % 32 == 0):
        q, kq, vq = _attn_block_common(x, lp, cfg, spec, rope)
        return q, write_hot(hot, row, kq, vq)

    from atom_tpu.ops.pallas_gemm_packed import (
        assemble_activation,
        packed_w4_gemm_qkv_ring,
        packed_w4_gemm_qkv_ring_fused,
    )

    cos, sin = rope
    sw = jnp.concatenate(
        [lp.wqkv.body_scale, lp.wqkv.keeper_scale[None, :]], axis=0
    )
    import os

    if (
        _fused_spec_ok(spec)
        and not os.environ.get("ATOM_TPU_NO_FUSED_QKV")
        and x.shape[1] % 128 == 0
        and (x.shape[1] - 128) // 128 <= 112
    ):
        # Float-input variant: RMSNorm + dual-path dynamic quantization run
        # as the kernel's grid-step-0 prologue — the only XLA op left ahead
        # of the qkv GEMM is the reorder gather.
        y = jnp.take(x, lp.attn_reorder, axis=-1)
        wg = getattr(lp, "ln_attn_g", None)  # MoE layer params lack it
        if wg is None:
            wg = jnp.take(lp.ln_attn, lp.attn_reorder)
        q, kc, kp, vc = packed_w4_gemm_qkv_ring_fused(
            y, wg, lp.wqkv.body_packed, lp.wqkv.keeper, sw,
            cos.astype(jnp.float32), sin.astype(jnp.float32),
            hot.k_codes, hot.prm, hot.v_codes, row,
            n_q=n_q, n_kv=n_kv, head_dim=dh,
            abits=spec.abits, a_clip=spec.a_clip_ratio, rstd=_rms_rstd(x),
        )
        return (
            q.reshape(b, cfg.num_heads, dh),
            HotKV(k_codes=kc, prm=kp, v_codes=vc),
        )

    h_in = R.rmsnorm_reorder_quant(x, lp.ln_attn, lp.attn_reorder, spec)
    a, sa = assemble_activation(h_in)
    q, kc, kp, vc = packed_w4_gemm_qkv_ring(
        a, lp.wqkv.body_packed, lp.wqkv.keeper, sa, sw,
        cos.astype(jnp.float32), sin.astype(jnp.float32),
        hot.k_codes, hot.prm, hot.v_codes, row,
        n_q=n_q, n_kv=n_kv, head_dim=dh,
    )
    return (
        q.reshape(b, cfg.num_heads, dh),
        HotKV(k_codes=kc, prm=kp, v_codes=vc),
    )


class ServingState(NamedTuple):
    """Device-side decode state threaded through the step functions.

    ``row`` is the global hot-ring write row; ``flushed`` is each slot's
    page-resident token count (== its sequence length at last flush /
    prefill).  Both are shared by all layers.
    """

    pages: List[KVPages]
    hot: List[HotKV]
    row: jnp.ndarray      # int32 scalar in [0, W)
    flushed: jnp.ndarray  # int32 [B]


def make_serving_state(
    n_layers: int, n_pages: int, batch: int, kv_heads: int,
    page_size: int, head_dim: int,
) -> ServingState:
    return ServingState(
        pages=[
            make_kv_pages_kernel(n_pages, kv_heads, page_size, head_dim)
            for _ in range(n_layers)
        ],
        hot=[make_hot(batch, kv_heads, head_dim) for _ in range(n_layers)],
        row=jnp.int32(0),
        flushed=jnp.zeros((batch,), jnp.int32),
    )


def decode_hidden(
    params: ServingParams,
    state: ServingState,
    ids, page_table, seq_lens,
    cfg: ModelConfig,
    spec: QuantSpec,
    gather=None,
    flush: bool = False,
    attn_block_fn=None,
    post_attn_fn=None,
):
    """Layer stack of one decode step -> (final-norm hidden [B, D], state).

    Per layer: fused qkv projection -> hot-ring write -> (conditional bulk
    flush into pages) -> paged-kernel + hot-ring attention merge -> o/MLP.
    ``cfg`` describes the PER-SHARD head counts under TP; ``gather``
    all-gathers column-sharded outputs (see ``_post_attn``).

    ``attn_block_fn(x, lp, layer, rope, hot, row) -> (q, hot')`` and
    ``post_attn_fn(x, attn, lp, layer, gather) -> x'`` override the base
    blocks (LoRA serving injects its adapter deltas here, ``serving/lora.py``);
    None keeps the production path byte-identical.
    """
    b = ids.shape[0]
    dh = cfg.head_dim
    x = _embed_lookup(params.embed, ids)  # [B, D]
    pos = jnp.maximum(seq_lens - 1, 0)
    cos, sin = rope_tables(pos, dh, cfg.rope_theta)  # [B, Dh]
    sm_scale = dh ** -0.5

    w = state.hot[0].window
    s_page = state.pages[0].page_size
    row = state.row
    max_pg = page_table.shape[1]
    # SYNCHRONIZED flush: every ``W`` decode steps (when the ring wraps) every
    # active sequence's pending block [flushed, lens) moves to its page(s).
    # The flush/no-flush choice is a STATIC variant of the step function (the
    # host knows the step count): a lax.cond around the aliased flush kernel
    # measured as a whole-pool copy per step.
    if flush:
        active = (seq_lens > 0) & (seq_lens > state.flushed)
        page_lo = (seq_lens - w) // s_page  # floor; may be negative
        slot0 = page_lo * s_page
        o_lane = seq_lens - w - slot0  # in [0, S)

        def tbl(idx):
            return jnp.take_along_axis(
                page_table, jnp.clip(idx, 0, max_pg - 1)[:, None], axis=1
            )[:, 0]

        pg_a = jnp.where(active & (page_lo >= 0), tbl(page_lo), 0)
        pg_b = jnp.where(
            active & ((page_lo + 1) * s_page < seq_lens), tbl(page_lo + 1), 0
        )
        lo = state.flushed
        hi = seq_lens
        flushed_new = jnp.where(active, seq_lens, state.flushed)
    else:
        flushed_new = state.flushed
    n_hot = seq_lens - flushed_new  # ring-resident suffix per sequence

    new_pages, new_hot = [], []
    for l, lp in enumerate(params.layers):
      with jax.named_scope(f"layer{l}"):
        with jax.named_scope("qkv_ring"):
            if attn_block_fn is None:
                q, hot_l = _attn_block_decode_ring(
                    x, lp, cfg, spec, (cos, sin), state.hot[l], row
                )
            else:
                q, hot_l = attn_block_fn(
                    x, lp, l, (cos, sin), state.hot[l], row
                )
        new_hot.append(hot_l)

        if flush:
            with jax.named_scope("ring_flush"):
                pg = flush_hot_pallas(
                    state.pages[l],
                    *hot_flush_blocks(hot_l, row),
                    pg_a, pg_b, slot0, o_lane, lo, hi,
                )
        else:
            pg = state.pages[l]
        new_pages.append(pg)

        with jax.named_scope("paged_ring_attention"):
            # ONE kernel covers pages + ring suffix (round 3): the XLA ring
            # einsums and the per-layer softmax merge are gone.
            attn = paged_ring_decode_attention(
                q, pg, page_table, flushed_new, hot_l, n_hot, row,
            ).reshape(b, cfg.num_heads * dh)
        with jax.named_scope("o_mlp"):
            if post_attn_fn is None:
                x = _post_attn(x, attn, lp, spec, gather)
            else:
                x = post_attn_fn(x, attn, lp, l, gather)

    new_state = ServingState(
        pages=new_pages, hot=new_hot, row=(row + 1) % w, flushed=flushed_new
    )
    return rmsnorm(x, params.final_norm, cfg.norm_eps), new_state


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "spec", "flush"),
    donate_argnames=("state",),
)
def decode_step(
    params: ServingParams,
    state: ServingState,
    ids: jnp.ndarray,         # int32 [B] — previously sampled tokens
    page_table: jnp.ndarray,  # int32 [B, max_pages]
    seq_lens: jnp.ndarray,    # int32 [B] — INCLUDING the incoming token
    cfg: ModelConfig,
    spec: QuantSpec,
    flush: bool = False,
):
    """One continuous-batching decode step.  Returns (next_ids [B], state).

    ``flush`` MUST be True exactly when the ring wraps this step (the host
    tracks the decode-step count: flush on every W-th call).
    """
    x, new_state = decode_hidden(
        params, state, ids, page_table, seq_lens, cfg, spec, flush=flush
    )
    logits = _lm_head_logits(x, params.lm_head, cfg.vocab_size)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_state


def causal_code_attention(
    q: jnp.ndarray,   # [Tq, HQ, D] bf16/f32 (RoPE'd)
    kq, vq,           # KVQuant over the FULL key range [Tk, Hkv, ...]
    groups: int,
    sm_scale: float,
    row_pos: jnp.ndarray = None,  # int32 [Tq] global query positions
    key_block: int = 0,
    kernel: bool = False,
) -> jnp.ndarray:
    """Causal affine-code attention -> attn [Tq, HQ*D] bf16.

    The prefill attention core shared by single-chip and sequence-parallel
    prefill: f32 q times raw u4 K codes with the affine correction, f32
    softmax, V dequant folded into the probability vector — the SAME
    numerics the decode kernel reproduces, so decode continuations match
    prefill predictions.

    ``key_block == 0``: one-pass softmax materializing [HQ, Tq, Tk] scores
    (fastest to T~2048).  ``key_block > 0``: flash-style online softmax via
    ``lax.scan`` over key blocks — O(Tq * key_block) live memory, the
    long-context path past the quadratic wall (the reference carries
    ``SinglePrefillWithKVCacheKernel`` for this, ``flashinfer/prefill.cuh:79``).
    """
    tq, hq, dh = q.shape
    tk = kq.codes.shape[0]
    if kernel and dh == 128:
        # Pallas flash-prefill (``ops/pallas_prefill.py``): triangular
        # blocked grid, bf16 score dots over raw codes, no GQA repeat.
        # ``row_pos`` is contiguous by contract (offset + arange).
        from atom_tpu.ops.pallas_prefill import flash_code_attention

        off = jnp.int32(0) if row_pos is None else row_pos[0].astype(jnp.int32)
        return flash_code_attention(
            q.astype(jnp.bfloat16), kq.codes, kq.params, vq.codes, vq.params,
            groups, sm_scale, row_offset=off,
            offset_max=0 if row_pos is None else max(tk - tq, 0),
        )
    if row_pos is None:
        row_pos = jnp.arange(tq)
    qf = q.astype(jnp.float32)
    q_sum = jnp.sum(qf, axis=2)  # [Tq, HQ]
    k_codes = jnp.repeat(kq.codes, groups, axis=1).astype(jnp.float32)
    k_prm = jnp.repeat(kq.params, groups, axis=1)  # [Tk, HQ, 2]
    v_codes = jnp.repeat(vq.codes, groups, axis=1).astype(jnp.float32)
    v_prm = jnp.repeat(vq.params, groups, axis=1)

    if key_block == 0 or key_block >= tk:
        dot = jnp.einsum("qhd,khd->hqk", qf, k_codes)
        k_scale = k_prm[:, :, 0].T[:, None, :]  # [HQ, 1, Tk]
        k_zero = k_prm[:, :, 1].T[:, None, :]
        scores = (dot * k_scale + q_sum.T[:, :, None] * k_zero) * sm_scale
        mask = jnp.where(
            jnp.arange(tk)[None, :] <= row_pos[:, None],
            0.0, jnp.finfo(jnp.float32).min,
        )[None]
        probs = jax.nn.softmax(scores + mask, axis=-1)
        pw = probs * v_prm[:, :, 0].T[:, None, :]
        attn = jnp.einsum("hqk,khd->qhd", pw, v_codes)
        attn = attn + jnp.einsum(
            "hqk,kh->qh", probs, v_prm[:, :, 1]
        )[..., None]
        return attn.astype(jnp.bfloat16).reshape(tq, hq * dh)

    while tk % key_block:  # largest power-of-2 fraction that divides Tk
        key_block //= 2
        if key_block < 8:
            key_block = tk
            break
    nb = tk // key_block

    def blocked(x):  # [Tk, ...] -> [nb, kb, ...]
        return x.reshape((nb, key_block) + x.shape[1:])

    kc_b, kp_b = blocked(k_codes), blocked(k_prm)
    vc_b, vp_b = blocked(v_codes), blocked(v_prm)
    k0s = jnp.arange(nb) * key_block

    def body(carry, blk):
        acc, m, l = carry  # [HQ, Tq, D], [HQ, Tq, 1], [HQ, Tq, 1]
        kc, kp, vc, vp, k0 = blk
        dot = jnp.einsum("qhd,khd->hqk", qf, kc)
        k_scale = kp[:, :, 0].T[:, None, :]  # [HQ, 1, kb]
        k_zero = kp[:, :, 1].T[:, None, :]
        scores = (dot * k_scale + q_sum.T[:, :, None] * k_zero) * sm_scale
        valid = (k0 + jnp.arange(key_block))[None, :] <= row_pos[:, None]
        scores = jnp.where(valid[None], scores, _NEG_INF_PREFILL)
        m_new = jnp.maximum(m, jnp.max(scores, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.where(valid[None], jnp.exp(scores - m_new), 0.0)
        l_new = l * alpha + jnp.sum(p, axis=2, keepdims=True)
        pw = p * vp[:, :, 0].T[:, None, :]
        pv = jnp.einsum("hqk,khd->hqd", pw, vc)
        z = jnp.einsum("hqk,kh->hq", p, vp[:, :, 1])[..., None]
        return (acc * alpha + pv + z, m_new, l_new), None

    acc0 = jnp.zeros((hq, tq, dh), jnp.float32)
    m0 = jnp.full((hq, tq, 1), _NEG_INF_PREFILL, jnp.float32)
    l0 = jnp.zeros((hq, tq, 1), jnp.float32)
    (acc, m, l), _ = jax.lax.scan(
        body, (acc0, m0, l0), (kc_b, kp_b, vc_b, vp_b, k0s)
    )
    attn = acc / jnp.maximum(l, 1e-20)  # [HQ, Tq, D]
    return attn.astype(jnp.bfloat16).swapaxes(0, 1).reshape(tq, hq * dh)


_NEG_INF_PREFILL = -1e30

# prompts longer than this use the scanned (flash-style) prefill attention
PREFILL_SCAN_THRESHOLD = 2048
PREFILL_KEY_BLOCK = 1024
# prompts longer than this use the Pallas flash-prefill kernel instead
# (off by default until the queued hardware measurement picks the winner;
# scripts/measure_prefill_longctx.py A/Bs all three paths)
PREFILL_KERNEL_THRESHOLD = 10**9


def prefill_hidden(
    params: ServingParams,
    pages: List[KVPages],
    ids, table_row,
    cfg: ModelConfig,
    spec: QuantSpec,
    gather=None,
    attn_block_fn=None,
    post_attn_fn=None,
):
    """Layer stack of a prefill -> (final-norm hidden [T, D], pages).

    Attention runs with the SAME numerics the decode kernel will reproduce:
    f32 affine code dots over the just-quantized post-RoPE K, f32 softmax,
    f32 dequantized V, bf16 at the output.
    """
    t = ids.shape[0]
    dh = cfg.head_dim
    groups = cfg.kv_groups
    x = _embed_lookup(params.embed, ids)  # [T, D]
    positions = jnp.arange(t)
    cos, sin = rope_tables(positions, dh, cfg.rope_theta)  # [T, Dh]
    key_block = PREFILL_KEY_BLOCK if t > PREFILL_SCAN_THRESHOLD else 0
    use_kernel = t > PREFILL_KERNEL_THRESHOLD and cfg.head_dim == 128

    new_pages = []
    for l, lp in enumerate(params.layers):
        if attn_block_fn is None:
            q, kq, vq = _attn_block_common(x, lp, cfg, spec, (cos, sin))
        else:
            q, kq, vq = attn_block_fn(x, lp, l, (cos, sin))
        new_pages.append(append_kv_prefill_kernel(pages[l], kq, vq, table_row))

        # Attention with the SAME numerics as the decode kernel (affine-code
        # math, f32 softmax, bf16 out) — so decode continuations reproduce
        # prefill predictions.  Past PREFILL_SCAN_THRESHOLD tokens this runs
        # the flash-style scanned path (no [H, T, T] materialization).
        attn = causal_code_attention(
            q, kq, vq, groups, dh ** -0.5, key_block=key_block,
            kernel=use_kernel,
        )
        if post_attn_fn is None:
            x = _post_attn(x, attn, lp, spec, gather)
        else:
            x = post_attn_fn(x, attn, lp, l, gather)

    return rmsnorm(x, params.final_norm, cfg.norm_eps), new_pages


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "spec"),
    donate_argnames=("state",),
)
def prefill_step(
    params: ServingParams,
    state: ServingState,
    ids: jnp.ndarray,        # int32 [T] — bucket-padded prompt
    table_row: jnp.ndarray,  # int32 [max_pages] — this sequence's pages
    true_len: jnp.ndarray,   # int32 scalar
    slot: jnp.ndarray,       # int32 scalar — this sequence's batch slot
    cfg: ModelConfig,
    spec: QuantSpec,
):
    """Prefill one fresh sequence; returns (first generated token, state).

    The whole prompt lands in pages; the slot's flushed-counter is set to the
    prompt length so decode's first ring flush masks the page-resident prefix.
    """
    x, new_pages = prefill_hidden(params, state.pages, ids, table_row, cfg, spec)
    last = x[jnp.maximum(true_len - 1, 0)]
    logits = _lm_head_logits(last[None], params.lm_head, cfg.vocab_size)[0]
    new_state = ServingState(
        pages=new_pages,
        hot=state.hot,
        row=state.row,
        flushed=state.flushed.at[slot].set(true_len),
    )
    return jnp.argmax(logits).astype(jnp.int32), new_state


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "spec"),
    donate_argnames=("state",),
)
def decode_burst(
    params: ServingParams,
    state: ServingState,
    ids: jnp.ndarray,         # int32 [B]
    page_table: jnp.ndarray,  # int32 [B, max_pages] — must pre-cover the burst
    seq_lens: jnp.ndarray,    # int32 [B] — current lengths (EXCLUDING ids)
    n_steps: jnp.ndarray,     # int32 scalar — number of W-step ring WINDOWS
    cfg: ModelConfig,
    spec: QuantSpec,
):
    """Run ``n_steps`` whole ring windows (W decode steps each) in ONE program.

    All bookkeeping (ring rows, flush boundaries) is derived in-graph, so the
    host stays out of the loop entirely — this is how decode throughput is
    measured on a dispatch-latency-bound link, and how a production engine
    amortizes host work when no requests join or leave the batch.
    """

    w = state.hot[0].window

    def nf_body(_, carry):
        ids_, state_, lens_ = carry
        new_lens = lens_ + 1
        ids_, state_ = decode_step(
            params, state_, ids_, page_table, new_lens, cfg, spec, flush=False
        )
        return ids_, state_, new_lens

    def window(_, carry):
        ids_, state_, lens_ = jax.lax.fori_loop(0, w - 1, nf_body, carry)
        new_lens = lens_ + 1
        ids_, state_ = decode_step(
            params, state_, ids_, page_table, new_lens, cfg, spec, flush=True
        )
        return ids_, state_, new_lens

    # n_steps is interpreted in whole ring windows (W steps each), keeping
    # the flush cadence identical to the host-driven engine.
    return jax.lax.fori_loop(
        0, n_steps, window, (ids, state, seq_lens)
    )


# ---------------------------------------------------------------------------
# Mixed prefill+decode step (chunked prefill riding the decode batch)
# ---------------------------------------------------------------------------
#
# The reference runs ONE step per engine iteration covering ragged prefills +
# all decodes (e2e/punica-atom/benchmarks/bench_textgen.py:136-139,
# punica/models/llama.py:129-230).  The TPU equivalent with static shapes:
# prompts are processed in PAGE-SIZE chunks, each chunk CONCATENATED onto the
# decode batch's token rows.  The GEMMs are weight-bound at decode batch
# sizes, so the chunk's extra rows ride the same weight reads nearly for
# free; decode sequences keep stepping every iteration instead of stalling
# for a whole prompt.
#
# Per layer the chunk rows need: (a) attention over the sequence's already-
# prefilled PREFIX — the paged decode kernel reused with ``groups = G*C``
# (all C chunk queries of a kv head ride one kernel "sequence", full-MXU
# dots); (b) causal attention over the chunk itself — dense affine-code math
# merged via online softmax, exactly like the hot-ring merge; (c) a whole-
# page append of the chunk's quantized KV (chunk == page size, so every
# chunk lands page-aligned with no read-modify-write).


def _chunk_prefix_attention(q_chunk, pages, table_row, prefix_len, hb=8):
    """Chunk queries vs the page-resident prefix -> (out f32 [C,HQ,D]
    NORMALIZED, m [C,HQ], l [C,HQ]).

    ``q_chunk``: [C, HQ, D] RoPE'd.  All C queries share the page walk: they
    enter the paged kernel as ONE batch row with ``G*C`` query rows per kv
    head, so each prefix page is DMA'd once and the score dots are [C*G, S]
    — full MXU tiles (the decode path's M=G dots are latency-bound).
    """
    c, hq, d = q_chunk.shape
    h = pages.kv_heads
    # kv-head-major rows: row h*(G*C) + g*C + i = chunk query i of q-head
    # h*G+g — matches the kernel's GQA grouping with groups' = G*C.
    qr = q_chunk.transpose(1, 0, 2).reshape(1, hq * c, d)
    out, m, l = paged_decode_attention_rotated(
        qr, pages, table_row[None], prefix_len[None],
        head_block=hb, return_state=True, out_dtype=jnp.float32,
    )
    out = out.reshape(hq, c, d).transpose(1, 0, 2)
    m = m.reshape(hq, c).T
    l = l.reshape(hq, c).T
    return out, m, l


def _chunk_self_attention(q_chunk, kq, vq, chunk_len, groups, sm_scale):
    """Causal dense attention of the chunk over its OWN just-quantized KV ->
    (out f32 [C,HQ,D] UNNORMALIZED, m [C,HQ], l [C,HQ]) for merging.

    Same affine-code numerics as ``prefill_hidden`` (codes never
    dequantized); rows/cols >= ``chunk_len`` are masked padding.
    """
    c = q_chunk.shape[0]
    qf = q_chunk.astype(jnp.float32)  # [C, HQ, D]
    k_codes = jnp.repeat(kq.codes, groups, axis=1).astype(jnp.float32)
    k_prm = jnp.repeat(kq.params, groups, axis=1)  # [C, HQ, 2]
    dot = jnp.einsum("qhd,khd->hqk", qf, k_codes)
    k_scale = k_prm[:, :, 0].T[:, None, :]  # [HQ, 1, C]
    k_zero = k_prm[:, :, 1].T[:, None, :]
    q_sum = jnp.sum(qf, axis=2)  # [C, HQ]
    scores = (dot * k_scale + q_sum.T[:, :, None] * k_zero) * sm_scale
    pos = jnp.arange(c)
    causal = (pos[None, :] <= pos[:, None]) & (pos[None, :] < chunk_len)
    scores = jnp.where(causal[None], scores, -1e30)  # [HQ, C, C]
    m = jnp.max(scores, axis=2)  # [HQ, C]
    p = jnp.where(causal[None], jnp.exp(scores - m[:, :, None]), 0.0)
    l = jnp.sum(p, axis=2)
    v_prm = jnp.repeat(vq.params, groups, axis=1)
    v_codes = jnp.repeat(vq.codes, groups, axis=1).astype(jnp.float32)
    pw = p * v_prm[:, :, 0].T[:, None, :]
    out = jnp.einsum("hqk,khd->qhd", pw, v_codes)
    out = out + jnp.einsum("hqk,kh->qh", p, v_prm[:, :, 1])[..., None]
    return out, m.T, l.T


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "spec", "flush"),
    donate_argnames=("state",),
)
def mixed_step(
    params: ServingParams,
    state: ServingState,
    ids: jnp.ndarray,         # int32 [B] — decode tokens (inactive rows: 0)
    page_table: jnp.ndarray,  # int32 [B, max_pages]
    seq_lens: jnp.ndarray,    # int32 [B] — INCLUDING the incoming token; 0 = idle
    chunk_ids: jnp.ndarray,   # int32 [C] — prompt chunk, C == page_size
    chunk_table_row: jnp.ndarray,  # int32 [max_pages] — admitting seq's pages
    pos0: jnp.ndarray,        # int32 scalar — chunk start (multiple of C)
    chunk_len: jnp.ndarray,   # int32 scalar — valid tokens in this chunk
    chunk_slot: jnp.ndarray,  # int32 scalar — admitting seq's batch slot
    cfg: ModelConfig,
    spec: QuantSpec,
    flush: bool = False,
):
    """One decode step for the whole workset + one prefill chunk, fused.

    Returns (next_ids [B], chunk_tok scalar, state).  ``chunk_tok`` is the
    argmax after the chunk's last valid token — meaningful only on the
    prompt's final chunk (the request's first generated token).
    """
    b = ids.shape[0]
    dh = cfg.head_dim
    s_page = state.pages[0].page_size
    c = chunk_ids.shape[0]
    assert c == s_page, "chunk size must equal the page size (aligned appends)"
    groups = cfg.kv_groups
    sm_scale = dh ** -0.5

    x = jnp.concatenate(
        [_embed_lookup(params.embed, ids), _embed_lookup(params.embed, chunk_ids)]
    )  # [B+C, D]
    pos_dec = jnp.maximum(seq_lens - 1, 0)
    pos_all = jnp.concatenate([pos_dec, pos0 + jnp.arange(c)])
    cos, sin = rope_tables(pos_all, dh, cfg.rope_theta)

    w = state.hot[0].window
    row = state.row
    max_pg = page_table.shape[1]
    # flush bookkeeping identical to decode_hidden
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
        lo = state.flushed
        hi = seq_lens
        flushed_new = jnp.where(active, seq_lens, state.flushed)
    else:
        flushed_new = state.flushed
    n_hot = seq_lens - flushed_new

    chunk_page = jax.lax.dynamic_slice(chunk_table_row, (pos0 // s_page,), (1,))

    new_pages, new_hot = [], []
    for l_i, lp in enumerate(params.layers):
      with jax.named_scope(f"mixed_layer{l_i}"):
        q, kq, vq = _attn_block_common(x, lp, cfg, spec, (cos, sin))
        q_dec, q_chk = q[:b], q[b:]
        kq_dec = R.KVQuant(kq.codes[:b], kq.params[:b])
        vq_dec = R.KVQuant(vq.codes[:b], vq.params[:b])
        kq_chk = R.KVQuant(kq.codes[b:], kq.params[b:])
        vq_chk = R.KVQuant(vq.codes[b:], vq.params[b:])

        hot_l = write_hot(state.hot[l_i], row, kq_dec, vq_dec)
        new_hot.append(hot_l)
        if flush:
            pg = flush_hot_pallas(
                state.pages[l_i], *hot_flush_blocks(hot_l, row),
                pg_a, pg_b, slot0, o_lane, lo, hi,
            )
        else:
            pg = state.pages[l_i]

        # --- decode rows ---
        out1, m1, l1 = paged_decode_attention_rotated(
            q_dec, pg, page_table, flushed_new, return_state=True,
            out_dtype=jnp.float32,
        )
        out2, m2, l2 = hot_attention(q_dec, hot_l, n_hot, row, sm_scale)
        attn_dec = merge_attention(out1, m1, l1, out2, m2, l2).reshape(
            b, cfg.num_heads * dh
        )

        # --- chunk rows: prefix (paged) + self (dense causal) ---
        po, pm, pln = _chunk_prefix_attention(q_chk, pg, chunk_table_row, pos0)
        so, sm_, sl = _chunk_self_attention(
            q_chk, kq_chk, vq_chk, chunk_len, groups, sm_scale
        )
        attn_chk = merge_attention(po, pm, pln, so, sm_, sl).reshape(
            c, cfg.num_heads * dh
        )

        # whole-page append of the chunk's KV (chunk == page, aligned)
        pg = append_kv_prefill_kernel(pg, kq_chk, vq_chk, chunk_page)
        new_pages.append(pg)

        x = _post_attn(x, jnp.concatenate([attn_dec, attn_chk]), lp, spec)

    hidden = rmsnorm(x, params.final_norm, cfg.norm_eps)
    last_chunk_row = b + jnp.maximum(chunk_len - 1, 0)
    head_rows = jnp.concatenate(
        [hidden[:b], hidden[last_chunk_row][None]]
    )
    logits = _lm_head_logits(head_rows, params.lm_head, cfg.vocab_size)
    next_ids = jnp.argmax(logits[:b], axis=-1).astype(jnp.int32)
    chunk_tok = jnp.argmax(logits[b]).astype(jnp.int32)

    new_state = ServingState(
        pages=new_pages,
        hot=new_hot,
        row=(row + 1) % w,
        flushed=flushed_new.at[chunk_slot].set(pos0 + chunk_len),
    )
    return next_ids, chunk_tok, new_state


def make_step_fns(params: ServingParams, cfg: ModelConfig, spec: QuantSpec):
    """(prefill_fn, decode_fn) closures with the engine's calling convention."""

    def prefill_fn(state, ids, table_row, true_len, slot):
        return prefill_step(
            params, state, ids, table_row, true_len, slot, cfg, spec
        )

    counter = {"n": 0}

    def decode_fn(state, ids, page_table, seq_lens):
        counter["n"] += 1
        flush = counter["n"] % HOT_W == 0
        return decode_step(
            params, state, ids, page_table, seq_lens, cfg, spec, flush=flush
        )

    return prefill_fn, decode_fn


def make_mixed_step_fns(params: ServingParams, cfg: ModelConfig, spec: QuantSpec):
    """(prefill_fn, decode_fn, chunk_fn) for the mixed-scheduling engine.

    ``decode_fn`` and ``chunk_fn`` SHARE the ring-step counter: a mixed step
    writes the decode ring and advances ``row`` exactly like a decode step,
    so the W-th call of EITHER kind must run the flush variant.
    """
    prefill_fn, _ = make_step_fns(params, cfg, spec)
    counter = {"n": 0}

    def _flush_now():
        counter["n"] += 1
        return counter["n"] % HOT_W == 0

    def decode_fn(state, ids, page_table, seq_lens):
        return decode_step(
            params, state, ids, page_table, seq_lens, cfg, spec,
            flush=_flush_now(),
        )

    def chunk_fn(state, ids, page_table, seq_lens,
                 chunk_ids, chunk_table_row, pos0, chunk_len, chunk_slot):
        return mixed_step(
            params, state, ids, page_table, seq_lens,
            chunk_ids, chunk_table_row, pos0, chunk_len, chunk_slot,
            cfg, spec, flush=_flush_now(),
        )

    return prefill_fn, decode_fn, chunk_fn
