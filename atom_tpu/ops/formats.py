"""Packed tensor formats for the real (serving) quantized compute path.

The reference's serving weights live as ``weight_int4 [out, (in-128)/2] u8 +
weight_int8 [out, 128] i8 + scale_int4 + scale_int8``
(``e2e/punica-atom/punica/models/llama.py:35-59``), with activation scales in an
``ldmatrix``-driven replicated layout (``scale_size`` — ``ops/__init__.py:137-138``).
On TPU none of that layout exotica is needed (SURVEY.md §7): scales are plain
``[rows, n_groups]`` arrays, INT4 codes travel packed 2-per-int8-byte, and the
MXU consumes the unpacked int8 operands directly.

Scale semantics (symmetric body / keeper, the canonical Atom config):
    x ~ codes_i4 * scale_group        (body, per 128-group)
    x ~ codes_i8 * keeper_scale       (keeper block, per row/token)
Weight scales are shared across ``weight_channel_group`` adjacent output
channels but stored EXPANDED to [out, n_groups] so kernels never re-index.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from atom_tpu.config import KeeperPrecision, QuantSpec, QuantType
from atom_tpu.quant.core import compute_scale_sym, quantize_groups
from atom_tpu.quant.packing import pack_int4, unpack_int4


class PackedWeight(NamedTuple):
    """W4A4 dual-path linear weight: INT4 body + INT8 keeper columns.

    For a logical [in, out] weight (kernel convention) with ``keeper`` trailing
    input channels:
      * ``body``:   int8 [in - keeper, out]   — int4 codes, UNPACKED carrier
                     (int4 values in int8; TPU MXU consumes int8 natively, and
                     XLA stores this densely; the packed on-disk form is
                     ``pack_body()``);
      * ``body_scale``: f32 [n_groups, out]   — per-128-group, channel-group
                     expanded;
      * ``keeper``: int8 [keeper, out]        — INT8 codes;
      * ``keeper_scale``: f32 [out]           — per output channel (cg expanded).
    """

    body: jnp.ndarray
    body_scale: jnp.ndarray
    keeper: jnp.ndarray
    keeper_scale: jnp.ndarray

    @property
    def in_features(self) -> int:
        return self.body.shape[0] + self.keeper.shape[0]

    @property
    def out_features(self) -> int:
        return self.body.shape[1]


class QuantizedActivation(NamedTuple):
    """Dynamically quantized activation: INT4 body + INT8 keeper block.

      * ``body``:   int8 [tokens, d - keeper] — int4 codes;
      * ``body_scale``: f32 [tokens, n_groups];
      * ``keeper``: int8 [tokens, keeper];
      * ``keeper_scale``: f32 [tokens, 1].
    """

    body: jnp.ndarray
    body_scale: jnp.ndarray
    keeper: jnp.ndarray
    keeper_scale: jnp.ndarray


def quantize_weight_packed(
    w: jnp.ndarray, spec: QuantSpec
) -> PackedWeight:
    """RTN-quantize a [in, out] weight into the packed dual-path format.

    For GPTQ-calibrated weights use :func:`pack_gptq_output` instead (the codes
    come out of the GPTQ loop itself; re-deriving them from the fake values is
    not exact when a group's minimum sits on the -2^(b-1) clamp).
    """
    assert spec.w_sym, "packed serving path implements the canonical symmetric config"
    assert spec.keeper_precision in (KeeperPrecision.INT8,), (
        "serving keeper path is INT8 (canonical config)"
    )
    in_f, out_f = w.shape
    k = spec.keeper
    g = spec.weight_group_size
    body_w = w[: in_f - k].T.astype(jnp.float32)  # [out, in-k]
    keep_w = w[in_f - k :].T.astype(jnp.float32)  # [out, k]

    cg = spec.weight_channel_group
    n_groups = (in_f - k) // g
    # Channel-group scale: absmax over (cg rows x group).
    bw = body_w.reshape(out_f // cg, cg, n_groups, g)
    bw_merged = jnp.swapaxes(bw, 1, 2).reshape(out_f // cg, n_groups, cg * g)
    scale = compute_scale_sym(bw_merged, spec.wbits, spec.w_clip_ratio)  # [out/cg, ng, 1]
    scale_exp = jnp.repeat(scale[:, :, 0].T[:, :, None], cg, axis=2)  # [ng, out/cg, cg]
    scale_exp = scale_exp.reshape(n_groups, out_f)  # [ng, out]

    qmin, qmax = -(2 ** (spec.wbits - 1)), 2 ** (spec.wbits - 1) - 1
    grouped = body_w.reshape(out_f, n_groups, g)
    codes = jnp.clip(
        jnp.round(grouped / scale_exp.T[:, :, None]), qmin, qmax
    ).astype(jnp.int8)
    body = codes.reshape(out_f, in_f - k).T  # [in-k, out]

    kq = quantize_groups(keep_w, bits=8, sym=True)  # per out-channel over keeper
    return PackedWeight(
        body=body,
        body_scale=scale_exp,
        keeper=kq.codes.T,
        keeper_scale=kq.scale[:, 0],
    )


def pack_gptq_output(
    w_fake: jnp.ndarray, gptq_scales: jnp.ndarray, spec: QuantSpec
) -> PackedWeight:
    """GPTQ fake-quantized [in, out] weight + exported group scales -> packed.

    GPTQ values sit exactly on ``code * scale`` grids whose scales come from
    the error-compensated weights mid-loop (calib/gptq.py ``_find_params``),
    so the integer codes are recovered EXACTLY by re-rounding on the exported
    grid — unlike re-quantizing the fake values, which re-applies the clip
    ratio and mis-derives scales for clamp-edge groups.

    ``gptq_scales``: [n_groups, out // channel_group] from
    ``gptq_quantize_weight(..., return_scales=True)`` (weights there are
    [out, in]; this function takes the model's [in, out] storage).

    The keeper block needs no exported scale: its INT8 grid is symmetric
    per-channel absmax/127 with no clip, and |codes| never exceeds 127, so the
    grid re-derives exactly from the fake values.
    """
    assert spec.quant_type == QuantType.INT, "packed serving path is INT4"
    assert spec.w_sym
    assert spec.keeper_precision == KeeperPrecision.INT8, (
        "keeper grid re-derivation is exact only for the INT8 keeper (FP8 "
        "keepers round on a non-uniform grid this pack cannot recover)"
    )
    in_f, out_f = w_fake.shape
    k, g, cg = spec.keeper, spec.weight_group_size, spec.weight_channel_group
    if (in_f - k) % g != 0:
        raise ValueError(
            f"serving pack needs (in_features - keeper) % group == 0, got "
            f"({in_f} - {k}) % {g}; GPTQ calibrates remainder blocks but the "
            "packed kernels consume whole 128-groups"
        )
    n_groups = (in_f - k) // g
    assert gptq_scales.shape == (n_groups, out_f // cg), gptq_scales.shape

    scale_exp = jnp.repeat(
        gptq_scales.astype(jnp.float32), cg, axis=1
    )  # [ng, out]
    qmin, qmax = -(2 ** (spec.wbits - 1)), 2 ** (spec.wbits - 1) - 1
    grouped = (
        w_fake[: in_f - k].astype(jnp.float32).T.reshape(out_f, n_groups, g)
    )
    codes = jnp.clip(
        jnp.round(grouped / scale_exp.T[:, :, None]), qmin, qmax
    ).astype(jnp.int8)

    kq = quantize_groups(
        w_fake[in_f - k :].astype(jnp.float32).T, bits=8, sym=True
    )
    return PackedWeight(
        body=codes.reshape(out_f, in_f - k).T,
        body_scale=scale_exp,
        keeper=kq.codes.T,
        keeper_scale=kq.scale[:, 0],
    )


def concat_packed_out(pws: list) -> PackedWeight:
    """Concatenate PackedWeights along the OUTPUT axis (fused wide GEMMs).

    Valid because every scale is per-output-channel(-group) and channel groups
    never straddle a constituent boundary (out_features % channel_group == 0
    for each piece).
    """
    return PackedWeight(
        body=jnp.concatenate([p.body for p in pws], axis=1),
        body_scale=jnp.concatenate([p.body_scale for p in pws], axis=1),
        keeper=jnp.concatenate([p.keeper for p in pws], axis=1),
        keeper_scale=jnp.concatenate([p.keeper_scale for p in pws], axis=0),
    )


def quantize_activation_packed(
    x: jnp.ndarray, spec: QuantSpec
) -> QuantizedActivation:
    """Dynamically quantize [tokens, d] activations into the dual-path format.

    jnp reference for the fused Pallas epilogues (RMSNorm/Activate/Reorder):
    symmetric per-128-group INT4 body + per-token INT8 keeper
    (``Reorder.cuh:119-189``-equivalent semantics).
    """
    assert spec.a_sym
    t, d = x.shape
    k = spec.keeper
    g = spec.act_group_size
    x32 = x.astype(jnp.float32)
    if x.dtype == jnp.bfloat16:
        # Enforce the dtype contract: XLA's --xla_allow_excess_precision may
        # elide a producer's f32->bf16->f32 round-trip INSIDE one program
        # (Pallas interpret mode inlines kernels, so on CPU even "kernel
        # outputs" are elidable converts), handing this quantizer UNROUNDED
        # values while a real-hardware kernel boundary materializes bf16 —
        # boundary-sitting codes then flip between the two.  reduce_precision
        # is not elidable and is the identity on already-rounded values.
        from atom_tpu.numerics import rp_bf16

        x32 = rp_bf16(x32)
    body, keep = x32[:, : d - k], x32[:, d - k :]

    n_groups = (d - k) // g
    grouped = body.reshape(t, n_groups, g)
    bq = quantize_groups(grouped, spec.abits, sym=True, clip_ratio=spec.a_clip_ratio)
    kq = quantize_groups(keep, bits=8, sym=True)
    return QuantizedActivation(
        body=bq.codes.reshape(t, d - k),
        body_scale=bq.scale[..., 0],
        keeper=kq.codes,
        keeper_scale=kq.scale,
    )


def dequantize_activation(qa: QuantizedActivation, dtype=jnp.bfloat16) -> jnp.ndarray:
    t = qa.body.shape[0]
    g = qa.body.shape[1] // qa.body_scale.shape[1]
    body = (
        qa.body.reshape(t, -1, g).astype(jnp.float32)
        * qa.body_scale[..., None]
    ).reshape(t, -1)
    keep = qa.keeper.astype(jnp.float32) * qa.keeper_scale
    return jnp.concatenate([body, keep], axis=-1).astype(dtype)


def dequantize_weight(pw: PackedWeight, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Back to a logical [in, out] float weight (test utility)."""
    n_groups, out_f = pw.body_scale.shape
    g = pw.body.shape[0] // n_groups
    body = (
        pw.body.T.reshape(out_f, n_groups, g).astype(jnp.float32)
        * pw.body_scale.T[:, :, None]
    ).reshape(out_f, -1).T
    keep = (pw.keeper.astype(jnp.float32) * pw.keeper_scale[None, :])
    return jnp.concatenate([body, keep], axis=0).astype(dtype)


class KernelPackedWeight(NamedTuple):
    """HBM-resident 4-bit weight layout for the Pallas GEMM (nibble planes).

    For each 128-wide quantization group g, byte row r in [0, 64):
        low  nibble of ``body_packed[g*64 + r, n]`` = code[g*128 + r,      n]
        high nibble of ``body_packed[g*64 + r, n]`` = code[g*128 + 64 + r, n]
    This "nibble plane" layout unpacks with two VPU shifts into two
    sublane-contiguous [64, N] halves — no interleave/shuffle — so the kernel
    pays zero data rearrangement for the 2x HBM-traffic saving.  (The CUDA
    equivalent is the 8-per-u32 unpack feeding ``ldmatrix``,
    ``quantization.cuh:66-80`` — layout chosen for the memory system, not the
    math.)

      * ``body_packed``: int8 [(in - keeper) // 2, out]
      * ``body_scale``:  f32 [n_groups, out]
      * ``keeper``:      int8 [keeper, out]  (full INT8 range — not packable)
      * ``keeper_scale``: f32 [out]
    """

    body_packed: jnp.ndarray
    body_scale: jnp.ndarray
    keeper: jnp.ndarray
    keeper_scale: jnp.ndarray


def pack_for_kernel(pw: PackedWeight, group: int = 128) -> KernelPackedWeight:
    """PackedWeight (unpacked codes) -> nibble-plane 4-bit kernel layout."""
    kb, n = pw.body.shape
    ng = kb // group
    codes = pw.body.reshape(ng, group, n)
    lo = codes[:, : group // 2]  # [ng, 64, n]
    hi = codes[:, group // 2 :]
    packed = (lo.astype(jnp.uint8) & 0x0F) | (hi.astype(jnp.uint8) << 4)
    return KernelPackedWeight(
        body_packed=packed.astype(jnp.int8).reshape(kb // 2, n),
        body_scale=pw.body_scale,
        keeper=pw.keeper,
        keeper_scale=pw.keeper_scale,
    )


def unpack_from_kernel(kw: KernelPackedWeight, group: int = 128) -> PackedWeight:
    """Inverse of :func:`pack_for_kernel` (tests / tooling)."""
    half, n = kw.body_packed.shape
    ng = half // (group // 2)
    pb = kw.body_packed.reshape(ng, group // 2, n)
    lo = ((pb << 4) >> 4).astype(jnp.int8)  # arithmetic shift sign-extends
    hi = (pb >> 4).astype(jnp.int8)
    codes = jnp.concatenate([lo, hi], axis=1).reshape(ng * group, n)
    return PackedWeight(
        body=codes,
        body_scale=kw.body_scale,
        keeper=kw.keeper,
        keeper_scale=kw.keeper_scale,
    )


def pack_weight_storage(pw: PackedWeight) -> dict:
    """2-per-byte packed form for checkpoints / HBM residency accounting."""
    return {
        "body_packed": pack_int4(pw.body.T).T,  # pack along input axis
        "body_scale": pw.body_scale.astype(jnp.bfloat16),
        "keeper": pw.keeper,
        "keeper_scale": pw.keeper_scale.astype(jnp.bfloat16),
    }


def unpack_weight_storage(d: dict) -> PackedWeight:
    return PackedWeight(
        body=unpack_int4(d["body_packed"].T).T,
        body_scale=d["body_scale"].astype(jnp.float32),
        keeper=d["keeper"],
        keeper_scale=d["keeper_scale"].astype(jnp.float32),
    )
