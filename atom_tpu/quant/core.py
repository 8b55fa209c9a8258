"""Pure-jnp quantization primitives — the scheme's reference implementation.

This module is the TPU framework's single definition of Atom's quantization math
(the reference defines it twice: Python fake-quant in ``model/quant.py`` and CUDA
kernels in ``kernels/``).  Everything here is functional, shape-polymorphic, and
jittable; the Pallas kernels in ``atom_tpu.ops`` are tested against these
functions as the numerical oracle.

Semantics mirror ``model/quant.py``:

  * ``fake_quantize_tensor``      <-> ``quantize_tensor``        (quant.py:119-183)
  * ``quantize_weight_grouped``   <-> ``quantize_tensor_channel_group`` (:69-107)
  * ``quantize_weight``           <-> ``QLinearLayer.quant``     (qLinearLayer.py:43-78)
  * ``quantize_activation``       <-> ``quantize_activation_wrapper``   (:188-231)
  * ``quantize_kv_head``          <-> ``quantize_attn_{k,v}_wrapper``   (:234-257)

All scale math is done in float32 regardless of input dtype (the reference runs in
fp16; on TPU we keep activations in bf16 and upcast for the quantization math so
round() decisions aren't perturbed by bf16's 8-bit mantissa).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from atom_tpu.config import KeeperPrecision, QuantSpec, QuantType
from atom_tpu.quant.fp import (
    fake_cast_e4m3,
    fake_cast_e5m2,
    fake_quantize_fp4,
)

_EPS = 1e-5


class GroupQuant(NamedTuple):
    """Integer codes + affine params for last-axis group quantization.

    ``codes`` are stored in int8 (int4 values occupy [-8, 7] / [0, 15]); ``scale``
    and ``zero`` have the group axis reduced to 1 (keepdims) so that
    ``dequantize_groups`` is a plain broadcast.
    For symmetric quantization ``zero`` is all-zeros.
    """

    codes: jnp.ndarray  # int8, same shape as input
    scale: jnp.ndarray  # float32, [..., 1]
    zero: jnp.ndarray  # float32, [..., 1]


# ---------------------------------------------------------------------------
# Group-level primitives (operate along the last axis)
# ---------------------------------------------------------------------------


def compute_scale_sym(w32: jnp.ndarray, bits: int, clip_ratio: float) -> jnp.ndarray:
    """Symmetric absmax scale along the last axis (``quant.py:166-172``)."""
    qmax = 2 ** (bits - 1) - 1
    wmax = jnp.maximum(jnp.max(jnp.abs(w32), axis=-1, keepdims=True), _EPS)
    if clip_ratio < 1.0:
        wmax = wmax * clip_ratio
    return wmax / qmax


def compute_scale_asym(
    w32: jnp.ndarray, bits: int, clip_ratio: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Asymmetric min/max scale + zero point along the last axis (``quant.py:173-180``)."""
    qmax = 2**bits - 1
    wmax = jnp.max(w32, axis=-1, keepdims=True)
    wmin = jnp.min(w32, axis=-1, keepdims=True)
    if clip_ratio < 1.0:
        wmax = wmax * clip_ratio
        wmin = wmin * clip_ratio
    scale = jnp.maximum(wmax - wmin, _EPS) / qmax
    zero = jnp.clip(jnp.round(-wmin / scale), 0, qmax)
    return scale, zero


def quantize_groups(
    w: jnp.ndarray, bits: int, sym: bool, clip_ratio: float = 1.0
) -> GroupQuant:
    """Quantize along the last axis, returning integer codes (the real path).

    Symmetric:  codes in [-2^(b-1), 2^(b-1)-1],  x ~ codes * scale.
    Asymmetric: codes in [0, 2^b - 1],           x ~ (codes - zero) * scale.
    """
    w32 = w.astype(jnp.float32)
    if sym:
        qmin, qmax = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
        scale = compute_scale_sym(w32, bits, clip_ratio)
        zero = jnp.zeros_like(scale)
        codes = jnp.clip(jnp.round(w32 / scale), qmin, qmax)
    else:
        qmin, qmax = 0, 2**bits - 1
        scale, zero = compute_scale_asym(w32, bits, clip_ratio)
        codes = jnp.clip(jnp.round(w32 / scale) + zero, qmin, qmax)
    # int8 covers sym codes at any bits<=8 and asym codes at bits<=7; asym
    # 8-bit codes reach 255 and need a wider carrier (caught by the
    # differential test vs the reference's quantize_tensor).
    code_dtype = jnp.int8 if (sym or bits <= 7) else jnp.int16
    return GroupQuant(codes.astype(code_dtype), scale, zero)


def dequantize_groups(q: GroupQuant, dtype=jnp.float32) -> jnp.ndarray:
    return ((q.codes.astype(jnp.float32) - q.zero) * q.scale).astype(dtype)


def _fake_quantize_exponential(
    w32: jnp.ndarray, bits: int, sym: bool
) -> jnp.ndarray:
    """Exponent-only (power-of-two) fake quantization (``quant.py:147-163``).

    Not used by Atom's canonical config; kept for flag parity.  Note the reference
    applies no clip ratio on this path.
    """
    q_max = float(2 ** (2 ** (bits - 1) - 1))
    if sym:
        wmax = jnp.maximum(jnp.max(jnp.abs(w32), axis=-1, keepdims=True), _EPS)
        scales = wmax
        base = jnp.zeros_like(scales)
    else:
        wmax = jnp.max(w32, axis=-1, keepdims=True)
        wmin = jnp.min(w32, axis=-1, keepdims=True)
        scales = (wmax - wmin) * 0.5
        base = (wmax + wmin) * 0.5
    scales = scales / q_max
    centered = w32 - base
    sign = jnp.sign(centered)
    log_w = jnp.log2(jnp.clip(jnp.abs(centered) / scales, 1.0, q_max))
    e = jnp.floor(log_w)
    e = e + (log_w - e > jnp.log2(1.5)).astype(e.dtype)
    return (2.0**e) * sign * scales + base


def fake_quantize_tensor(
    w: jnp.ndarray,
    bits: int,
    group_size: int,
    sym: bool,
    clip_ratio: float = 1.0,
    exponential: bool = False,
    quant_type: QuantType = QuantType.INT,
) -> jnp.ndarray:
    """Quantize-dequantize round trip, mirroring ``quantize_tensor`` (quant.py:119).

    ``group_size > 0`` splits the last axis into groups of that size;
    ``group_size == 0`` quantizes over the entire last axis (per-channel /
    per-token granularity in the reference's 2-D views).
    """
    if bits >= 16:
        return w
    orig_shape, orig_dtype = w.shape, w.dtype
    if group_size > 0:
        assert orig_shape[-1] % group_size == 0, (
            f"last dim {orig_shape[-1]} not divisible by group size {group_size}"
        )
        w = w.reshape(orig_shape[:-1] + (orig_shape[-1] // group_size, group_size))

    if quant_type == QuantType.FP:
        out = fake_quantize_fp4(w, axis=-1)
    elif exponential:
        out = _fake_quantize_exponential(w.astype(jnp.float32), bits, sym)
    else:
        out = dequantize_groups(quantize_groups(w, bits, sym, clip_ratio))
    return out.reshape(orig_shape).astype(orig_dtype)


# ---------------------------------------------------------------------------
# Weight quantization
# ---------------------------------------------------------------------------


def quantize_weight_grouped(
    w: jnp.ndarray,
    bits: int,
    group_size: int,
    sym: bool,
    channel_group: int = 1,
    clip_ratio: float = 1.0,
    exponential: bool = False,
    quant_type: QuantType = QuantType.INT,
) -> jnp.ndarray:
    """Fake-quantize a [out, in] weight with ``channel_group`` adjacent output
    channels sharing each per-group scale.

    Mirrors ``quantize_tensor_channel_group`` (quant.py:69-107): for every K-group,
    the reference reshapes ``channel_group`` consecutive rows into one scale unit.
    The reference loops over groups sequentially; the groups are independent so we
    vectorize the whole thing as one reshape.
    """
    if bits >= 16:
        return w
    out_ch, in_ch = w.shape
    if group_size == 0:
        # Per-output-channel quantization; channel_group is ignored by the
        # reference on this path (quant.py:77-78).
        return fake_quantize_tensor(
            w, bits, 0, sym, clip_ratio, exponential, quant_type
        )

    assert in_ch % group_size == 0
    cg = channel_group
    if cg > 1:
        assert out_ch % cg == 0
        n_groups = in_ch // group_size
        # [out, in] -> [out/cg, cg, n_g, G] -> [out/cg, n_g, cg, G] -> merge (cg, G)
        wv = w.reshape(out_ch // cg, cg, n_groups, group_size)
        wv = jnp.swapaxes(wv, 1, 2).reshape(out_ch // cg, n_groups, cg * group_size)
        wq = fake_quantize_tensor(wv, bits, 0, sym, clip_ratio, exponential, quant_type)
        wq = wq.reshape(out_ch // cg, n_groups, cg, group_size)
        wq = jnp.swapaxes(wq, 1, 2).reshape(out_ch, in_ch)
        return wq
    return fake_quantize_tensor(
        w, bits, group_size, sym, clip_ratio, exponential, quant_type
    )


def quantize_keeper(x: jnp.ndarray, precision: KeeperPrecision) -> jnp.ndarray:
    """Quantize the keeper (outlier) block at its mixed precision.

    INT8 mode is symmetric per-row over the keeper block — ``quantize_tensor(...,
    n_bits=8, group_size=0, sym=True)`` on a [rows, keeper] view
    (qLinearLayer.py:51-58, quant.py:213-220).
    """
    if precision == KeeperPrecision.FLOAT:
        return x
    if precision == KeeperPrecision.FP8_E5M2:
        return fake_cast_e5m2(x)
    if precision == KeeperPrecision.FP8_E4M3:
        return fake_cast_e4m3(x)
    return fake_quantize_tensor(x, bits=8, group_size=0, sym=True)


def quantize_weight(w: jnp.ndarray, spec: QuantSpec) -> jnp.ndarray:
    """Full Atom weight fake-quantization of a [out, in] matrix.

    Mirrors ``QLinearLayer.quant`` (qLinearLayer.py:43-78): the last ``keeper``
    input channels (outliers, moved last by the calibration reorder) are saved and
    quantized at keeper precision; the rest of the matrix — with the keeper block
    zeroed, so aligned groups see only zeros there — is group-quantized at
    ``wbits``; the keeper block is then restored.
    """
    if not spec.quantize_weights:
        return w
    k = spec.keeper
    if k > 0:
        saved = quantize_keeper(w[:, -k:], spec.keeper_precision)
        w = w.at[:, -k:].set(0)
    wq = quantize_weight_grouped(
        w,
        bits=spec.wbits,
        group_size=spec.weight_group_size,
        sym=spec.w_sym,
        channel_group=spec.weight_channel_group,
        clip_ratio=spec.w_clip_ratio,
        exponential=spec.exponential,
        quant_type=spec.quant_type,
    )
    if k > 0:
        wq = wq.at[:, -k:].set(saved.astype(wq.dtype))
    return wq


# ---------------------------------------------------------------------------
# Activation quantization (dynamic, per-token)
# ---------------------------------------------------------------------------


def quantize_activation(x: jnp.ndarray, spec: QuantSpec) -> jnp.ndarray:
    """Dynamic per-token activation fake quantization with keeper split.

    Mirrors ``quantize_activation_wrapper`` (quant.py:188-231): the last ``keeper``
    channels are kept at keeper precision (INT8 per-token absmax in the canonical
    config), zeroed out of the body, and the body is group-quantized at ``abits``.
    """
    if not spec.quantize_acts:
        return x
    orig_shape, orig_dtype = x.shape, x.dtype
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    k = spec.keeper
    if k > 0:
        saved = quantize_keeper(x2[:, -k:], spec.keeper_precision)
        x2 = x2.at[:, -k:].set(0)
    xq = fake_quantize_tensor(
        x2,
        bits=spec.abits,
        group_size=spec.act_group_size,
        sym=spec.a_sym,
        clip_ratio=spec.a_clip_ratio,
        exponential=False,
        quant_type=spec.quant_type,
    )
    if k > 0:
        xq = xq.at[:, -k:].set(saved.astype(xq.dtype))
    return xq.reshape(orig_shape).astype(orig_dtype)


# ---------------------------------------------------------------------------
# KV-cache quantization
# ---------------------------------------------------------------------------


def quantize_kv_head(x: jnp.ndarray, spec: QuantSpec) -> jnp.ndarray:
    """Per-head asymmetric KV fake quantization over ``head_dim``.

    Mirrors ``quantize_attn_{k,v}_wrapper`` (quant.py:234-257): always asymmetric
    (independent of ``a_sym``), ``abits`` wide, per (token, head) granularity over
    the last (head_dim) axis, with ``kv_clip_ratio``.  The reference asserts
    head_dim == 128; we accept any head_dim.
    """
    if not (spec.kv_cache and spec.quantize_acts):
        return x
    return fake_quantize_tensor(
        x,
        bits=spec.abits,
        group_size=0,
        sym=False,
        clip_ratio=spec.kv_clip_ratio,
    )


def quantize_kv_head_real(x: jnp.ndarray, spec: QuantSpec) -> GroupQuant:
    """Integer-code variant of :func:`quantize_kv_head` for the paged KV cache."""
    return quantize_groups(
        x, bits=spec.abits, sym=False, clip_ratio=spec.kv_clip_ratio
    )
