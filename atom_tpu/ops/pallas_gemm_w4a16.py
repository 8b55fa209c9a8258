"""Pallas TPU kernel: weight-only INT4 GEMM with bf16 activations (W4A16).

The AWQ-baseline analog (the reference benches ``e2e/punica-awq``'s
``gemm_forward``): weights stream from HBM as 4-bit nibble planes, unpack to
f32 codes in VMEM, and the per-128-group scale applies to the f32 partial
sums — activations stay full precision.  This is the memory-bound win of
weight-only quantization without Atom's activation quantization.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128
HALF = GROUP // 2


class W4A16Weight(NamedTuple):
    """Nibble-plane packed weight-only-quantized matrix.

    ``packed``: int8 [K/2, N] — per 128-group, byte row r holds code rows
    ``g*128 + r`` (low nibble) and ``g*128 + 64 + r`` (high);
    ``scale``: f32 [K/128, N].
    """

    packed: jnp.ndarray
    scale: jnp.ndarray


def quantize_w4a16(w: jnp.ndarray) -> W4A16Weight:
    """Symmetric per-128-group INT4 quantization of a [K, N] weight."""
    k, n = w.shape
    assert k % GROUP == 0
    ng = k // GROUP
    g = w.astype(jnp.float32).reshape(ng, GROUP, n)
    scale = jnp.maximum(jnp.max(jnp.abs(g), axis=1), 1e-8) / 7.0  # [ng, n]
    codes = jnp.clip(jnp.round(g / scale[:, None, :]), -8, 7).astype(jnp.int8)
    lo = codes[:, :HALF].astype(jnp.uint8) & 0x0F
    hi = codes[:, HALF:].astype(jnp.uint8) & 0x0F
    packed = (lo | (hi << 4)).astype(jnp.int8).reshape(k // 2, n)
    return W4A16Weight(packed=packed, scale=scale)


def dequantize_w4a16(wq: W4A16Weight) -> jnp.ndarray:
    half, n = wq.packed.shape
    ng = half // HALF
    pb = wq.packed.reshape(ng, HALF, n).astype(jnp.int32)
    lo = ((pb << 28) >> 28).astype(jnp.float32)
    hi = (pb >> 4).astype(jnp.float32)
    codes = jnp.concatenate([lo, hi], axis=1)  # [ng, GROUP, n]
    return (codes * wq.scale[:, None, :]).reshape(ng * GROUP, n)


KBLK = 8  # quant groups per K-grid step (sublane-aligned scale block)


def _w4a16_kernel(a_ref, wp_ref, sw_ref, out_ref, *, kb: int):
    """One (m-tile, n-tile, k-block) grid step over ``kb`` quant groups.

    The K axis rides the grid (innermost, output-revisiting) so VMEM holds
    ``kb`` 128-row groups at a time — a fully unrolled in-kernel group loop
    blows the 16MB scoped-VMEM limit at K=11008, while one group per step
    makes the weight DMAs too small to pipeline."""
    g = pl.program_id(2)

    @pl.when(g == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = a_ref[:].astype(jnp.float32)  # [tm, kb*GROUP]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for q in range(kb):
        pb = wp_ref[q * HALF : (q + 1) * HALF, :].astype(jnp.int32)
        w_lo = ((pb << 28) >> 28).astype(jnp.float32)  # sign-extended
        w_hi = (pb >> 4).astype(jnp.float32)
        acc_g = jax.lax.dot_general(
            a[:, q * GROUP : q * GROUP + HALF], w_lo,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            a[:, q * GROUP + HALF : (q + 1) * GROUP], w_hi,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        acc += acc_g * sw_ref[q : q + 1, :]
    out_ref[:] += acc


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "out_dtype", "interpret"))
def w4a16_gemm(
    a: jnp.ndarray,  # bf16/f32 [M, K]
    wq: W4A16Weight,
    tile_m: int = 256,
    tile_n: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    m, k = a.shape
    n = wq.packed.shape[1]
    ng = k // GROUP
    kb = min(KBLK, ng)
    tm = min(tile_m, _round_up(m, 32))
    tn = min(tile_n, _round_up(n, 128))
    pad_m = _round_up(m, tm) - m
    pad_n = _round_up(n, tn) - n
    # pad K to a whole number of k-blocks; zero activations and zero scales
    # contribute nothing to the accumulator
    ngp = _round_up(ng, kb)
    pad_k = ngp * GROUP - k
    if pad_m or pad_k:
        a = jnp.pad(a, ((0, pad_m), (0, pad_k)))
    wp, sw = wq.packed, wq.scale
    if pad_n or pad_k:
        wp = jnp.pad(wp, ((0, pad_k // 2), (0, pad_n)))
        sw = jnp.pad(sw, ((0, ngp - ng), (0, pad_n)))
    mp, np_ = m + pad_m, n + pad_n

    out = pl.pallas_call(
        functools.partial(_w4a16_kernel, kb=kb),
        grid=(mp // tm, np_ // tn, ngp // kb),
        in_specs=[
            pl.BlockSpec((tm, kb * GROUP), lambda i, j, g: (i, g)),
            pl.BlockSpec((kb * HALF, tn), lambda i, j, g: (g, j)),
            pl.BlockSpec((kb, tn), lambda i, j, g: (g, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, g: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=2 * mp * k + k * np_ // 2 + 4 * mp * np_,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, wp, sw)
    return out[:m, :n].astype(out_dtype)


# ---------------------------------------------------------------------------
# W8A16: weight-only INT8 (the default serving lm_head precision)
# ---------------------------------------------------------------------------


class W8A16Weight(NamedTuple):
    """Per-output-column symmetric INT8 weight-only matrix.

    Chosen for the serving lm_head: halves head HBM traffic vs bf16 while
    perturbing logits by only ~0.7%% of their std (97%% argmax agreement even
    on iid-gaussian worst-case logits; real-model margins are far larger) —
    the W4A16 head measured 11%% / 77%% on the same probe, too coarse to be
    the default.  ``codes``: int8 [K, N]; ``scale``: f32 [1, N].
    """

    codes: jnp.ndarray
    scale: jnp.ndarray


def quantize_w8a16(w: jnp.ndarray) -> W8A16Weight:
    w32 = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True), 1e-8) / 127.0
    codes = jnp.clip(jnp.round(w32 / scale), -128, 127).astype(jnp.int8)
    return W8A16Weight(codes=codes, scale=scale)


def dequantize_w8a16(wq: W8A16Weight) -> jnp.ndarray:
    return wq.codes.astype(jnp.float32) * wq.scale


_KSTEP = 1024  # K rows per grid step (512 KB int8 weight block at tn=512)


def _w8a16_kernel(a_ref, w_ref, sw_ref, out_ref, *, n_k: int):
    g = pl.program_id(2)

    @pl.when(g == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # int8 codes are exact in bf16; a is bf16 — native MXU dot, f32 acc.
    out_ref[:] += jax.lax.dot_general(
        a_ref[:].astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(g == n_k - 1)
    def _scale():
        out_ref[:] *= sw_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "out_dtype", "interpret"))
def w8a16_gemm(
    a: jnp.ndarray,  # bf16/f32 [M, K]
    wq: W8A16Weight,
    tile_m: int = 256,
    tile_n: int = 512,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    m, k = a.shape
    n = wq.codes.shape[1]
    tm = min(tile_m, _round_up(m, 32))
    tn = min(tile_n, _round_up(n, 128))
    tk = min(_KSTEP, k)
    pad_m = _round_up(m, tm) - m
    pad_n = _round_up(n, tn) - n
    pad_k = _round_up(k, tk) - k
    if pad_m or pad_k:
        a = jnp.pad(a, ((0, pad_m), (0, pad_k)))
    w, sw = wq.codes, wq.scale
    if pad_n or pad_k:
        w = jnp.pad(w, ((0, pad_k), (0, pad_n)))
        sw = jnp.pad(sw, ((0, 0), (0, pad_n)))
    mp, np_, kp = m + pad_m, n + pad_n, k + pad_k

    out = pl.pallas_call(
        functools.partial(_w8a16_kernel, n_k=kp // tk),
        grid=(mp // tm, np_ // tn, kp // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, g: (i, g)),
            pl.BlockSpec((tk, tn), lambda i, j, g: (g, j)),
            pl.BlockSpec((1, tn), lambda i, j, g: (0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, g: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=2 * mp * k + k * np_ + 4 * mp * np_,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, w, sw)
    return out[:m, :n].astype(out_dtype)
