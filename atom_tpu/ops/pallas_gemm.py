"""Pallas TPU kernel: grouped-scale INT GEMM — the W4A4 serving matmul.

TPU-first redesign of the reference's fused dual-path kernel
(``Dense_layer_gemm_i4_o16.cuh``): on CUDA the INT4 body and INT8 keeper need
two different tensor-core paths (``mma.sync.m16n8k64.s4`` + ``m16n8k32.s8``)
with an epilogue pipeline restart (``:590-691``).  On TPU both paths are the
same ``int8 x int8 -> int32`` MXU dot, so the wrapper simply CONCATENATES the
keeper block as one extra 128-wide scale group and the kernel is a uniform
grouped-scale integer GEMM:

    D[M, N] = sum_g (A_g[M, 128] . W_g[128, N])_int32 * (sa[M, g] x sw[g, N])

The per-group scale product applied to the int32 partial sums is exactly the
reference's in-register per-K-group dequant accumulation (``:582-587``), and
128-element contraction slices match the MXU's native depth.

Grid: (M tiles, N tiles, groups) with the group axis innermost, so the fp32
output tile stays resident in VMEM across the whole K reduction.

The ``_o4`` variant fuses asymmetric per-``head_dim``-group re-quantization of
the output rows into the final grid step — the k_proj/v_proj path that feeds
the INT4 KV cache directly (``DenseLayerGEMM_i4_o4.cu:728-775``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atom_tpu.ops.formats import PackedWeight, QuantizedActivation


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


GROUP = 128  # quantization group == MXU contraction depth


def _gemm_kernel(a_ref, w_ref, sa_ref, sw_ref, out_ref):
    # sa/sw blocks hold ALL group columns (the group count is too small to
    # tile at lane granularity); slice this step's group here.
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = jax.lax.dot_general(
        a_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Mask-select group k's scale column/row (dynamic lane/sublane slices of
    # width 1 are not Mosaic-provable; a one-hot reduction is cheap: ng <= 96).
    ng = sa_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ng), 1)
    sa_g = jnp.sum(
        sa_ref[:] * (col == k).astype(jnp.float32), axis=1, keepdims=True
    )  # [tm, 1]
    row = jax.lax.broadcasted_iota(jnp.int32, (ng, 1), 0)
    sw_g = jnp.sum(
        sw_ref[:] * (row == k).astype(jnp.float32), axis=0, keepdims=True
    )  # [1, tn]
    out_ref[:] += acc.astype(jnp.float32) * sa_g * sw_g


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n", "interpret"))
def grouped_int8_gemm(
    a: jnp.ndarray,  # int8 [M, K]   (body codes ++ keeper codes)
    w: jnp.ndarray,  # int8 [K, N]
    sa: jnp.ndarray,  # f32 [M, K // GROUP]
    sw: jnp.ndarray,  # f32 [K // GROUP, N]
    tile_m: int = 256,
    tile_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """f32 [M, N] grouped-scale integer GEMM (see module docstring)."""
    m, k = a.shape
    n = w.shape[1]
    ng = k // GROUP
    assert k % GROUP == 0 and sa.shape == (m, ng) and sw.shape == (ng, n)

    tm = min(tile_m, _round_up(m, 32))
    tn = min(tile_n, _round_up(n, 128))

    pad_m = _round_up(m, tm) - m
    pad_n = _round_up(n, tn) - n
    if pad_m:
        a = jnp.pad(a, ((0, pad_m), (0, 0)))
        sa = jnp.pad(sa, ((0, pad_m), (0, 0)))
    if pad_n:
        w = jnp.pad(w, ((0, 0), (0, pad_n)))
        sw = jnp.pad(sw, ((0, 0), (0, pad_n)))
    mp, np_ = m + pad_m, n + pad_n

    grid = (mp // tm, np_ // tn, ng)
    out = pl.pallas_call(
        _gemm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, GROUP), lambda i, j, g: (i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, tn), lambda i, j, g: (g, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ng), lambda i, j, g: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, tn), lambda i, j, g: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, g: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k + k * np_ + 4 * (mp * ng + ng * np_ + mp * np_),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, w, sa, sw)
    return out[:m, :n]


def _assemble_operands(qa: QuantizedActivation, pw: PackedWeight):
    """Concatenate the INT8 keeper block as one extra scale group."""
    a = jnp.concatenate([qa.body, qa.keeper], axis=1)
    w = jnp.concatenate([pw.body, pw.keeper], axis=0)
    sa = jnp.concatenate([qa.body_scale, qa.keeper_scale], axis=1)
    sw = jnp.concatenate([pw.body_scale, pw.keeper_scale[None, :]], axis=0)
    return a, w, sa, sw


def quant_gemm_pallas(
    qa: QuantizedActivation,
    pw: PackedWeight,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in Pallas implementation of ``ops.reference.quant_gemm``."""
    a, w, sa, sw = _assemble_operands(qa, pw)
    return grouped_int8_gemm(a, w, sa, sw, interpret=interpret).astype(out_dtype)


# ---------------------------------------------------------------------------
# Fused output re-quantization variant (k/v projections -> INT4 KV cache)
# ---------------------------------------------------------------------------


def _gemm_o4_kernel(a_ref, w_ref, sa_ref, sw_ref, codes_ref, params_ref, acc_ref, *, head_dim):
    k = pl.program_id(2)
    ng = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = jax.lax.dot_general(
        a_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    ngroups = sa_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ngroups), 1)
    sa_g = jnp.sum(
        sa_ref[:] * (col == k).astype(jnp.float32), axis=1, keepdims=True
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (ngroups, 1), 0)
    sw_g = jnp.sum(
        sw_ref[:] * (row == k).astype(jnp.float32), axis=0, keepdims=True
    )
    acc_ref[:] += acc.astype(jnp.float32) * sa_g * sw_g

    @pl.when(k == ng - 1)
    def _():
        tm, tn = acc_ref.shape
        heads = tn // head_dim
        x = acc_ref[:].reshape(tm, heads, head_dim)
        xmax = jnp.max(x, axis=-1, keepdims=True)
        xmin = jnp.min(x, axis=-1, keepdims=True)
        # bf16-rounded scale/zero_val, matching quantize_kv_asym (the
        # paged cache stores params in bf16).
        scale = jnp.maximum(xmax - xmin, 1e-5) / 15.0
        scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
        zero = jnp.clip(jnp.round(-xmin / scale), 0.0, 15.0)
        codes = jnp.clip(jnp.round(x / scale) + zero, 0.0, 15.0)
        codes_ref[:] = codes.astype(jnp.int8).reshape(tm, tn)
        zero_val = (-zero * scale).astype(jnp.bfloat16).astype(jnp.float32)
        params_ref[:] = jnp.concatenate(
            [scale, zero_val], axis=-1
        ).reshape(tm, heads * 2)


@functools.partial(jax.jit, static_argnames=("head_dim", "tile_m", "interpret"))
def grouped_int8_gemm_o4(
    a: jnp.ndarray,
    w: jnp.ndarray,
    sa: jnp.ndarray,
    sw: jnp.ndarray,
    head_dim: int = 128,
    tile_m: int = 256,
    interpret: bool = False,
):
    """GEMM + fused per-``head_dim`` asymmetric u4 output quantization.

    Returns (codes int8 [M, N] in [0,15], params f32 [M, N // head_dim, 2]).
    The N axis is NOT tiled (a full row of head groups lives in one block) so
    the min/max epilogue sees complete heads; k/v projections have N =
    kv_heads * head_dim <= 4096, well within VMEM at fp32.
    """
    m, k = a.shape
    n = w.shape[1]
    ng = k // GROUP
    heads = n // head_dim
    assert n % head_dim == 0

    tm = min(tile_m, _round_up(m, 32))
    pad_m = _round_up(m, tm) - m
    if pad_m:
        a = jnp.pad(a, ((0, pad_m), (0, 0)))
        sa = jnp.pad(sa, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    grid = (mp // tm, 1, ng)
    kernel = functools.partial(_gemm_o4_kernel, head_dim=head_dim)
    codes, params = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, GROUP), lambda i, j, g: (i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, n), lambda i, j, g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ng), lambda i, j, g: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, n), lambda i, j, g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, n), lambda i, j, g: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, heads * 2), lambda i, j, g: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, n), jnp.int8),
            jax.ShapeDtypeStruct((mp, heads * 2), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((tm, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(a, w, sa, sw)
    codes = codes[:m]
    params = params[:m].reshape(m, heads, 2)
    return codes, params


def quant_gemm_o4_pallas(
    qa: QuantizedActivation,
    pw: PackedWeight,
    head_dim: int = 128,
    interpret: bool = False,
):
    """Drop-in Pallas implementation of ``ops.reference.quant_gemm_o4``.

    Returns a ``KVQuant``-compatible (codes [M, heads, head_dim], params
    [M, heads, 2]) pair.
    """
    from atom_tpu.ops.reference import KVQuant

    a, w, sa, sw = _assemble_operands(qa, pw)
    codes, params = grouped_int8_gemm_o4(
        a, w, sa, sw, head_dim=head_dim, interpret=interpret
    )
    m, n = codes.shape
    return KVQuant(
        codes=codes.reshape(m, n // head_dim, head_dim), params=params
    )
