"""Pallas TPU kernel: 4-bit-weight grouped GEMM (the production decode path).

Unlike ``pallas_gemm.grouped_int8_gemm`` (8-bit carriers), this kernel reads the
weight body PACKED two-codes-per-byte in the nibble-plane layout
(``formats.KernelPackedWeight``): HBM weight traffic is genuinely 4 bits per
element — the actual source of Atom's decode speedup (SURVEY.md §7), matching
the reference kernel's packed s4 loads (``Dense_layer_gemm_i4_o16.cuh:474-503``).

Per 128-group: two VPU shifts unpack the byte block into sublane-contiguous
low/high halves, two depth-64 int8 MXU dots consume them directly (the layout
makes A's matching halves plain static slices — zero shuffles), and the scale
product applies to the int32 partial sums.  The INT8 keeper block (not
packable: full 8-bit range) is one extra depth-128 dot — on TPU the "dual
path" is just another dot on the same unit.

The whole K reduction runs unrolled inside one kernel instance (grid is only
(M tiles, N tiles)), so partial sums never leave registers/VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atom_tpu.ops.formats import (
    KernelPackedWeight,
    QuantizedActivation,
)

GROUP = 128
HALF = GROUP // 2


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


_DOT_I32 = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.int32,
)


def _unpack_nibbles(pb_i8):
    """int8 nibble-plane block -> (low, high) int8 halves.

    Mosaic has no sub-32-bit vector shifts; widen, extract, narrow.
    """
    pb = pb_i8.astype(jnp.int32)
    lo = ((pb << 28) >> 28).astype(jnp.int8)  # sign-extended low nibble
    hi = (pb >> 4).astype(jnp.int8)
    return lo, hi


def _gemm_packed_kernel(
    a_ref,  # int8 [tm, kb + GROUP]   (body codes ++ keeper codes)
    wp_ref,  # int8 [kb // 2, tn]      (nibble planes)
    wk_ref,  # int8 [GROUP, tn]        (keeper)
    sa_ref,  # f32 [tm, ng + 1]
    sw_ref,  # f32 [ng + 1, tn]
    out_ref,  # f32 [tm, tn]
    *,
    ng: int,
):
    """Small-M (decode) variant: two depth-64 dots per group, no scratch.

    At decode batch sizes the kernel is HBM-bound on the 4-bit weight stream;
    the halved MXU contraction depth is irrelevant and skipping the scratch
    round-trip wins (measured: 17.5us vs 21.3us at M=32, K=N=4096).
    """
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(ng):
        w_lo, w_hi = _unpack_nibbles(wp_ref[g * HALF : (g + 1) * HALF, :])
        a_lo = a_ref[:, g * GROUP : g * GROUP + HALF]
        a_hi = a_ref[:, g * GROUP + HALF : (g + 1) * GROUP]
        acc_g = _DOT_I32(a_lo, w_lo) + _DOT_I32(a_hi, w_hi)
        acc += (
            acc_g.astype(jnp.float32)
            * sa_ref[:, g : g + 1]
            * sw_ref[g : g + 1, :]
        )
    # Keeper: one full-depth INT8 dot — the second path of the "dual path".
    acc_k = _DOT_I32(a_ref[:, ng * GROUP : (ng + 1) * GROUP], wk_ref[:])
    acc += (
        acc_k.astype(jnp.float32)
        * sa_ref[:, ng : ng + 1]
        * sw_ref[ng : ng + 1, :]
    )
    out_ref[:] = acc


def _gemm_packed_scratch_kernel(
    a_ref, wp_ref, wk_ref, sa_ref, sw_ref, out_ref, wsc_ref, *, ng: int
):
    """Large-M (prefill) variant: unpack each group into an int8 VMEM scratch
    (two sublane-contiguous writes) and run ONE full-depth-128 dot — full MXU
    contraction (measured: 141us vs 219us at M=1024, K=N=4096; 244 T(int)op/s).
    """
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(ng):
        w_lo, w_hi = _unpack_nibbles(wp_ref[g * HALF : (g + 1) * HALF, :])
        wsc_ref[0:HALF, :] = w_lo
        wsc_ref[HALF:GROUP, :] = w_hi
        acc_g = _DOT_I32(a_ref[:, g * GROUP : (g + 1) * GROUP], wsc_ref[:])
        acc += (
            acc_g.astype(jnp.float32)
            * sa_ref[:, g : g + 1]
            * sw_ref[g : g + 1, :]
        )
    acc_k = _DOT_I32(a_ref[:, ng * GROUP : (ng + 1) * GROUP], wk_ref[:])
    acc += (
        acc_k.astype(jnp.float32)
        * sa_ref[:, ng : ng + 1]
        * sw_ref[ng : ng + 1, :]
    )
    out_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("tile_m", "tile_n", "interpret")
)
def packed_w4_gemm(
    a: jnp.ndarray,  # int8 [M, kb + GROUP]  (body ++ keeper codes)
    wp: jnp.ndarray,  # int8 [kb // 2, N]
    wk: jnp.ndarray,  # int8 [GROUP, N]
    sa: jnp.ndarray,  # f32 [M, ng + 1]
    sw: jnp.ndarray,  # f32 [ng + 1, N]
    tile_m: int = 256,
    tile_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    m, ktot = a.shape
    n = wp.shape[1]
    kb = ktot - GROUP
    ng = kb // GROUP
    assert wp.shape[0] == kb // 2 and wk.shape == (GROUP, n)
    assert sa.shape == (m, ng + 1) and sw.shape == (ng + 1, n)

    tm = min(tile_m, _round_up(m, 32))
    tn = min(tile_n, _round_up(n, 128))
    pad_m = _round_up(m, tm) - m
    pad_n = _round_up(n, tn) - n
    if pad_m:
        a = jnp.pad(a, ((0, pad_m), (0, 0)))
        sa = jnp.pad(sa, ((0, pad_m), (0, 0)))
    if pad_n:
        wp = jnp.pad(wp, ((0, 0), (0, pad_n)))
        wk = jnp.pad(wk, ((0, 0), (0, pad_n)))
        sw = jnp.pad(sw, ((0, 0), (0, pad_n)))
    mp, np_ = m + pad_m, n + pad_n

    # Decode (small M): HBM-bound -> skip the scratch round-trip.
    # Prefill (large M): MXU-bound -> full-depth dots via scratch.
    use_scratch = m > 64
    kernel = functools.partial(
        _gemm_packed_scratch_kernel if use_scratch else _gemm_packed_kernel,
        ng=ng,
    )
    out = pl.pallas_call(
        kernel,
        grid=(mp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, ktot), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb // 2, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, ng + 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng + 1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((GROUP, tn), jnp.int8)] if use_scratch else []
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * (kb + GROUP),
            bytes_accessed=mp * ktot + (kb // 2 + GROUP) * np_ + 4 * mp * np_,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, wp, wk, sa, sw)
    return out[:m, :n]


def assemble_activation(qa: QuantizedActivation):
    """(codes [M, kb+GROUP], scales [M, ng+1]) with the keeper as final group."""
    a = jnp.concatenate([qa.body, qa.keeper], axis=1)
    sa = jnp.concatenate([qa.body_scale, qa.keeper_scale], axis=1)
    return a, sa


def quant_gemm_packed(
    qa: QuantizedActivation,
    kw: KernelPackedWeight,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``ops.reference.quant_gemm`` with 4-bit HBM weights."""
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    a, sa = assemble_activation(qa)
    sw = jnp.concatenate([kw.body_scale, kw.keeper_scale[None, :]], axis=0)
    out = packed_w4_gemm(a, kw.body_packed, kw.keeper, sa, sw, interpret=interpret)
    return out.astype(out_dtype)


def quant_gemm_o4_packed(
    qa: QuantizedActivation,
    kw: KernelPackedWeight,
    head_dim: int = 128,
    interpret: bool = False,
):
    """k/v-projection path: 4-bit GEMM + per-head asymmetric u4 output quant.

    The re-quantization runs as jnp epilogue (XLA fuses it with the kernel's
    f32 output); at decode batch sizes the extra [M, N] f32 round-trip is
    noise next to the weight stream.  Returns a ``KVQuant``.
    """
    from atom_tpu.ops.reference import quantize_kv_asym

    out = quant_gemm_packed(qa, kw, out_dtype=jnp.float32, interpret=interpret)
    m, n = out.shape
    return quantize_kv_asym(out.reshape(m, n // head_dim, head_dim))
