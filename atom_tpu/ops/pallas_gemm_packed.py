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


def _gemm_packed_kblk_kernel(
    a_ref,   # int8 [tm, kb_g * GROUP] — body codes, this k-block
    ak_ref,  # int8 [tm, GROUP] — keeper codes
    wp_ref,  # int8 [kb_g * HALF, tn]
    wk_ref,  # int8 [GROUP, tn]
    sa_ref,  # f32 [1, tm, kb_g] (k-block-major: lane dim == kb_g exactly)
    sak_ref,  # f32 [tm, 1]
    sw_ref,  # f32 [kb_g, tn]
    swk_ref,  # f32 [1, tn]
    out_ref,  # f32 [tm, tn]
    *,
    kb_g: int,
):
    """K-blocked variant for large K (the 70B MLP: 223 groups): the K axis
    rides the grid (innermost, output-revisiting), ``kb_g`` groups per step —
    a fully unrolled 223-group loop exceeds the 16MB scoped-VMEM stack.
    Zero-padded trailing groups have zero scales and contribute nothing."""
    g0 = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(g0 == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(kb_g):
        w_lo, w_hi = _unpack_nibbles(wp_ref[g * HALF : (g + 1) * HALF, :])
        a_lo = a_ref[:, g * GROUP : g * GROUP + HALF]
        a_hi = a_ref[:, g * GROUP + HALF : (g + 1) * GROUP]
        acc_g = _DOT_I32(a_lo, w_lo) + _DOT_I32(a_hi, w_hi)
        acc += (
            acc_g.astype(jnp.float32)
            * sa_ref[0, :, g : g + 1]
            * sw_ref[g : g + 1, :]
        )

    @pl.when(g0 == nk - 1)
    def _keeper():
        acc_k = _DOT_I32(ak_ref[:], wk_ref[:])
        out_ref[:] += (
            acc_k.astype(jnp.float32) * sak_ref[:, 0:1] * swk_ref[0:1, :]
        )

    out_ref[:] += acc


_KBLK_G = 16          # groups per K-grid step in the blocked path
_KBLK_THRESHOLD = 112  # ng above the 13B MLP (107); 30B/70B take the blocked path
_A_RESIDENT_BYTES = 4 * 1024 * 1024  # keep whole A in VMEM below this


def _gemm_packed_kblk_resident_kernel(
    a_ref,   # int8 [tm, ngp * GROUP] — FULL body codes, VMEM-resident
    ak_ref,  # int8 [tm, GROUP]
    wp_ref,  # int8 [kb_g * HALF, tn]
    wk_ref,  # int8 [GROUP, tn]
    sa_ref,  # f32 [1, tm, kb_g] (k-block-major, same as streamed)
    sak_ref,  # f32 [tm, 1]
    sw_ref,  # f32 [kb_g, tn]
    swk_ref,  # f32 [1, tn]
    out_ref,  # f32 [tm, tn]
    *,
    kb_g: int,
):
    """Decode-size variant: A (and its scales) stay resident in VMEM across
    the whole K walk (constant index map -> fetched once); only the 4-bit
    weight stream advances with the grid.  Removes the per-k-step A refetch
    that costs the streamed variant ~25% extra traffic at M=32."""
    g0 = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(g0 == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = g0 * kb_g
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(kb_g):
        w_lo, w_hi = _unpack_nibbles(wp_ref[g * HALF : (g + 1) * HALF, :])
        # one 128-aligned dynamic load per group, split statically
        a_g = a_ref[:, pl.ds((base + g) * GROUP, GROUP)]
        acc_g = _DOT_I32(a_g[:, :HALF], w_lo) + _DOT_I32(a_g[:, HALF:], w_hi)
        acc += (
            acc_g.astype(jnp.float32)
            * sa_ref[0, :, g : g + 1]
            * sw_ref[g : g + 1, :]
        )

    @pl.when(g0 == nk - 1)
    def _keeper():
        acc_k = _DOT_I32(ak_ref[:], wk_ref[:])
        out_ref[:] += (
            acc_k.astype(jnp.float32) * sak_ref[:, 0:1] * swk_ref[0:1, :]
        )

    out_ref[:] += acc


def _packed_w4_gemm_kblk(a, wp, wk, sa, sw, tm, tn, mp, np_, ng, interpret):
    kb = ng * GROUP
    ngp = _round_up(ng, _KBLK_G)
    ab = jnp.pad(a[:, :kb], ((0, 0), (0, (ngp - ng) * GROUP)))
    ak = a[:, kb:]
    m_rows = a.shape[0]
    sab = jnp.pad(sa[:, :ng], ((0, 0), (0, ngp - ng)))
    sak = sa[:, ng:]
    swb = jnp.pad(sw[:ng], ((0, ngp - ng), (0, 0)))
    swk = sw[ng:]
    wpb = jnp.pad(wp, ((0, (ngp - ng) * HALF), (0, 0)))
    resident = mp == tm and mp * ngp * GROUP <= _A_RESIDENT_BYTES
    # scales stream in [nk, M, kb_g] layout either way (tiny)
    sab = sab.reshape(m_rows, ngp // _KBLK_G, _KBLK_G).transpose(1, 0, 2)
    sa_spec = pl.BlockSpec((1, tm, _KBLK_G), lambda i, j, g: (g, i, 0))
    if resident:
        a_specs = [
            pl.BlockSpec((tm, ngp * GROUP), lambda i, j, g: (i, 0)),
            pl.BlockSpec((tm, GROUP), lambda i, j, g: (i, 0)),
        ]
        kernel = functools.partial(
            _gemm_packed_kblk_resident_kernel, kb_g=_KBLK_G
        )
    else:
        a_specs = [
            pl.BlockSpec((tm, _KBLK_G * GROUP), lambda i, j, g: (i, g)),
            pl.BlockSpec((tm, GROUP), lambda i, j, g: (i, 0)),
        ]
        kernel = functools.partial(_gemm_packed_kblk_kernel, kb_g=_KBLK_G)
    out = pl.pallas_call(
        kernel,
        grid=(mp // tm, np_ // tn, ngp // _KBLK_G),
        in_specs=a_specs + [
            pl.BlockSpec((_KBLK_G * HALF, tn), lambda i, j, g: (g, j)),
            pl.BlockSpec((GROUP, tn), lambda i, j, g: (0, j)),
            sa_spec,
            pl.BlockSpec((tm, 1), lambda i, j, g: (i, 0)),
            pl.BlockSpec((_KBLK_G, tn), lambda i, j, g: (g, j)),
            pl.BlockSpec((1, tn), lambda i, j, g: (0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, g: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * (kb + GROUP),
            bytes_accessed=mp * (kb + GROUP) + (kb // 2 + GROUP) * np_
            + 4 * mp * np_,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ab, ak, wpb, wk, sab, sak, swb, swk)
    return out


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

    # Very deep K (ng > 112, e.g. the 70B MLP): K-blocked grid path wants
    # wider n-tiles to amortize the per-n-tile pipeline flush (measured
    # 383 -> 340us at K=28672, N=8192, M=32).
    blocked = ng > _KBLK_THRESHOLD
    tm = min(tile_m, _round_up(m, 32))
    if blocked:
        # wide n-tiles amortize pipeline flushes at decode M; prefill-size
        # m-tiles must shrink them to stay under the 16MB scoped-VMEM stack
        tile_n = max(tile_n, 2048) if tm <= 64 else min(tile_n, 512)
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

    if blocked:
        out = _packed_w4_gemm_kblk(
            a, wp, wk, sa, sw, tm, tn, mp, np_, ng, interpret
        )
        return out[:m, :n]

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


# ---------------------------------------------------------------------------
# Float-input variants: dynamic quantization (and optionally the RMSNorm) as
# an in-kernel PROLOGUE
# ---------------------------------------------------------------------------
#
# The production decode layer spends ~10-12 dispatched XLA ops per GEMM on
# the dynamic-quantize chain feeding it (norm -> gather -> per-group absmax
# -> scale -> round -> concats), ~5-6 us each on v5e.  These variants take
# the float activation directly and quantize it into VMEM scratch at grid
# step 0 — the TPU analog of the reference fusing the quantize epilogue of
# the PRODUCER into each kernel (``RMSNorm.cuh:67-200``, ``Reorder.cuh:
# 109-189``); here it is a prologue of the CONSUMER, which additionally
# keeps the codes in VMEM.
#
# RMSNorm note: the channel gather stays in XLA (a lane permutation inside
# Mosaic is not cheap), but the NORM can move in-kernel even though it runs
# before the gather — rms statistics are permutation-invariant, so
# ``gather(rmsnorm(x, w)) == rmsnorm_nw(gather(x)) * gather(w)`` with the
# row rsqrt computed from the gathered values.  Callers pass the PRE-GATHERED
# norm weight (``w[reorder_idx]``, precomputed at init) and the gathered x.
# The bf16 round-trip between the rsqrt-multiply and the weight-multiply
# matches ``models.nn.rmsnorm`` exactly (f32 statistics, bf16 cast, f32
# weight product).


def _quant_block_sym(x, bits, clip_ratio):
    """``quantize_groups(..., sym=True)`` on one [tm, 128] f32 block.

    Bitwise the same math: absmax (exact, order-free), optional clip,
    scale = max/qmax, round, clamp.  Returns (int8 codes, f32 scale [tm,1]).
    """
    from atom_tpu.quant.core import _EPS

    qmax = 2 ** (bits - 1) - 1
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), _EPS)
    if clip_ratio < 1.0:
        amax = amax * clip_ratio
    scale = amax / qmax
    codes = jnp.clip(jnp.round(x / scale), -(qmax + 1), qmax)
    return codes.astype(jnp.int8), scale


def _rp(v, dt):
    """Round f32 values to ``dt``'s precision, staying f32-typed.

    bf16 uses integer round-to-nearest-even bit math (bitwise == XLA's
    f32->bf16 convert for finite/inf inputs — NOT for NaNs: a small-payload
    NaN like 0x7F800001 rounds to +/-Inf, so epilogue call sites that can
    see NaN accumulators, e.g. from a corrupt checkpoint, propagate Inf
    where the unfused chain propagates NaN) because a plain astype
    round-trip is elidable and ``lax.reduce_precision`` has no Mosaic
    lowering.  Sub-32-bit dtypes other than bf16 (fp16) are rejected at
    trace time: reduce_precision would fail to lower in Mosaic anyway,
    this just fails loudly and early (ADVICE r4)."""
    fi = jnp.finfo(dt)
    if fi.bits >= 32:
        return v
    assert dt == jnp.bfloat16, (
        f"_rp: unsupported sub-32-bit dtype {dt} inside a Pallas kernel "
        "(only bf16 has a Mosaic-lowerable pinned rounding)"
    )
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    u = (
        u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    ) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _quant_prologue(
    y_ref, wg_ref, qy_ref, qs_ref, *, ngy, abits, a_clip, eps, rstd_ref=None
):
    """Dual-path dynamic quantization of a float activation block into VMEM.

    ``quantize_activation_packed`` semantics bit for bit: per-128-group INT4
    body with clip + per-token INT8 keeper (final 128 channels), scales in
    ``qs_ref`` columns 0..ngy-1 (body) and ngy (keeper).  With ``wg_ref``
    the RMSNorm runs first (see module comment above).

    ``rstd_ref`` (f32 [tm, 1]): the norm's reciprocal std computed OUTSIDE
    the kernel in XLA.  The in-kernel variance reduction and rsqrt are the
    two ops whose Mosaic lowering differs from XLA at the ulp level; those
    rare input-code flips AMPLIFY through downstream dynamic act-block
    scales (a flipped absmax rescales all 128 codes of its block — measured
    8.8% of fused-MLP outputs beyond rtol 5e-2/atol 1.0 at 7B geometry).
    With the statistic hoisted, every remaining in-kernel op (f32 multiply,
    integer-math bf16 rounding, the quant divide) is hardware-probe-clean
    BITWISE vs the unfused XLA chain (scripts/probe_mlp_bisect.py).
    """
    y32 = y_ref[:].astype(jnp.float32)
    if y_ref.dtype == jnp.bfloat16:
        # pin the input's bf16 dtype contract: identity on hardware (the
        # kernel boundary materialized bf16), forces the rounding in
        # interpret mode where the inlined astype round-trip is elidable
        y32 = _rp(y32, jnp.bfloat16)
    if wg_ref is not None:
        # exact ``models.nn.rmsnorm`` numerics: f32 statistics, round to the
        # hidden dtype, weight product rounded to the weight dtype.  astype
        # round-trips (f32 -> bf16 -> f32) get ELIDED by the compiler inside
        # a fused kernel program, which silently skips the rounding the
        # unfused path applies (measured: 1-bf16-ulp fuzz flipping ~2% of
        # INT4 codes), and ``lax.reduce_precision`` has no Mosaic lowering —
        # so the bf16 rounding is integer bit math (round-to-nearest-even,
        # bitwise == XLA's f32->bf16 convert for finite/inf inputs; NaN
        # payloads may differ, and no NaN reaches the norm prologue).
        rp = _rp

        if rstd_ref is not None:
            rstd = rstd_ref[:]
        else:
            var = jnp.mean(y32 * y32, axis=1, keepdims=True)
            rstd = jax.lax.rsqrt(var + eps)
        xn = rp(y32 * rstd, y_ref.dtype)
        y32 = rp(xn * wg_ref[:].astype(jnp.float32), wg_ref.dtype)
    for k in range(ngy):
        codes, scale = _quant_block_sym(
            y32[:, k * GROUP : (k + 1) * GROUP], abits, a_clip
        )
        qy_ref[:, k * GROUP : (k + 1) * GROUP] = codes
        qs_ref[:, k : k + 1] = scale
    codes, scale = _quant_block_sym(y32[:, ngy * GROUP :], 8, 1.0)
    qy_ref[:, ngy * GROUP :] = codes
    qs_ref[:, ngy : ngy + 1] = scale


def _gemm_fused_in_kernel(
    y_ref,      # float [tm, K] — gathered (reordered) activation
    wg_ref,     # f32 [1, K] gathered norm weight, or None
    rstd_ref,   # f32 [tm, 1] XLA-computed norm rstd, or None
    resid_ref,  # [tm, tn] residual tile, or None
    wp_ref, wk_ref, sw_ref,
    out_ref,    # [tm, tn]
    qy_ref,     # int8 [tm, K] scratch
    qs_ref,     # f32 [tm, 128] scratch
    *,
    ng: int,
    abits: int,
    a_clip: float,
    eps: float,
):
    @pl.when(pl.program_id(1) == 0)
    def _quantize():
        _quant_prologue(
            y_ref, wg_ref, qy_ref, qs_ref,
            ngy=ng, abits=abits, a_clip=a_clip, eps=eps,
            rstd_ref=rstd_ref,
        )

    acc = _acc_body_keeper(qy_ref, qs_ref, wp_ref, wk_ref, sw_ref,
                           out_ref.shape, ng)
    if resid_ref is not None:
        # Pin the GEMM-output rounding BEFORE the residual add (non-elidable
        # _rp): the unfused chain rounds quant_gemm_packed's f32 out to bf16
        # and then adds — an elidable astype here lets the compiler fold the
        # add into f32 and round once, a 1-ulp difference that AMPLIFIES
        # through the next layer's dynamic act scales.  NaN caveat: a NaN
        # accumulator (corrupt checkpoint / overflow) becomes Inf through
        # _rp's bit math where the unfused chain propagates NaN — both are
        # loud non-finite failures (see _rp docstring).
        out_ref[:] = (
            resid_ref[:].astype(jnp.float32) + _rp(acc, out_ref.dtype)
        ).astype(out_ref.dtype)
    else:
        out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("abits", "a_clip", "eps", "out_dtype", "tile_n",
                     "interpret"),
)
def packed_w4_gemm_fused_in(
    y: jnp.ndarray,            # float [M, K] — gathered activation
    kw: KernelPackedWeight,    # K -> N
    norm_w: jnp.ndarray = None,  # f32 [K] — GATHERED norm weight (w[ridx])
    rstd: jnp.ndarray = None,    # f32 [M, 1] — XLA-computed norm rstd
    resid: jnp.ndarray = None,   # [M, N] — residual added in-kernel
    abits: int = 4,
    a_clip: float = 1.0,
    eps: float = 1e-5,
    out_dtype=jnp.bfloat16,
    tile_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """4-bit GEMM with the dynamic quantization (+ optional RMSNorm) fused
    in as a grid-step-0 prologue.  Decode shapes (M <= 256, ng <= 112)."""
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    m, ktot = y.shape
    wp, wk = kw.body_packed, kw.keeper
    sw = jnp.concatenate([kw.body_scale, kw.keeper_scale[None, :]], axis=0)
    n = wp.shape[1]
    kb = ktot - GROUP
    ng = kb // GROUP
    assert ng <= _KBLK_THRESHOLD, "deep-K fused-in path not implemented"
    if resid is not None:
        assert resid.shape == (m, n)
        out_dtype = resid.dtype
    tn = min(tile_n, _round_up(n, 128))
    tm = min(256, _round_up(m, 32))
    pad_m = _round_up(m, tm) - m
    pad_n = _round_up(n, tn) - n
    if pad_m:
        y = jnp.pad(y, ((0, pad_m), (0, 0)))
        if rstd is not None:
            rstd = jnp.pad(rstd, ((0, pad_m), (0, 0)))
        if resid is not None:
            resid = jnp.pad(resid, ((0, pad_m), (0, 0)))
    if pad_n:
        wp = jnp.pad(wp, ((0, 0), (0, pad_n)))
        wk = jnp.pad(wk, ((0, 0), (0, pad_n)))
        sw = jnp.pad(sw, ((0, 0), (0, pad_n)))
        if resid is not None:
            resid = jnp.pad(resid, ((0, 0), (0, pad_n)))
    mp, np_ = m + pad_m, n + pad_n

    kernel = functools.partial(
        _gemm_fused_in_kernel, ng=ng, abits=abits, a_clip=a_clip, eps=eps,
    )
    specs = [pl.BlockSpec((tm, ktot), lambda i, j: (i, 0))]
    args = [y]
    if norm_w is not None:
        specs.append(pl.BlockSpec((1, ktot), lambda i, j: (0, 0)))
        args.append(norm_w.reshape(1, ktot))
    if rstd is not None:
        assert norm_w is not None, "rstd only meaningful with norm_w"
        specs.append(pl.BlockSpec((tm, 1), lambda i, j: (i, 0)))
        args.append(rstd)
    if resid is not None:
        specs.append(pl.BlockSpec((tm, tn), lambda i, j: (i, j)))
        args.append(resid)

    def body(*refs):
        off = 1
        wg_ref = refs[off] if norm_w is not None else None
        off += norm_w is not None
        rstd_ref = refs[off] if rstd is not None else None
        off += rstd is not None
        resid_ref = refs[off] if resid is not None else None
        off += resid is not None
        return kernel(
            refs[0], wg_ref, rstd_ref, resid_ref, *refs[off : off + 3],
            refs[off + 3], refs[off + 4], refs[off + 5],
        )

    out = pl.pallas_call(
        body,
        grid=(mp // tm, np_ // tn),
        in_specs=specs + [
            pl.BlockSpec((kb // 2, tn), lambda i, j: (0, j)),
            pl.BlockSpec((GROUP, tn), lambda i, j: (0, j)),
            pl.BlockSpec((ng + 1, tn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, ktot), jnp.int8),
            pltpu.VMEM((tm, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * ktot,
            bytes_accessed=2 * mp * ktot + (kb // 2 + GROUP) * np_
            + 4 * mp * np_,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args, wp, wk, sw)
    return out[:m, :n]


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
    if out_dtype == jnp.bfloat16:
        # pin the rounding: a bare astype feeding a downstream add is an
        # elidable convert under --xla_allow_excess_precision, making the
        # residual sum round once instead of twice (1-ulp nondeterminism
        # vs the fused kernels' in-kernel epilogues)
        out = jax.lax.reduce_precision(out, 8, 7)
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


# ---------------------------------------------------------------------------
# Fused qkv projection: GEMM + RoPE + per-head asymmetric KV quantization
# ---------------------------------------------------------------------------
#
# The decode hot path's single biggest XLA-op cluster after the GEMMs is the
# qkv epilogue (slice q/k/v, rope q and k, per-head min/max quantize k and v:
# ~15 small ops, ~90us/layer of dispatch tax at batch 32).  This variant runs
# it inside the GEMM's output tiles: the q and k column regions are rotated
# with per-row cos/sin blocks, and the k/v regions emit u4 codes + per-head
# (scale, zero_val) directly — the fused-o4 idea of the reference's
# ``DenseLayerGEMM_i4_o4.cu`` generalized to the whole fused qkv projection.
#
# Column regions must be tile-aligned: n_q % tile_n == 0 and n_kv % tile_n
# == 0 (true for the Llama geometries; callers fall back to the unfused path
# otherwise).


def _gemm_qkv_kernel(
    cos_ref, sin_ref,  # f32 [tm, head_dim]
    a_ref, wp_ref, wk_ref, sa_ref, sw_ref,
    out_ref,    # bf16 [tm, tn] — RoPE'd q (q region; garbage elsewhere)
    codes_ref,  # int8 [tm, tn] — u4 K/V codes (k/v regions)
    prm_ref,    # f32 [tm, 128] — lanes 2h / 2h+1 = head h's (scale, zero)
    *,
    ng: int,
    head_dim: int,
    n_q_tiles: int,
    n_k_tiles: int,
):
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
    acc_k = _DOT_I32(a_ref[:, ng * GROUP : (ng + 1) * GROUP], wk_ref[:])
    acc += (
        acc_k.astype(jnp.float32)
        * sa_ref[:, ng : ng + 1]
        * sw_ref[ng : ng + 1, :]
    )

    j = pl.program_id(1)
    heads = out_ref.shape[1] // head_dim
    half = head_dim // 2
    cos = cos_ref[:]
    sin = sin_ref[:]

    def roped():
        parts = []
        for h in range(heads):
            blk = acc[:, h * head_dim : (h + 1) * head_dim]
            rot = jnp.concatenate([-blk[:, half:], blk[:, :half]], axis=1)
            parts.append(blk * cos + rot * sin)
        return jnp.concatenate(parts, axis=1)

    def quantize(x):
        codes_parts, prm = [], jnp.zeros(prm_ref.shape, jnp.float32)
        for h in range(heads):
            blk = x[:, h * head_dim : (h + 1) * head_dim]
            xmax = jnp.max(blk, axis=1, keepdims=True)
            xmin = jnp.min(blk, axis=1, keepdims=True)
            # bf16-rounded scale/zero_val, matching quantize_kv_asym: the
            # paged cache stores params in bf16, so rounding here keeps
            # every consumer (prefill math, hot ring, decode kernel) on
            # bit-identical values.
            scale = jnp.maximum(xmax - xmin, 1e-5) / 15.0
            scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
            zero = jnp.clip(jnp.round(-xmin / scale), 0.0, 15.0)
            codes_parts.append(
                jnp.clip(jnp.round(blk / scale) + zero, 0.0, 15.0).astype(jnp.int8)
            )
            zero_val = (-zero * scale).astype(jnp.bfloat16).astype(jnp.float32)
            lane = jax.lax.broadcasted_iota(jnp.int32, prm_ref.shape, 1)
            prm = jnp.where(lane == 2 * h, scale, prm)
            prm = jnp.where(lane == 2 * h + 1, zero_val, prm)
        return jnp.concatenate(codes_parts, axis=1), prm

    @pl.when(j < n_q_tiles)
    def _q():
        out_ref[:] = roped().astype(out_ref.dtype)
        codes_ref[:] = jnp.zeros(codes_ref.shape, jnp.int8)
        prm_ref[:] = jnp.zeros(prm_ref.shape, jnp.float32)

    @pl.when((j >= n_q_tiles) & (j < n_q_tiles + n_k_tiles))
    def _k():
        codes, prm = quantize(roped())
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
        codes_ref[:] = codes
        prm_ref[:] = prm

    @pl.when(j >= n_q_tiles + n_k_tiles)
    def _v():
        codes, prm = quantize(acc)
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
        codes_ref[:] = codes
        prm_ref[:] = prm


@functools.partial(
    jax.jit,
    static_argnames=("n_q", "n_kv", "head_dim", "tile_n", "interpret"),
)
def packed_w4_gemm_qkv(
    a: jnp.ndarray,   # int8 [M, kb + GROUP]
    wp: jnp.ndarray,  # int8 [kb // 2, N]  (N = n_q + 2 * n_kv)
    wk: jnp.ndarray,  # int8 [GROUP, N]
    sa: jnp.ndarray,  # f32 [M, ng + 1]
    sw: jnp.ndarray,  # f32 [ng + 1, N]
    cos: jnp.ndarray,  # f32 [M, head_dim]
    sin: jnp.ndarray,
    n_q: int,
    n_kv: int,
    head_dim: int = 128,
    tile_n: int = 512,
    interpret: bool = False,
):
    """Fused qkv GEMM for DECODE shapes.  Returns
    (q bf16 [M, n_q] RoPE'd, k_codes [M, n_kv], k_prm f32 [M, n_kv//hd, 2],
     v_codes, v_prm).  K is quantized POST-RoPE, matching the serving cache.
    """
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    m, ktot = a.shape
    n = wp.shape[1]
    kb = ktot - GROUP
    ng = kb // GROUP
    tn = tile_n
    assert n_q % tn == 0 and n_kv % tn == 0 and n == n_q + 2 * n_kv
    n_q_tiles, n_k_tiles = n_q // tn, n_kv // tn
    tm = min(256, _round_up(m, 32))
    pad_m = _round_up(m, tm) - m
    if pad_m:
        a = jnp.pad(a, ((0, pad_m), (0, 0)))
        sa = jnp.pad(sa, ((0, pad_m), (0, 0)))
        cos = jnp.pad(cos, ((0, pad_m), (0, 0)))
        sin = jnp.pad(sin, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    kernel = functools.partial(
        _gemm_qkv_kernel,
        ng=ng,
        head_dim=head_dim,
        n_q_tiles=n_q_tiles,
        n_k_tiles=n_k_tiles,
    )
    n_tiles = n // tn
    out, codes, prm = pl.pallas_call(
        kernel,
        grid=(mp // tm, n_tiles),
        in_specs=[
            pl.BlockSpec((tm, head_dim), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, head_dim), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, ktot), lambda i, j: (i, 0)),
            pl.BlockSpec((kb // 2, tn), lambda i, j: (0, j)),
            pl.BlockSpec((GROUP, tn), lambda i, j: (0, j)),
            pl.BlockSpec((tm, ng + 1), lambda i, j: (i, 0)),
            pl.BlockSpec((ng + 1, tn), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
            pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
            pl.BlockSpec((tm, 128), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
            jax.ShapeDtypeStruct((mp, n), jnp.int8),
            jax.ShapeDtypeStruct((mp, n_tiles * 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(cos, sin, a, wp, wk, sa, sw)

    q = out[:m, :n_q]
    heads_per_tile = tn // head_dim

    def split(codes_region_start, tile0):
        c = codes[:m, codes_region_start : codes_region_start + n_kv]
        c = c.reshape(m, n_kv // head_dim, head_dim)
        pr = prm[:m, tile0 * 128 : (tile0 + n_k_tiles) * 128]
        pr = pr.reshape(m, n_k_tiles, 128)[:, :, : 2 * heads_per_tile]
        pr = pr.reshape(m, n_k_tiles * heads_per_tile, 2)
        return c, pr

    k_codes, k_prm = split(n_q, n_q_tiles)
    v_codes, v_prm = split(n_q + n_kv, n_q_tiles + n_k_tiles)
    return q, k_codes, k_prm, v_codes, v_prm


# ---------------------------------------------------------------------------
# Fused qkv projection with DIRECT hot-ring stores (decode path)
# ---------------------------------------------------------------------------
#
# ``packed_w4_gemm_qkv`` still hands its K/V codes to ``kv_hot.write_hot`` —
# 4 dynamic-update-slices plus the q/k/v slicing-and-reshaping glue, ~10-12
# dispatched XLA ops per layer (~5-6 us each on v5e).  This variant stores
# the quantized K/V *into the ring buffers from inside the GEMM kernel*:
# the ring arrays are aliased in/out (same trick as
# ``pallas_decode.flush_hot_pallas``); the TPU analog of the reference
# writing its o4 epilogue straight to the KV cache feed
# (``DenseLayerGEMM_i4_o4.cu:728-775``).
#
# Ring layout (round 3, see ``kv_hot``): K channel-packed [B, H, D/2, W]
# with the ring axis on LANES (write = masked select at lane ``row`` of a
# resident block), params merged bf16 [B, 4, H, W] (one block, constant
# index map, accumulated across the K/V j-tiles, written back once at grid
# end), V unpacked [B, H, W, D] with the ring axis blocked in groups of 8
# SUBLANES (write at sublane row % 8 of block row // 8).
#
# Out-block lifecycle (n-axis grid is "arbitrary", blocks write back when
# their index map changes): the prm block and the first k/v code blocks are
# PRIMED from the aliased ring at j == 0, every k/v code block is fully
# rewritten at its own j, and prm planes accumulate over the k/v j's — so
# each block's final write-back holds new codes for this row and old data
# nowhere it shouldn't.


def _kv_quantize_tile(x, head_dim):
    """Per-head asym u4 quantize of a [tm, heads*head_dim] tile.

    Returns (codes per head list, scale [tm,1] list, zero_val [tm,1] list);
    bf16-rounded params exactly matching ``reference.quantize_kv_asym``.
    """
    heads = x.shape[1] // head_dim
    codes, scales, zeros = [], [], []
    for h in range(heads):
        blk = x[:, h * head_dim : (h + 1) * head_dim]
        xmax = jnp.max(blk, axis=1, keepdims=True)
        xmin = jnp.min(blk, axis=1, keepdims=True)
        scale = jnp.maximum(xmax - xmin, 1e-5) / 15.0
        scale = scale.astype(jnp.bfloat16).astype(jnp.float32)
        zero = jnp.clip(jnp.round(-xmin / scale), 0.0, 15.0)
        # int32 carriers: Mosaic only lowers non-no-op dim insertion
        # (``x[:, :, None]`` broadcasts at the store sites below) for 32-bit
        # types — the ring stores narrow to int8 AFTER the broadcast/select.
        codes.append(
            jnp.clip(jnp.round(blk / scale) + zero, 0.0, 15.0).astype(
                jnp.int32
            )
        )
        zeros.append((-zero * scale).astype(jnp.bfloat16).astype(jnp.float32))
        scales.append(scale)
    return codes, scales, zeros


def _qkv_ring_epilogue(
    row, acc, cos_ref, sin_ref, kc_in, prm_in, vc_in,
    q_ref, kc_ref, prm_ref, vc_ref,
    *,
    head_dim: int,
    n_q_tiles: int,
    n_k_tiles: int,
):
    """RoPE + per-head KV quantize + ring stores, shared by the int-input
    and float-input (fused norm+quant prologue) qkv-ring kernels."""
    j = pl.program_id(1)
    # V blocks Mosaic-block the ring axis in groups of 8 SUBLANES; the K and
    # prm blocks keep the ring axis on LANES (full W) and mask at lane row.
    row_sub = row % 8

    @pl.when(j == 0)
    def _prime():
        prm_ref[:] = prm_in[:]

    heads = q_ref.shape[1] // head_dim
    half = head_dim // 2
    cos = cos_ref[:]
    sin = sin_ref[:]

    def roped():
        parts = []
        for h in range(heads):
            blk = acc[:, h * head_dim : (h + 1) * head_dim]
            rot = jnp.concatenate([-blk[:, half:], blk[:, :half]], axis=1)
            parts.append(blk * cos + rot * sin)
        return jnp.concatenate(parts, axis=1)

    w_ring = kc_ref.shape[3]
    n_h = prm_ref.shape[2]
    half = head_dim // 2

    def store_prm(scales, zeros, tile0, plane0):
        """Write (scale, zero) of this tile's heads into planes
        (plane0, plane0+1) at lane ``row`` of the resident prm block."""
        hsub = jax.lax.broadcasted_iota(jnp.int32, (1, n_h, w_ring), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_h, w_ring), 2)
        s_pl = prm_ref[:, plane0]      # [tm, H, W]
        z_pl = prm_ref[:, plane0 + 1]
        for h in range(heads):
            gh = (j - tile0) * heads + h
            mask = (hsub == gh) & (lane == row)
            s_pl = jnp.where(mask, scales[h][:, :, None], s_pl)
            z_pl = jnp.where(mask, zeros[h][:, :, None], z_pl)
        prm_ref[:, plane0] = s_pl.astype(prm_ref.dtype)
        prm_ref[:, plane0 + 1] = z_pl.astype(prm_ref.dtype)

    @pl.when(j < n_q_tiles)
    def _q():
        q_ref[:] = roped().astype(q_ref.dtype)

    @pl.when((j >= n_q_tiles) & (j < n_q_tiles + n_k_tiles))
    def _k():
        codes, scales, zeros = _kv_quantize_tile(roped(), head_dim)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[0], half, w_ring), 2
        )
        for h in range(heads):
            cu = codes[h]  # int32 [tm, D] u4 values (0..15)
            packed = cu[:, :half] | (cu[:, half:] << 4)  # 0..255 in i32
            # select in i32 (dim insertion on i8 has no Mosaic lowering),
            # then modular-truncate to i8 — bitwise what the u8 path stored
            kc_ref[:, h] = jnp.where(
                lane == row,
                packed[:, :, None],
                kc_in[:, h].astype(jnp.int32),
            ).astype(jnp.int8)
        store_prm(scales, zeros, n_q_tiles, 0)

    @pl.when(j >= n_q_tiles + n_k_tiles)
    def _v():
        codes, scales, zeros = _kv_quantize_tile(acc, head_dim)
        sub = jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[0], 8, head_dim), 1
        )
        for h in range(heads):
            # write ring row row_sub of this 8-row block; rows pass through
            # from the aliased input otherwise
            vc_ref[:, h] = jnp.where(
                sub == row_sub, codes[h][:, None, :], vc_in[:, h].astype(
                    jnp.int32)
            ).astype(jnp.int8)
        store_prm(scales, zeros, n_q_tiles + n_k_tiles, 2)


def _acc_body_keeper(a_ref, sa_ref, wp_ref, wk_ref, sw_ref, shape, ng):
    """The packed-GEMM group-dot accumulation shared by every decode kernel
    (bit-identical f32 scale-accumulate order across all of them)."""
    acc = jnp.zeros(shape, jnp.float32)
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
    acc_k = _DOT_I32(a_ref[:, ng * GROUP : (ng + 1) * GROUP], wk_ref[:])
    acc += (
        acc_k.astype(jnp.float32)
        * sa_ref[:, ng : ng + 1]
        * sw_ref[ng : ng + 1, :]
    )
    return acc


def _gemm_qkv_ring_kernel(
    row_ref,           # int32 [1] scalar prefetch (drives the V index maps)
    cos_ref, sin_ref,  # f32 [tm, head_dim]
    a_ref, wp_ref, wk_ref, sa_ref, sw_ref,
    kc_in, prm_in, vc_in,   # aliased ring blocks (prime source)
    q_ref,    # bf16 [tm, tn] — RoPE'd q (q region)
    kc_ref,   # int8 [tm, hpt, D/2, W] — channel-packed ring (k region)
    prm_ref,  # bf16 [tm, 4, H, W] — merged affine planes (constant map)
    vc_ref,   # int8 [tm, hpt, 8, D] — ring rows [row8, row8+8) (v region)
    *,
    ng: int,
    head_dim: int,
    n_q_tiles: int,
    n_k_tiles: int,
):
    acc = _acc_body_keeper(a_ref, sa_ref, wp_ref, wk_ref, sw_ref,
                           q_ref.shape, ng)
    _qkv_ring_epilogue(
        row_ref[0], acc, cos_ref, sin_ref, kc_in, prm_in, vc_in,
        q_ref, kc_ref, prm_ref, vc_ref,
        head_dim=head_dim, n_q_tiles=n_q_tiles, n_k_tiles=n_k_tiles,
    )


def _gemm_qkv_ring_fused_kernel(
    row_ref,
    cos_ref, sin_ref,
    y_ref,    # float [tm, K] — gathered hidden (pre-norm)
    wg_ref,   # f32 [1, K] — gathered attn norm weight
    rstd_ref,  # f32 [tm, 1] — XLA-computed norm rstd
    wp_ref, wk_ref, sw_ref,
    kc_in, prm_in, vc_in,
    q_ref, kc_ref, prm_ref, vc_ref,
    qy_ref,   # int8 [tm, K] scratch
    qs_ref,   # f32 [tm, 128] scratch
    *,
    ng: int,
    head_dim: int,
    n_q_tiles: int,
    n_k_tiles: int,
    abits: int,
    a_clip: float,
    eps: float,
):
    """qkv-ring GEMM with the RMSNorm + dynamic quantization fused in as the
    grid-step-0 prologue — the only XLA op left ahead of it in the decode
    layer is the reorder gather."""

    @pl.when(pl.program_id(1) == 0)
    def _quantize():
        _quant_prologue(
            y_ref, wg_ref, qy_ref, qs_ref,
            ngy=ng, abits=abits, a_clip=a_clip, eps=eps,
            rstd_ref=rstd_ref,
        )

    acc = _acc_body_keeper(qy_ref, qs_ref, wp_ref, wk_ref, sw_ref,
                           q_ref.shape, ng)
    _qkv_ring_epilogue(
        row_ref[0], acc, cos_ref, sin_ref, kc_in, prm_in, vc_in,
        q_ref, kc_ref, prm_ref, vc_ref,
        head_dim=head_dim, n_q_tiles=n_q_tiles, n_k_tiles=n_k_tiles,
    )


def _qkv_ring_pallas_call(
    kernel, gemm_specs, gemm_args, *, m, n_q, n_kv, tn, head_dim,
    cos, sin, k_codes, prm, v_codes, row, scratch_shapes=None,
    interpret=False,
):
    """Shared plumbing for the qkv->hot-ring GEMM variants: geometry checks,
    the ring block specs (k / prm / v regions keyed off the column-tile
    index), the aliased ring outputs, and the grid.  ``gemm_specs`` /
    ``gemm_args`` are the variant's activation+weight inputs; the ring
    aliases are keyed off their count."""
    n = n_q + 2 * n_kv
    assert len(gemm_specs) == len(gemm_args)
    assert k_codes.shape[0] == m, "ring batch must equal GEMM M (no padding)"
    assert m % 32 == 0, "decode batch must be sublane-aligned"
    # grid = m // tm with tm = min(256, m): a non-multiple m > 256 would
    # silently drop the tail rows (q uninitialized, ring columns stale)
    assert m <= 256 or m % 256 == 0, "decode batch > 256 must be 256-aligned"
    n_q_tiles, n_k_tiles = n_q // tn, n_kv // tn
    hpt = tn // head_dim
    n_h = prm.shape[2]
    w_ring = k_codes.shape[3]
    assert w_ring % 8 == 0, "ring window must be 8-row blockable"
    tm = min(256, m)
    n_tiles = n // tn

    def kc_map(i, j, row_ref):
        return (i, jnp.clip(j - n_q_tiles, 0, n_k_tiles - 1), 0, 0)

    def vc_map(i, j, row_ref):
        return (
            i, jnp.clip(j - n_q_tiles - n_k_tiles, 0, n_k_tiles - 1),
            row_ref[0] // 8, 0,
        )

    kc_spec = pl.BlockSpec((tm, hpt, head_dim // 2, w_ring), kc_map)
    prm_spec = pl.BlockSpec((tm, 4, n_h, w_ring), lambda i, j, r: (i, 0, 0, 0))
    vc_spec = pl.BlockSpec((tm, hpt, 8, head_dim), vc_map)

    grid_kwargs = dict(
        num_scalar_prefetch=1,
        grid=(m // tm, n_tiles),
        in_specs=[
            pl.BlockSpec((tm, head_dim), lambda i, j, r: (i, 0)),
            pl.BlockSpec((tm, head_dim), lambda i, j, r: (i, 0)),
            *gemm_specs,
            kc_spec, prm_spec, vc_spec,
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda i, j, r: (i, jnp.minimum(j, n_q_tiles - 1))),
            kc_spec, prm_spec, vc_spec,
        ],
    )
    if scratch_shapes is not None:
        grid_kwargs["scratch_shapes"] = scratch_shapes

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(**grid_kwargs),
        out_shape=[
            jax.ShapeDtypeStruct((m, n_q), jnp.bfloat16),
            jax.ShapeDtypeStruct(k_codes.shape, jnp.int8),
            jax.ShapeDtypeStruct(prm.shape, jnp.bfloat16),
            jax.ShapeDtypeStruct(v_codes.shape, jnp.int8),
        ],
        # ring inputs follow 1 prefetch + cos/sin + the GEMM inputs;
        # they alias outputs 1..3 (the updated ring)
        input_output_aliases={
            3 + len(gemm_args) + k: 1 + k for k in range(3)
        },
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(row, jnp.int32).reshape(1), cos, sin, *gemm_args,
      k_codes, prm, v_codes)


@functools.partial(
    jax.jit,
    static_argnames=("n_q", "n_kv", "head_dim", "tile_n", "interpret"),
    donate_argnames=("k_codes", "prm", "v_codes"),
)
def packed_w4_gemm_qkv_ring(
    a: jnp.ndarray,   # int8 [M, kb + GROUP]
    wp: jnp.ndarray,  # int8 [kb // 2, N]  (N = n_q + 2 * n_kv)
    wk: jnp.ndarray,  # int8 [GROUP, N]
    sa: jnp.ndarray,  # f32 [M, ng + 1]
    sw: jnp.ndarray,  # f32 [ng + 1, N]
    cos: jnp.ndarray,  # f32 [M, head_dim]
    sin: jnp.ndarray,
    k_codes: jnp.ndarray,  # int8 [M, H, D/2, W] — hot ring (donated)
    prm: jnp.ndarray,      # bf16 [M, 4, H, W]
    v_codes: jnp.ndarray,  # int8 [M, H, W, D]
    row: jnp.ndarray,      # int32 scalar — ring column to write
    n_q: int,
    n_kv: int,
    head_dim: int = 128,
    tile_n: int = 512,
    interpret: bool = False,
):
    """Decode-shape fused qkv GEMM storing K/V straight into the hot ring.

    Returns (q bf16 [M, n_q] RoPE'd, k_codes', prm', v_codes') — the
    page-layout ring arrays (see ``kv_hot``) updated in place (aliased) at
    ring column ``row``.  M must equal the ring's batch dim.
    """
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    m, ktot = a.shape
    n = wp.shape[1]
    kb = ktot - GROUP
    ng = kb // GROUP
    tn = tile_n
    assert n_q % tn == 0 and n_kv % tn == 0 and n == n_q + 2 * n_kv
    tm = min(256, m)

    kernel = functools.partial(
        _gemm_qkv_ring_kernel,
        ng=ng,
        head_dim=head_dim,
        n_q_tiles=n_q // tn,
        n_k_tiles=n_kv // tn,
    )
    q, kc, pr, vc = _qkv_ring_pallas_call(
        kernel,
        gemm_specs=[
            pl.BlockSpec((tm, ktot), lambda i, j, r: (i, 0)),
            pl.BlockSpec((kb // 2, tn), lambda i, j, r: (0, j)),
            pl.BlockSpec((GROUP, tn), lambda i, j, r: (0, j)),
            pl.BlockSpec((tm, ng + 1), lambda i, j, r: (i, 0)),
            pl.BlockSpec((ng + 1, tn), lambda i, j, r: (0, j)),
        ],
        gemm_args=[a, wp, wk, sa, sw],
        m=m, n_q=n_q, n_kv=n_kv, tn=tn, head_dim=head_dim,
        cos=cos, sin=sin, k_codes=k_codes, prm=prm, v_codes=v_codes,
        row=row, interpret=interpret,
    )
    return q, kc, pr, vc


@functools.partial(
    jax.jit,
    static_argnames=("n_q", "n_kv", "head_dim", "abits", "a_clip", "eps",
                     "tile_n", "interpret"),
    donate_argnames=("k_codes", "prm", "v_codes"),
)
def packed_w4_gemm_qkv_ring_fused(
    y: jnp.ndarray,   # float [M, K] — GATHERED hidden (pre-norm)
    norm_w: jnp.ndarray,  # f32 [K] — gathered attn norm weight (w[ridx])
    wp: jnp.ndarray,  # int8 [kb // 2, N]  (N = n_q + 2 * n_kv)
    wk: jnp.ndarray,  # int8 [GROUP, N]
    sw: jnp.ndarray,  # f32 [ng + 1, N]
    cos: jnp.ndarray,  # f32 [M, head_dim]
    sin: jnp.ndarray,
    k_codes: jnp.ndarray,  # int8 [M, H, D/2, W] — hot ring (donated)
    prm: jnp.ndarray,      # bf16 [M, 4, H, W]
    v_codes: jnp.ndarray,  # int8 [M, H, W, D]
    row: jnp.ndarray,      # int32 scalar — ring column to write
    n_q: int,
    n_kv: int,
    head_dim: int = 128,
    abits: int = 4,
    a_clip: float = 1.0,
    eps: float = 1e-5,
    tile_n: int = 512,
    interpret: bool = False,
    rstd: jnp.ndarray = None,  # f32 [M, 1] — XLA-computed norm rstd
):
    """``packed_w4_gemm_qkv_ring`` with the RMSNorm + dual-path dynamic
    quantization fused in as the grid-step-0 prologue (float input).

    ``y`` is the raw hidden state already gathered by the attention reorder
    index; ``norm_w`` is the norm weight gathered by the SAME index (rms
    statistics are permutation-invariant, so norm-after-gather with a
    pre-gathered weight is exact — see the float-input module comment)."""
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    m, ktot = y.shape
    n = wp.shape[1]
    kb = ktot - GROUP
    ng = kb // GROUP
    tn = tile_n
    assert n_q % tn == 0 and n_kv % tn == 0 and n == n_q + 2 * n_kv
    tm = min(256, m)
    if rstd is None:
        # shared pinned statistic (see serving/model._rms_rstd + ADVICE r4)
        from atom_tpu.numerics import rms_rstd

        rstd = rms_rstd(y, eps)

    kernel = functools.partial(
        _gemm_qkv_ring_fused_kernel,
        ng=ng,
        head_dim=head_dim,
        n_q_tiles=n_q // tn,
        n_k_tiles=n_kv // tn,
        abits=abits,
        a_clip=a_clip,
        eps=eps,
    )
    q, kc, pr, vc = _qkv_ring_pallas_call(
        kernel,
        gemm_specs=[
            pl.BlockSpec((tm, ktot), lambda i, j, r: (i, 0)),
            pl.BlockSpec((1, ktot), lambda i, j, r: (0, 0)),
            pl.BlockSpec((tm, 1), lambda i, j, r: (i, 0)),
            pl.BlockSpec((kb // 2, tn), lambda i, j, r: (0, j)),
            pl.BlockSpec((GROUP, tn), lambda i, j, r: (0, j)),
            pl.BlockSpec((ng + 1, tn), lambda i, j, r: (0, j)),
        ],
        gemm_args=[
            y, norm_w.reshape(1, ktot),
            rstd.astype(jnp.float32).reshape(m, 1), wp, wk, sw,
        ],
        m=m, n_q=n_q, n_kv=n_kv, tn=tn, head_dim=head_dim,
        cos=cos, sin=sin, k_codes=k_codes, prm=prm, v_codes=v_codes,
        row=row,
        scratch_shapes=[
            pltpu.VMEM((tm, ktot), jnp.int8),
            pltpu.VMEM((tm, 128), jnp.float32),
        ],
        interpret=interpret,
    )
    return q, kc, pr, vc
