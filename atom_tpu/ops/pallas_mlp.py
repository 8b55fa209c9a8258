"""Pallas TPU kernel: the ENTIRE quantized MLP block as one fused kernel.

Production decode runs, per layer,

    m_in = quantize(rmsnorm-reordered x)          # XLA chain
    gu   = packed_w4_gemm(m_in, W_gateup)         # Pallas
    act  = silu(gate) * up                        # XLA
    d_in = quantize(act)                          # XLA chain
    out  = x + packed_w4_gemm(d_in, W_down)       # Pallas (+XLA add)

i.e. two kernel dispatches, two dynamic-quantization op chains, and an f32
[B, 2*inter] HBM round-trip between them.  At decode batch sizes every one of
those is pure per-op overhead on top of the 4-bit weight stream (the v5e
dispatch tax is ~5 µs/op; the chains are ~10 ops each).  This kernel fuses
the whole block:

    phase 0 (grid step 0):  dual-path dynamic quantization of the normed
        input (per-128-group INT4 body + INT8 keeper) into VMEM scratch —
        the ``quantize_activation_packed`` math, bit for bit;
    phase 1 (steps 0..G1):  gate/up GEMM tiles (the ``_gemm_packed_kernel``
        group-dot structure) reading gate and up columns of the SAME weight
        array through two block windows, then an in-register SiLU·mul and
        per-128-group requantization straight into the act-code scratch —
        the intermediate never touches HBM (``Activate.cuh:68-195`` analog);
    phase 2 (steps G1..G1+G2):  down-proj GEMM tiles consuming the act codes
        from VMEM, keeper dot, scale epilogue, residual add.

The reference implements these as three separate CUDA kernels with the
quantize epilogues fused into each producer (``Dense_layer_gemm_i4_o16.cuh``,
``Activate.cuh``, ``DenseLayerGEMM_i4.cu``); one TPU kernel with a phased
grid goes further — the only per-layer XLA ops left ahead of it are the
rmsnorm and the reorder gather.

Parity: phases 0/2 are bitwise-identical to the unfused path (integer dots
are exact; the f32 scale-accumulate order matches ``_gemm_packed_kernel``;
the quantize math matches ``quantize_activation_packed``).  SiLU may differ
by ~1 ulp between Mosaic and XLA lowerings, which can flip an act code
sitting exactly on a rounding boundary — same caliber as the documented
prefill/decode reassociation noise (tests/test_serving.py:122-127).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atom_tpu.ops.formats import KernelPackedWeight
from atom_tpu.ops.pallas_gemm_packed import (
    _quant_block_sym,
    _quant_prologue,
    _rp,
    _unpack_nibbles,
)

GROUP = 128
HALF = GROUP // 2

_DOT_I32 = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.int32,
)


def _group_dot(qy_ref, qs_ref, wp_ref, sw_ref, ng, tn):
    """The ``_gemm_packed_kernel`` body-group accumulation (bit-identical)."""
    acc = jnp.zeros((qy_ref.shape[0], tn), jnp.float32)
    for g in range(ng):
        w_lo, w_hi = _unpack_nibbles(wp_ref[g * HALF : (g + 1) * HALF, :])
        a_lo = qy_ref[:, g * GROUP : g * GROUP + HALF]
        a_hi = qy_ref[:, g * GROUP + HALF : (g + 1) * GROUP]
        acc_g = _DOT_I32(a_lo, w_lo) + _DOT_I32(a_hi, w_hi)
        acc += (
            acc_g.astype(jnp.float32)
            * qs_ref[:, g : g + 1]
            * sw_ref[g : g + 1, :]
        )
    return acc


def _fused_mlp_kernel(
    y_ref,     # [tm, D] — reordered input (normed here iff wg_ref given)
    wg_ref,    # f32 [1, D] — gathered mlp norm weight, or None
    rstd_ref,  # f32 [tm, 1] — XLA-computed norm rstd, or None
    rs_ref,    # f32 [tm, 1] — per-row output scale (MoE routing), or None
    resid_ref,  # [tm, tn_dn] — residual tile (phase-2 window)
    gwp_ref,   # int8 [ngy*HALF, tn_gu] — gate body planes (window over cols)
    gwk_ref,   # int8 [GROUP, tn_gu] — gate keeper
    gss_ref,   # f32 [ngy, tn_gu] — gate body scales
    gsk_ref,   # f32 [1, tn_gu] — gate keeper scale
    uwp_ref, uwk_ref, uss_ref, usk_ref,   # same, up columns
    dwp_ref,   # int8 [nga*HALF, tn_dn] — down body planes
    dwk_ref,   # int8 [GROUP, tn_dn]
    dss_ref,   # f32 [nga, tn_dn]
    dsk_ref,   # f32 [1, tn_dn]
    out_ref,   # [tm, tn_dn]
    # scratch
    qy_ref,    # int8 [tm, D] — body ++ keeper codes of y
    qs_ref,    # f32 [tm, 128] — cols 0..ngy body scales, col ngy keeper
    qa_ref,    # int8 [G1, tm, tn_gu] — act codes (body ++ keeper layout)
    as_ref,    # f32 [G1, tm, 128] — act scales, cols 0..tn_gu/128 per step
    *,
    d: int,
    inter: int,
    tn_gu: int,
    tn_dn: int,
    abits: int,
    a_clip: float,
    eps: float,
    g1: int,
):
    g = pl.program_id(1)
    ngy = (d - GROUP) // GROUP        # input body groups
    nga = (inter - GROUP) // GROUP    # act body groups
    nblk = tn_gu // GROUP             # act 128-blocks per phase-1 step

    @pl.when(g == 0)
    def _quantize_input():
        _quant_prologue(
            y_ref, wg_ref, qy_ref, qs_ref,
            ngy=ngy, abits=abits, a_clip=a_clip, eps=eps,
            rstd_ref=rstd_ref,
        )

    @pl.when(g < g1)
    def _gateup_tile():
        def one(wp_ref, wk_ref, ss_ref, sk_ref):
            acc = _group_dot(qy_ref, qs_ref, wp_ref, ss_ref, ngy, tn_gu)
            acc_k = _DOT_I32(qy_ref[:, ngy * GROUP :], wk_ref[:])
            return acc + (
                acc_k.astype(jnp.float32)
                * qs_ref[:, ngy : ngy + 1]
                * sk_ref[0:1, :]
            )

        act = jax.nn.silu(one(gwp_ref, gwk_ref, gss_ref, gsk_ref)) * one(
            uwp_ref, uwk_ref, uss_ref, usk_ref
        )  # [tm, tn_gu] f32
        # requantize per 128-block; the block covering the LAST 128 channels
        # of the intermediate is the down-proj keeper (INT8, no clip).
        # inter % tn_gu == 0, so the keeper is exactly the LAST block of the
        # LAST phase-1 step — every other bi is statically pure-body (no
        # select at all), and the one remaining select runs in int32: the
        # current Mosaic has no sub-32-bit lowering for this op family
        # (scalar-pred i8 vselect / i8 dim insertion — the latter is a hard
        # compile error elsewhere; hardware parity failed here before this).
        # Both scratch stores are FULL-TILE at the dynamic leading index g:
        # dynamic-index partial-tile stores (a 128-lane slice of the 256-lane
        # code tile, a single lane of the scale tile) are the other op shape
        # this kernel used and no probe-clean kernel does.
        code_blocks, scale_cols = [], []
        for bi in range(nblk):
            blk = act[:, bi * GROUP : (bi + 1) * GROUP]
            c4, s4 = _quant_block_sym(blk, abits, a_clip)
            if bi < nblk - 1:
                code_blocks.append(c4)
                scale_cols.append(s4)
            else:
                c8, s8 = _quant_block_sym(blk, 8, 1.0)
                is_keeper = g == (g1 - 1)
                code_blocks.append(
                    jnp.where(
                        is_keeper, c8.astype(jnp.int32), c4.astype(jnp.int32)
                    ).astype(jnp.int8)
                )
                scale_cols.append(jnp.where(is_keeper, s8, s4))
        qa_ref[g] = jnp.concatenate(code_blocks, axis=1)
        tm_rows = act.shape[0]
        if nblk < 128:
            scale_cols.append(
                jnp.zeros((tm_rows, 128 - nblk), jnp.float32)
            )
        as_ref[g] = jnp.concatenate(scale_cols, axis=1)

    @pl.when(g >= g1)
    def _down_tile():
        acc = jnp.zeros((out_ref.shape[0], tn_dn), jnp.float32)
        for k in range(nga):
            step, col = (k * GROUP) // tn_gu, (k * GROUP) % tn_gu
            a_k = qa_ref[step, :, col : col + GROUP]
            s_k = as_ref[step, :, col // GROUP : col // GROUP + 1]
            w_lo, w_hi = _unpack_nibbles(dwp_ref[k * HALF : (k + 1) * HALF, :])
            acc_g = _DOT_I32(a_k[:, :HALF], w_lo) + _DOT_I32(a_k[:, HALF:], w_hi)
            acc += acc_g.astype(jnp.float32) * s_k * dss_ref[k : k + 1, :]
        kstep, kcol = ((nga * GROUP) // tn_gu, (nga * GROUP) % tn_gu)
        acc_k = _DOT_I32(qa_ref[kstep, :, kcol : kcol + GROUP], dwk_ref[:])
        acc += (
            acc_k.astype(jnp.float32)
            * as_ref[kstep, :, kcol // GROUP : kcol // GROUP + 1]
            * dsk_ref[0:1, :]
        )
        if rs_ref is not None:
            # MoE expert contribution: resid + w_e * out_e, the same
            # mul-then-add order as the XLA accumulation in ``_moe_mlp``
            out_ref[:] = (
                resid_ref[:].astype(jnp.float32) + rs_ref[:] * acc
            ).astype(out_ref.dtype)
        else:
            # pinned rounding before the residual add — matches the unfused
            # x + quant_gemm_packed(...) chain (see _gemm_fused_in_kernel).
            # NaN accumulators round to Inf through _rp's bit math (vs NaN
            # on the unfused chain) — see _rp's docstring for the caveat.
            out_ref[:] = (
                resid_ref[:].astype(jnp.float32) + _rp(acc, out_ref.dtype)
            ).astype(out_ref.dtype)


def _mlp_body(kernel, has_wg, has_rstd, has_rs, *refs):
    """Adapter injecting None for the absent optional inputs."""
    i = 1
    wg = refs[i] if has_wg else None
    i += has_wg
    rstd = refs[i] if has_rstd else None
    i += has_rstd
    rs = refs[i] if has_rs else None
    i += has_rs
    return kernel(refs[0], wg, rstd, rs, *refs[i:])


def fused_mlp_supported(d: int, inter: int, keeper: int, group: int) -> bool:
    """Geometry gate for the fused path (fallback = the unfused op chain)."""
    return (
        keeper == GROUP
        and group == GROUP
        and d % 512 == 0
        and inter % 256 == 0
        and (inter - GROUP) // GROUP <= 112  # unroll budget (matches _KBLK)
    )


@functools.partial(
    jax.jit,
    static_argnames=("abits", "a_clip", "eps", "tn_gu", "tn_dn", "interpret"),
)
def fused_mlp_packed(
    y: jnp.ndarray,       # [M, D] — mlp-reordered hidden (normed iff norm_w
    resid: jnp.ndarray,   #          is None); resid also sets out dtype
    gu: KernelPackedWeight,   # K=D, N=2*inter (gate columns, then up)
    dn: KernelPackedWeight,   # K=inter, N=D
    norm_w: jnp.ndarray = None,  # f32 [D] — GATHERED mlp norm weight
    rstd: jnp.ndarray = None,    # f32 [M, 1] — XLA-computed norm rstd
    row_scale: jnp.ndarray = None,  # f32 [M] — scales the down output
    abits: int = 4,
    a_clip: float = 1.0,
    eps: float = 1e-5,
    tn_gu: int = 256,
    tn_dn: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """resid + down(quant(silu(gate(quant(y))) * up(quant(y)))) in ONE kernel.

    See module docstring.  ``y`` is quantized in-kernel (INT4 body groups with
    ``a_clip`` + INT8 keeper — ``quantize_activation_packed`` semantics); with
    ``norm_w`` the RMSNorm also moves in-kernel (rms statistics are
    permutation-invariant, so ``y = gather(x)`` + a pre-gathered weight is
    exact); the gate/up product is requantized in-kernel; only the final
    [M, D] residual sum is written to HBM.
    """
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    m, d = y.shape
    n_gu = gu.body_packed.shape[1]
    inter = n_gu // 2
    assert resid.shape == (m, d)
    assert dn.body_packed.shape == ((inter - GROUP) // 2, d)
    assert fused_mlp_supported(d, inter, GROUP, GROUP)
    if d % tn_dn != 0:
        tn_dn = 256 if d % 256 == 0 else GROUP
    if inter % tn_gu != 0:
        tn_gu = GROUP
    if norm_w is not None and rstd is None:
        # XLA-computed norm statistic (see _quant_prologue's rstd note);
        # rms stats are permutation-invariant so the gathered y works.
        # numerics.rms_rstd applies the same bf16 input pin the hoisted
        # serving path applies (ADVICE r4: a bare astype here could see
        # unpinned excess precision under CPU/interpret).
        from atom_tpu.numerics import rms_rstd

        rstd = rms_rstd(y, eps)
    g1 = inter // tn_gu
    g2 = d // tn_dn
    ngy = (d - GROUP) // GROUP
    nga = (inter - GROUP) // GROUP

    tm = 32
    pad_m = (-m) % tm
    if pad_m:
        y = jnp.pad(y, ((0, pad_m), (0, 0)))
        resid = jnp.pad(resid, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    # phase-parked index maps: phase-1 windows clamp to their last block
    # during phase 2 (and vice versa) so Mosaic's revisiting pipeline skips
    # the DMA — each weight byte is fetched exactly once.
    def gu_col(off):  # off in units of tn_gu blocks (up starts at g1)
        return lambda i, g: (0, off + jnp.minimum(g, g1 - 1))

    def dn_col(i, g):
        return (0, jnp.clip(g - g1, 0, g2 - 1))

    def row_dn(i, g):
        return (i, jnp.clip(g - g1, 0, g2 - 1))

    kernel = functools.partial(
        _fused_mlp_kernel,
        d=d, inter=inter, tn_gu=tn_gu, tn_dn=tn_dn,
        abits=abits, a_clip=a_clip, eps=eps, g1=g1,
    )
    body = functools.partial(
        _mlp_body, kernel, norm_w is not None, rstd is not None,
        row_scale is not None,
    )
    head_specs = [pl.BlockSpec((tm, d), lambda i, g: (i, 0))]
    head_args = [y]
    if norm_w is not None:
        head_specs.append(pl.BlockSpec((1, d), lambda i, g: (0, 0)))
        head_args.append(norm_w.reshape(1, d))
    if rstd is not None:
        assert norm_w is not None, "rstd only meaningful with norm_w"
        r_ = rstd.astype(jnp.float32).reshape(-1, 1)
        if pad_m:
            r_ = jnp.pad(r_, ((0, pad_m), (0, 0)))
        head_specs.append(pl.BlockSpec((tm, 1), lambda i, g: (i, 0)))
        head_args.append(r_)
    if row_scale is not None:
        rs = row_scale.astype(jnp.float32).reshape(-1, 1)
        if pad_m:
            rs = jnp.pad(rs, ((0, pad_m), (0, 0)))
        head_specs.append(pl.BlockSpec((tm, 1), lambda i, g: (i, 0)))
        head_args.append(rs)
    out = pl.pallas_call(
        body,
        grid=(mp // tm, g1 + g2),
        in_specs=head_specs + [
            pl.BlockSpec((tm, tn_dn), row_dn),
            # gate windows
            pl.BlockSpec((ngy * HALF, tn_gu), gu_col(0)),
            pl.BlockSpec((GROUP, tn_gu), gu_col(0)),
            pl.BlockSpec((ngy, tn_gu), gu_col(0)),
            pl.BlockSpec((1, tn_gu), gu_col(0)),
            # up windows
            pl.BlockSpec((ngy * HALF, tn_gu), gu_col(g1)),
            pl.BlockSpec((GROUP, tn_gu), gu_col(g1)),
            pl.BlockSpec((ngy, tn_gu), gu_col(g1)),
            pl.BlockSpec((1, tn_gu), gu_col(g1)),
            # down windows
            pl.BlockSpec((nga * HALF, tn_dn), dn_col),
            pl.BlockSpec((GROUP, tn_dn), dn_col),
            pl.BlockSpec((nga, tn_dn), dn_col),
            pl.BlockSpec((1, tn_dn), dn_col),
        ],
        out_specs=pl.BlockSpec((tm, tn_dn), row_dn),
        out_shape=jax.ShapeDtypeStruct((mp, d), resid.dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, d), jnp.int8),
            pltpu.VMEM((tm, 128), jnp.float32),
            pltpu.VMEM((g1, tm, tn_gu), jnp.int8),
            pltpu.VMEM((g1, tm, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * (n_gu * d + inter * d),
            bytes_accessed=(d // 2) * n_gu + (inter // 2) * d + 6 * mp * d,
            transcendentals=mp * inter,
        ),
        interpret=interpret,
    )(
        *head_args, resid,
        gu.body_packed, gu.keeper, gu.body_scale,
        gu.keeper_scale.reshape(1, -1),
        gu.body_packed, gu.keeper, gu.body_scale,
        gu.keeper_scale.reshape(1, -1),
        dn.body_packed, dn.keeper, dn.body_scale,
        dn.keeper_scale.reshape(1, -1),
    )
    return out[:m]
