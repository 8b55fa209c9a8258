#!/usr/bin/env python
"""Bisect the fused-MLP [mlp0] hardware divergence INSIDE the kernel body.

probe_fused_divergence.py (round 3/4) establishes: the quant/norm prologues
are probe-clean on hardware, but fused_mlp_packed diverges ~9-13% even with
the input pre-normed ([mlp0]).  The remaining ingredients, isolated here
cheapest-first — each probe is a cut-down Pallas kernel vs the exact unfused
XLA oracle at 7B geometry (d=4096, inter=11008, tm=32, tn_gu=256):

  p1        phase-1 compute ONLY: in-kernel input quant + gate/up group
            dots through DUAL WINDOWS over one [K/2, 2*inter] weight array
            + silu*mul, act written straight to HBM (no scratch, no
            phase parking, no phase-2).
  p1split   same kernel, gate and up as SEPARATE arrays (aliasing control).
  roundtrip act quantization into the [g1, tm, 256] VMEM scratch at the
            DYNAMIC leading grid index g (incl. the int32 keeper select),
            read back + dequantized at the final grid step.  Tests the
            dynamic-index 3D scratch store path in isolation.
  parked    p1 grid extended with g2 trailing steps whose gate/up windows
            CLAMP (phase parking) while down-proj windows advance — the
            revisiting-pipeline pattern of the real kernel, compute
            unchanged.  Diverges iff the multi-phase window clamping is
            what breaks.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/probe_mlp_bisect.py [--probes p1,p1split,roundtrip,parked]
"""
import argparse
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atom_tpu.config import ATOM_W4A4
from atom_tpu.ops.formats import (
    KernelPackedWeight,
    pack_for_kernel,
    quantize_activation_packed,
    quantize_weight_packed,
)
from atom_tpu.ops.pallas_gemm_packed import _quant_prologue
from atom_tpu.ops.pallas_mlp import _DOT_I32, _group_dot
from atom_tpu.ops.pallas_gemm_packed import quant_gemm_packed

from atom_tpu.ops.runtime import interpret_default

SPEC = ATOM_W4A4
INTERPRET = interpret_default(False)
GROUP = 128
HALF = 64
D = 4096
INTER = 11008
TM = 32
TN_GU = 256
M = 32


def report(name, got, want, rtol=5e-2, atol=1.0):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    diff = np.abs(got - want)
    tol = atol + rtol * np.abs(want)
    bad = diff > tol
    print(
        f"[{name}] mismatch>{rtol}/{atol}: {bad.mean():.4%}  "
        f"max|d|: {diff.max():.4f}  bitwise-equal: {np.mean(got == want):.4%}",
        flush=True,
    )
    return bad.mean()


def _mats():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    gu = pack_for_kernel(quantize_weight_packed(
        jax.random.normal(ks[0], (D, 2 * INTER), jnp.float32) * 0.03, SPEC))
    # pre-normed input, like probe_mlp0
    y = (jax.random.normal(ks[2], (M, D), jnp.float32) * 0.5).astype(
        jnp.float32)
    return gu, y


def _split_gu(gu):
    """Materialize separate gate / up packed weights from the fused array."""
    return (
        KernelPackedWeight(
            body_packed=gu.body_packed[:, :INTER],
            body_scale=gu.body_scale[:, :INTER],
            keeper=gu.keeper[:, :INTER],
            keeper_scale=gu.keeper_scale[:INTER],
        ),
        KernelPackedWeight(
            body_packed=gu.body_packed[:, INTER:],
            body_scale=gu.body_scale[:, INTER:],
            keeper=gu.keeper[:, INTER:],
            keeper_scale=gu.keeper_scale[INTER:],
        ),
    )


def _oracle_act(y, gu):
    """Unfused: quant -> fused-array GEMM -> silu*mul, f32 [M, INTER]."""
    q = quantize_activation_packed(y, SPEC)
    g_ = quant_gemm_packed(q, gu, out_dtype=jnp.float32)
    return jax.nn.silu(g_[:, :INTER]) * g_[:, INTER:]


# ---------------------------------------------------------------- p1 / p1split


def _p1_kernel(
    y_ref, gwp, gwk, gss, gsk, uwp, uwk, uss, usk, out_ref,
    qy_ref, qs_ref, *, ngy, abits, a_clip, eps, tn_gu,
):
    @pl.when(pl.program_id(1) == 0)
    def _q():
        _quant_prologue(
            y_ref, None, qy_ref, qs_ref,
            ngy=ngy, abits=abits, a_clip=a_clip, eps=eps,
        )

    def one(wp_ref, wk_ref, ss_ref, sk_ref):
        acc = _group_dot(qy_ref, qs_ref, wp_ref, ss_ref, ngy, tn_gu)
        acc_k = _DOT_I32(qy_ref[:, ngy * GROUP :], wk_ref[:])
        return acc + (
            acc_k.astype(jnp.float32)
            * qs_ref[:, ngy : ngy + 1]
            * sk_ref[0:1, :]
        )

    out_ref[:] = jax.nn.silu(one(gwp, gwk, gss, gsk)) * one(
        uwp, uwk, uss, usk
    )


def _run_p1(y, gate, up, up_off_blocks, parked_g2=0):
    """gate/up may be views of ONE array (dual-window) or separate arrays.

    up_off_blocks: up columns' offset in units of TN_GU blocks inside the
    `up` array (INTER//TN_GU when both windows share the fused array, 0
    when split).  parked_g2 > 0 appends g2 grid steps during which the
    gate/up windows clamp to their last block (phase parking) — out rows
    also clamp, so trailing steps rewrite the last block with identical
    values iff the clamped windows still read the right data.
    """
    ngy = (D - GROUP) // GROUP
    g1 = INTER // TN_GU
    kernel = functools.partial(
        _p1_kernel, ngy=ngy, abits=SPEC.abits, a_clip=SPEC.a_clip_ratio,
        eps=1e-5, tn_gu=TN_GU,
    )

    def gcol(off):
        if parked_g2:
            return lambda i, g: (0, off + jnp.minimum(g, g1 - 1))
        return lambda i, g: (0, off + g)

    out_col = (
        (lambda i, g: (i, jnp.minimum(g, g1 - 1))) if parked_g2
        else (lambda i, g: (i, g))
    )
    return pl.pallas_call(
        kernel,
        grid=(M // TM, g1 + parked_g2),
        in_specs=[
            pl.BlockSpec((TM, D), lambda i, g: (i, 0)),
            pl.BlockSpec((ngy * HALF, TN_GU), gcol(0)),
            pl.BlockSpec((GROUP, TN_GU), gcol(0)),
            pl.BlockSpec((ngy, TN_GU), gcol(0)),
            pl.BlockSpec((1, TN_GU), gcol(0)),
            pl.BlockSpec((ngy * HALF, TN_GU), gcol(up_off_blocks)),
            pl.BlockSpec((GROUP, TN_GU), gcol(up_off_blocks)),
            pl.BlockSpec((ngy, TN_GU), gcol(up_off_blocks)),
            pl.BlockSpec((1, TN_GU), gcol(up_off_blocks)),
        ],
        out_specs=pl.BlockSpec((TM, TN_GU), out_col),
        out_shape=jax.ShapeDtypeStruct((M, INTER), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TM, D), jnp.int8),
            pltpu.VMEM((TM, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(
        y,
        gate.body_packed, gate.keeper, gate.body_scale,
        gate.keeper_scale.reshape(1, -1),
        up.body_packed, up.keeper, up.body_scale,
        up.keeper_scale.reshape(1, -1),
    )


def probe_p1():
    gu, y = _mats()
    want = jax.jit(functools.partial(_oracle_act, gu=gu))(y)
    got = jax.jit(
        lambda y_: _run_p1(y_, gu, gu, INTER // TN_GU)
    )(y)
    return report("p1", got, want)


def probe_p1split():
    gu, y = _mats()
    gate, up = _split_gu(gu)
    want = jax.jit(functools.partial(_oracle_act, gu=gu))(y)
    got = jax.jit(lambda y_: _run_p1(y_, gate, up, 0))(y)
    return report("p1split", got, want)


def probe_parked():
    gu, y = _mats()
    want = jax.jit(functools.partial(_oracle_act, gu=gu))(y)
    g2 = D // 512
    got = jax.jit(
        lambda y_: _run_p1(y_, gu, gu, INTER // TN_GU, parked_g2=g2)
    )(y)
    return report("parked", got, want)


# ------------------------------------------------------------------ roundtrip


def _rt_kernel(act_ref, out_ref, qa_ref, as_ref, *, g1, abits, a_clip):
    from atom_tpu.ops.pallas_gemm_packed import _quant_block_sym

    g = pl.program_id(1)
    nblk = TN_GU // GROUP

    @pl.when(g < g1)
    def _store():
        act = act_ref[:]
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
        scale_cols.append(jnp.zeros((TM, 128 - nblk), jnp.float32))
        as_ref[g] = jnp.concatenate(scale_cols, axis=1)

    @pl.when(g == g1)
    def _read():
        parts = []
        for step in range(g1):
            for bi in range(nblk):
                parts.append(
                    qa_ref[step][:, bi * GROUP : (bi + 1) * GROUP].astype(
                        jnp.float32
                    )
                    * as_ref[step][:, bi : bi + 1]
                )
        out_ref[:] = jnp.concatenate(parts, axis=1)


def probe_roundtrip():
    gu, y = _mats()
    act = jax.jit(functools.partial(_oracle_act, gu=gu))(y)
    g1 = INTER // TN_GU
    kernel = functools.partial(
        _rt_kernel, g1=g1, abits=SPEC.abits, a_clip=SPEC.a_clip_ratio
    )
    got = pl.pallas_call(
        kernel,
        grid=(M // TM, g1 + 1),
        in_specs=[
            pl.BlockSpec((TM, TN_GU), lambda i, g: (i, jnp.minimum(g, g1 - 1)))
        ],
        out_specs=pl.BlockSpec((TM, INTER), lambda i, g: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, INTER), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g1, TM, TN_GU), jnp.int8),
            pltpu.VMEM((g1, TM, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(act)

    # oracle: per-128 quant-dequant, INT8 keeper on the LAST 128 channels
    from atom_tpu.ops.pallas_gemm_packed import _quant_block_sym as qbs

    def oracle(a):
        outs = []
        n = INTER // GROUP
        for k in range(n):
            blk = a[:, k * GROUP : (k + 1) * GROUP]
            bits = 8 if k == n - 1 else SPEC.abits
            clip = 1.0 if k == n - 1 else SPEC.a_clip_ratio
            c, s = qbs(blk, bits, clip)
            outs.append(c.astype(jnp.float32) * s)
        return jnp.concatenate(outs, axis=1)

    want = jax.jit(oracle)(act)
    return report("roundtrip", got, want)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="p1,p1split,roundtrip,parked")
    args = ap.parse_args()
    fns = {
        "p1": probe_p1,
        "p1split": probe_p1split,
        "roundtrip": probe_roundtrip,
        "parked": probe_parked,
    }
    for p in args.probes.split(","):
        fns[p]()


if __name__ == "__main__":
    main()
