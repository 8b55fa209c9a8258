"""Fused-input (in-kernel norm + dynamic-quant prologue) GEMM variants vs
the unfused production op chains.

The quantize math and integer dots are exact, and the in-kernel RMSNorm uses
``lax.reduce_precision`` for the bf16 roundings (astype round-trips get
ELIDED by XLA inside the kernel program — measured as a 1-bf16-ulp fuzz
flipping ~2%% of codes before the fix), so the fused paths match the unfused
chains up to the documented f32 reassociation flips between two separately-
compiled programs: a handful of tokens get ONE flipped code each, moving
that row's outputs by ~scale_a * w_deq (hence the atol + sparse-damage
assertion in ``_flip_close``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import ATOM_W4A4
from atom_tpu.ops import reference as R
from atom_tpu.ops.formats import pack_for_kernel, quantize_weight_packed
from atom_tpu.ops.kv_hot import make_hot
from atom_tpu.ops.pallas_gemm_packed import (
    assemble_activation,
    packed_w4_gemm_fused_in,
    packed_w4_gemm_qkv_ring,
    packed_w4_gemm_qkv_ring_fused,
    quant_gemm_packed,
)
from atom_tpu.ops.pallas_mlp import fused_mlp_packed

SPEC = ATOM_W4A4


def _kw(key, in_f, out_f):
    w = jax.random.normal(key, (in_f, out_f), jnp.float32) * 0.05
    return pack_for_kernel(quantize_weight_packed(w, SPEC))


def _flip_close(got, want, atol=0.06):
    """allclose + sparse-damage bound.

    One flipped INT4 act code (f32 reassociation between two separately-
    compiled programs) perturbs its token's ENTIRE output row by
    ±scale_a·w_deq — mostly far below ``atol``, a few elements near it —
    so counting raw ``got != want`` elements measures rows-poisoned, not
    flips.  The systematic-error detector is instead: at most 2% of
    elements may move beyond per-element noise (10% of atol + 2% rel);
    a calibration/scale bug moves EVERY element of every row.
    """
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=atol)
    diff = np.abs(got - want)
    moved = diff > (0.1 * atol + 0.02 * np.abs(want))
    assert np.mean(moved) < 0.02, (
        f"{np.mean(moved):.4%} elements moved beyond flip noise "
        f"(max diff {diff.max():.4f})"
    )


@pytest.mark.quick
def test_fused_in_gemm_matches_reorder_quant_chain():
    d, n, m = 512, 768 - 768 % 128, 24
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    kw = _kw(k1, d, n)
    attn = jax.random.normal(k2, (m, d), jnp.bfloat16)
    resid = jax.random.normal(k3, (m, n), jnp.bfloat16)
    ridx = jax.random.permutation(jax.random.PRNGKey(7), d).astype(jnp.int32)

    a_in = R.reorder_quant(attn, ridx, SPEC)
    want = resid + quant_gemm_packed(a_in, kw, interpret=True)
    got = packed_w4_gemm_fused_in(
        jnp.take(attn, ridx, axis=-1), kw, resid=resid,
        abits=SPEC.abits, a_clip=SPEC.a_clip_ratio, interpret=True,
    )
    _flip_close(got, want)


@pytest.mark.quick
def test_fused_in_gemm_norm_matches_rmsnorm_chain():
    d, n, m = 512, 512, 32
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    kw = _kw(k1, d, n)
    x = jax.random.normal(k2, (m, d), jnp.bfloat16)
    ln_w = (1.0 + 0.1 * jax.random.normal(k3, (d,))).astype(jnp.bfloat16)
    ridx = jax.random.permutation(jax.random.PRNGKey(8), d).astype(jnp.int32)

    m_in = R.rmsnorm_reorder_quant(x, ln_w, ridx, SPEC)
    want = quant_gemm_packed(m_in, kw, interpret=True)
    got = packed_w4_gemm_fused_in(
        jnp.take(x, ridx, axis=-1), kw, norm_w=jnp.take(ln_w, ridx),
        abits=SPEC.abits, a_clip=SPEC.a_clip_ratio, interpret=True,
    )
    _flip_close(got, want, atol=0.25)


@pytest.mark.quick
def test_qkv_ring_fused_matches_int_input():
    d, n_q, n_kv, dh, b, w = 512, 512, 512, 128, 32, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    kw = _kw(ks[0], d, n_q + 2 * n_kv)
    x = jax.random.normal(ks[1], (b, d), jnp.bfloat16)
    ln_w = (1.0 + 0.1 * jax.random.normal(ks[2], (d,))).astype(jnp.bfloat16)
    ridx = jax.random.permutation(ks[3], d).astype(jnp.int32)
    cos = jax.random.uniform(jax.random.PRNGKey(5), (b, dh), jnp.float32, -1, 1)
    sin = jax.random.uniform(jax.random.PRNGKey(6), (b, dh), jnp.float32, -1, 1)
    sw = jnp.concatenate([kw.body_scale, kw.keeper_scale[None, :]], axis=0)
    row = jnp.int32(5)

    h_in = R.rmsnorm_reorder_quant(x, ln_w, ridx, SPEC)
    a, sa = assemble_activation(h_in)
    hot0 = make_hot(b, n_kv // dh, dh, w=w)
    q0, kc0, kp0, vc0 = packed_w4_gemm_qkv_ring(
        a, kw.body_packed, kw.keeper, sa, sw, cos, sin,
        hot0.k_codes, hot0.prm, hot0.v_codes, row,
        n_q=n_q, n_kv=n_kv, head_dim=dh, interpret=True,
    )
    hot1 = make_hot(b, n_kv // dh, dh, w=w)
    q1, kc1, kp1, vc1 = packed_w4_gemm_qkv_ring_fused(
        jnp.take(x, ridx, axis=-1), jnp.take(ln_w, ridx),
        kw.body_packed, kw.keeper, sw, cos, sin,
        hot1.k_codes, hot1.prm, hot1.v_codes, row,
        n_q=n_q, n_kv=n_kv, head_dim=dh,
        abits=SPEC.abits, a_clip=SPEC.a_clip_ratio, interpret=True,
    )
    _flip_close(q1, q0, atol=0.5)
    # ring codes: int4/int8 values, at most rare boundary flips.  ring
    # params: bf16 (scale, zero) pairs — the in-kernel norm's 1-ulp fuzz
    # moves ~0.5% of amaxes by one bf16 ulp (0.4% rel), so bound equality
    # loosely and closeness tightly.
    for name, got, want, bound in (
        ("kc", kc1, kc0, 0.999), ("kp", kp1, kp0, 0.99),
        ("vc", vc1, vc0, 0.999),
    ):
        got, want = np.asarray(got), np.asarray(want)
        same = np.mean(got == want)
        assert same > bound, f"ring {name} mismatch: only {same:.4%} equal"
        if got.dtype.kind == "f":
            np.testing.assert_allclose(
                got.astype(np.float32), want.astype(np.float32),
                rtol=1e-2, atol=1e-6,
            )


@pytest.mark.quick
def test_fused_mlp_in_kernel_norm_matches_external_norm():
    from atom_tpu.models.nn import rmsnorm

    d, inter, m = 512, 1024, 32
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    gu = _kw(ks[0], d, 2 * inter)
    dn = _kw(ks[1], inter, d)
    x = jax.random.normal(ks[2], (m, d), jnp.bfloat16)
    resid = jax.random.normal(ks[3], (m, d), jnp.bfloat16)
    ln_w = (1.0 + 0.1 * jax.random.normal(ks[4], (d,))).astype(jnp.bfloat16)
    ridx = jax.random.permutation(jax.random.PRNGKey(9), d).astype(jnp.int32)

    y_ext = jnp.take(rmsnorm(x, ln_w, 1e-5), ridx, axis=-1)
    want = fused_mlp_packed(
        y_ext, resid, gu, dn,
        abits=SPEC.abits, a_clip=SPEC.a_clip_ratio, interpret=True,
    )
    got = fused_mlp_packed(
        jnp.take(x, ridx, axis=-1), resid, gu, dn,
        norm_w=jnp.take(ln_w, ridx),
        abits=SPEC.abits, a_clip=SPEC.a_clip_ratio, interpret=True,
    )
    # act-code flips compound through silu*mul: larger per-flip deltas
    _flip_close(got, want, atol=1.0)
