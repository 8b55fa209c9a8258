"""Fused-MLP kernel vs the unfused production op chain.

Integer dots are exact, but the f32 scale-accumulate chain is contracted
differently (FMA) by every separately-compiled program — measured 1-ulp f32
divergence even between an exact-structure jnp replica and the interpret-mode
production kernel on CPU.  A 1-ulp act difference can flip a quantization
code sitting on a rounding boundary, which moves affected output elements by
a few bf16 ulps.  The assertion is therefore: tight allclose + a bound on
the fraction of rounding-flipped elements (same caliber as the documented
prefill/decode reassociation noise, tests/test_serving.py:122-127).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import ATOM_W4A4
from atom_tpu.ops.formats import (
    pack_for_kernel,
    quantize_activation_packed,
    quantize_weight_packed,
)
from atom_tpu.ops.pallas_gemm_packed import quant_gemm_packed
from atom_tpu.ops.pallas_mlp import fused_mlp_packed, fused_mlp_supported

SPEC = ATOM_W4A4


def _rand_kw(key, in_f, out_f):
    w = jax.random.normal(key, (in_f, out_f), jnp.float32) * 0.05
    return pack_for_kernel(quantize_weight_packed(w, SPEC))


def _unfused(y, resid, gu, dn):
    """The exact production sequence (serving/model._post_attn MLP part)."""
    qy = quantize_activation_packed(y, SPEC)
    gout = quant_gemm_packed(qy, gu, out_dtype=jnp.float32, interpret=True)
    inter = gout.shape[1] // 2
    act = jax.nn.silu(gout[:, :inter]) * gout[:, inter:]
    d_in = quantize_activation_packed(act, SPEC)
    return resid + quant_gemm_packed(d_in, dn, interpret=True)


def _run(d, inter, m, seed=0):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    gu = _rand_kw(k1, d, 2 * inter)
    dn = _rand_kw(k2, inter, d)
    y = jax.random.normal(k3, (m, d), jnp.float32)
    resid = jax.random.normal(k4, (m, d), jnp.float32).astype(jnp.bfloat16)
    want = _unfused(y, resid, gu, dn)
    got = fused_mlp_packed(
        y, resid, gu, dn,
        abits=SPEC.abits, a_clip=SPEC.a_clip_ratio, interpret=True,
    )
    return np.asarray(got, np.float32), np.asarray(want, np.float32)


def _assert_close(got, want, atol=0.06):
    # atol bounds the damage of ONE flipped act code: +-1 code at the local
    # group scale times the dequantized down-proj weight.  At the tiny
    # geometries scales are small (atol 0.06); at 7B act absmax per block
    # reaches ~20 (scale ~3) so a flip moves outputs by up to ~1.
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=atol)
    # sparse-damage bound (see tests/test_pallas_fused_in.py::_flip_close):
    # a flipped code perturbs its whole row at tiny magnitude, so bound the
    # fraction of elements moved beyond flip noise, not raw inequality.
    diff = np.abs(got - want)
    moved = diff > (0.1 * atol + 0.02 * np.abs(want))
    assert np.mean(moved) < 0.02, (
        f"{np.mean(moved):.4%} elements moved beyond flip noise "
        f"(max diff {diff.max():.4f})"
    )


@pytest.mark.quick
def test_fused_mlp_matches_unfused_small():
    assert fused_mlp_supported(512, 1024, 128, 128)
    got, want = _run(512, 1024, 32)
    _assert_close(got, want)


@pytest.mark.quick
def test_fused_mlp_matches_unfused_odd_batch():
    # m < 32 exercises the pad path; tn_gu falls back to 128 when
    # inter % 256 != 0 is impossible by the support gate, so use 1280
    got, want = _run(512, 1280, 8, seed=1)
    _assert_close(got, want)


def test_fused_mlp_matches_unfused_7b_geometry():
    # full Llama-2-7B MLP geometry (43 gate/up tiles + 8 down tiles)
    got, want = _run(4096, 11008, 32, seed=2)
    _assert_close(got, want, atol=1.0)


@pytest.mark.quick
def test_fused_mlp_support_gate():
    assert fused_mlp_supported(4096, 11008, 128, 128)
    assert fused_mlp_supported(5120, 13824, 128, 128)  # 13B
    assert not fused_mlp_supported(4096, 11008, 64, 128)   # keeper
    assert not fused_mlp_supported(768, 2048, 128, 128)    # d % 512
    assert not fused_mlp_supported(8192, 28672, 128, 128)  # 70B unroll
