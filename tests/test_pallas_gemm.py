"""Pallas GEMM kernels vs. the jnp oracle (interpret mode on CPU).

The real-TPU compile + perf runs happen in bench.py / kernel bench scripts;
here interpret mode pins the numerics to ``ops.reference`` exactly.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import ATOM_W4A4
from atom_tpu.ops import (
    quant_gemm,
    quant_gemm_o4,
    quantize_activation_packed,
    quantize_weight_packed,
)
from atom_tpu.ops.formats import pack_for_kernel, unpack_from_kernel
from atom_tpu.ops.pallas_gemm import quant_gemm_o4_pallas, quant_gemm_pallas
from atom_tpu.ops.pallas_gemm_packed import quant_gemm_o4_packed, quant_gemm_packed


def rng(seed=0):
    return np.random.default_rng(seed)


@pytest.fixture(scope="module")
def operands():
    r = rng(0)
    x = jnp.array(r.normal(size=(16, 512)).astype(np.float32))
    w = jnp.array(r.normal(size=(512, 256)).astype(np.float32))
    qa = quantize_activation_packed(x, ATOM_W4A4)
    pw = quantize_weight_packed(w, ATOM_W4A4)
    return qa, pw


class TestUnpackedKernel:
    def test_matches_oracle(self, operands):
        qa, pw = operands
        ref = np.asarray(quant_gemm(qa, pw, out_dtype=jnp.float32))
        out = np.asarray(
            quant_gemm_pallas(qa, pw, out_dtype=jnp.float32, interpret=True)
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)

    def test_o4_matches_oracle(self, operands):
        qa, pw = operands
        ref = quant_gemm_o4(qa, pw, head_dim=128)
        out = quant_gemm_o4_pallas(qa, pw, head_dim=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(out.codes), np.asarray(ref.codes))
        np.testing.assert_allclose(
            np.asarray(out.params), np.asarray(ref.params), atol=1e-5
        )


class TestPackedKernel:
    def test_nibble_plane_roundtrip(self, operands):
        _, pw = operands
        kw = pack_for_kernel(pw)
        assert kw.body_packed.shape[0] == pw.body.shape[0] // 2
        pw2 = unpack_from_kernel(kw)
        np.testing.assert_array_equal(np.asarray(pw2.body), np.asarray(pw.body))

    def test_matches_oracle(self, operands):
        qa, pw = operands
        kw = pack_for_kernel(pw)
        ref = np.asarray(quant_gemm(qa, pw, out_dtype=jnp.float32))
        out = np.asarray(
            quant_gemm_packed(qa, kw, out_dtype=jnp.float32, interpret=True)
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)

    def test_large_m_scratch_path(self):
        # m > 64 takes the scratch full-depth kernel; verify it too.
        r = rng(1)
        x = jnp.array(r.normal(size=(96, 512)).astype(np.float32))
        w = jnp.array(r.normal(size=(512, 256)).astype(np.float32))
        qa = quantize_activation_packed(x, ATOM_W4A4)
        pw = quantize_weight_packed(w, ATOM_W4A4)
        kw = pack_for_kernel(pw)
        ref = np.asarray(quant_gemm(qa, pw, out_dtype=jnp.float32))
        out = np.asarray(
            quant_gemm_packed(qa, kw, out_dtype=jnp.float32, interpret=True)
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)

    def test_o4_matches_oracle(self, operands):
        qa, pw = operands
        kw = pack_for_kernel(pw)
        ref = quant_gemm_o4(qa, pw, head_dim=128)
        out = quant_gemm_o4_packed(qa, kw, head_dim=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(out.codes), np.asarray(ref.codes))

    def test_unaligned_n_padding(self):
        r = rng(2)
        x = jnp.array(r.normal(size=(8, 512)).astype(np.float32))
        w = jnp.array(r.normal(size=(512, 384)).astype(np.float32))
        qa = quantize_activation_packed(x, ATOM_W4A4)
        pw = quantize_weight_packed(w, ATOM_W4A4)
        kw = pack_for_kernel(pw)
        ref = np.asarray(quant_gemm(qa, pw, out_dtype=jnp.float32))
        out = np.asarray(
            quant_gemm_packed(qa, kw, out_dtype=jnp.float32, interpret=True)
        )
        assert out.shape == (8, 384)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)
