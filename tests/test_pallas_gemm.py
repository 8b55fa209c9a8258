"""Pallas GEMM kernels vs. the jnp oracle (interpret mode on CPU).

The real-TPU compile + perf runs happen in bench.py / kernel bench scripts;
here interpret mode pins the numerics to ``ops.reference`` exactly.
"""
import jax
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


def test_fused_qkv_gemm_matches_unfused():
    """packed_w4_gemm_qkv == plain GEMM + rope + per-head KV quant."""
    import numpy as np

    from atom_tpu.config import QuantSpec
    from atom_tpu.models.nn import apply_rope, rope_tables
    from atom_tpu.ops import reference as R
    from atom_tpu.ops.formats import (
        pack_for_kernel,
        quantize_activation_packed,
        quantize_weight_packed,
    )
    from atom_tpu.ops.pallas_gemm_packed import (
        assemble_activation,
        packed_w4_gemm_qkv,
        quant_gemm_packed,
    )

    spec = QuantSpec(weight_channel_group=1)
    key = jax.random.PRNGKey(0)
    d, n_q, n_kv, dh, m = 1024, 512, 512, 128, 8
    w = jax.random.normal(key, (d, n_q + 2 * n_kv), jnp.float32) * (d ** -0.5)
    kw = pack_for_kernel(quantize_weight_packed(w, spec))
    x = jax.random.normal(jax.random.PRNGKey(1), (m, d), jnp.float32)
    qa = quantize_activation_packed(x, spec)
    pos = jnp.asarray([5, 9, 1, 0, 77, 3, 2, 8], jnp.int32)
    cos, sin = rope_tables(pos, dh, 10000.0)

    a, sa = assemble_activation(qa)
    sw = jnp.concatenate([kw.body_scale, kw.keeper_scale[None, :]], axis=0)
    q, kc, kp, vc, vp = packed_w4_gemm_qkv(
        a, kw.body_packed, kw.keeper, sa, sw, cos, sin,
        n_q=n_q, n_kv=n_kv, head_dim=dh, interpret=True,
    )

    qkv = quant_gemm_packed(qa, kw, out_dtype=jnp.float32, interpret=True)
    q_want = apply_rope(
        qkv[:, :n_q].reshape(m, n_q // dh, dh), cos[:, None, :], sin[:, None, :]
    ).astype(jnp.bfloat16)
    k_want = R.quantize_kv_asym(apply_rope(
        qkv[:, n_q : n_q + n_kv].reshape(m, n_kv // dh, dh),
        cos[:, None, :], sin[:, None, :],
    ))
    v_want = R.quantize_kv_asym(qkv[:, n_q + n_kv :].reshape(m, n_kv // dh, dh))

    np.testing.assert_allclose(
        np.asarray(q.reshape(m, n_q // dh, dh), np.float32),
        np.asarray(q_want, np.float32), rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_array_equal(np.asarray(kc), np.asarray(k_want.codes))
    np.testing.assert_allclose(
        np.asarray(kp), np.asarray(k_want.params), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(vc), np.asarray(v_want.codes))
    np.testing.assert_allclose(
        np.asarray(vp), np.asarray(v_want.params), rtol=1e-5, atol=1e-6
    )


def test_kblk_deep_k_path():
    """ng > 96 takes the K-blocked grid path (the 70B MLP depth class);
    verify against the jnp oracle, including the non-multiple-of-32 group
    count that exercises the zero-padded tail."""
    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.ops.formats import (
        pack_for_kernel,
        quantize_activation_packed,
        quantize_weight_packed,
    )
    from atom_tpu.ops.pallas_gemm_packed import quant_gemm_packed
    from atom_tpu.ops.reference import quant_gemm

    r = rng(5)
    k_in = 99 * 128 + 128  # 99 body groups (99 % 32 != 0) + keeper
    x = jnp.array(r.normal(size=(8, k_in)).astype(np.float32))
    w = jnp.array(r.normal(size=(k_in, 256)).astype(np.float32) * 0.05)
    qa = quantize_activation_packed(x, ATOM_W4A4)
    pw = quantize_weight_packed(w, ATOM_W4A4)
    kw = pack_for_kernel(pw)
    ref = np.asarray(quant_gemm(qa, pw, out_dtype=jnp.float32))
    out = np.asarray(
        quant_gemm_packed(qa, kw, out_dtype=jnp.float32, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)
