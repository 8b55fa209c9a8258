"""Tests for the packed serving formats and jnp reference ops.

Mirrors the reference's kernel-test strategy (SURVEY.md §4): every serving op is
validated against the simulated-quantization (fake-quant) path — the two
implementations of the same scheme must agree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import ATOM_W4A4, QuantSpec
from atom_tpu.ops import (
    append_kv_decode,
    append_kv_prefill,
    batch_decode,
    dequantize_activation,
    dequantize_kv,
    dequantize_weight,
    gather_kv,
    make_kv_pages,
    pack_weight_storage,
    quant_gemm,
    quant_gemm_o4,
    quantize_activation_packed,
    quantize_kv_asym,
    quantize_weight_packed,
    reorder_quant,
    rmsnorm_reorder_quant,
    silu_mul_quant,
    unpack_weight_storage,
)
from atom_tpu.quant.core import quantize_activation, quantize_weight

SPEC = ATOM_W4A4  # canonical: g128, keeper 128 INT8, clips 0.9/0.85, sym


def rng(seed=0):
    return np.random.default_rng(seed)


class TestPackedWeight:
    def test_matches_fake_quant(self):
        # dequant(pack(w)) == fake-quant(w) for the RTN symmetric path.
        w = jnp.array(rng(0).normal(size=(512, 256)).astype(np.float32))  # [in, out]
        pw = quantize_weight_packed(w, SPEC)
        deq = np.asarray(dequantize_weight(pw, jnp.float32))
        fake = np.asarray(quantize_weight(w.T, SPEC).T)
        np.testing.assert_allclose(deq, fake, atol=1e-4)

    def test_storage_roundtrip(self):
        w = jnp.array(rng(1).normal(size=(512, 128)).astype(np.float32))
        pw = quantize_weight_packed(w, SPEC)
        pw2 = unpack_weight_storage(pack_weight_storage(pw))
        np.testing.assert_array_equal(np.asarray(pw.body), np.asarray(pw2.body))
        np.testing.assert_array_equal(np.asarray(pw.keeper), np.asarray(pw2.keeper))

    def test_channel_group_sharing(self):
        w = jnp.array(rng(2).normal(size=(256, 64)).astype(np.float32))
        pw = quantize_weight_packed(w, SPEC)
        s = np.asarray(pw.body_scale)  # [n_groups, out]
        # Adjacent output-channel pairs share scales (weight_channel_group=2).
        np.testing.assert_array_equal(s[:, 0::2], s[:, 1::2])


class TestQuantizedActivation:
    def test_matches_fake_quant(self):
        x = jnp.array(rng(3).normal(size=(16, 512)).astype(np.float32))
        qa = quantize_activation_packed(x, SPEC)
        deq = np.asarray(dequantize_activation(qa, jnp.float32))
        fake = np.asarray(quantize_activation(x, SPEC))
        np.testing.assert_allclose(deq, fake, atol=1e-4)


class TestQuantGemm:
    def test_matches_dequant_matmul(self):
        r = rng(4)
        x = jnp.array(r.normal(size=(8, 512)).astype(np.float32))
        w = jnp.array(r.normal(size=(512, 256)).astype(np.float32))
        qa = quantize_activation_packed(x, SPEC)
        pw = quantize_weight_packed(w, SPEC)
        out = np.asarray(quant_gemm(qa, pw, out_dtype=jnp.float32))
        expect = np.asarray(
            dequantize_activation(qa, jnp.float32)
            @ dequantize_weight(pw, jnp.float32)
        )
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-3)

    def test_o4_variant_kv_codes(self):
        r = rng(5)
        x = jnp.array(r.normal(size=(4, 512)).astype(np.float32))
        w = jnp.array(r.normal(size=(512, 256)).astype(np.float32))
        qa = quantize_activation_packed(x, SPEC)
        pw = quantize_weight_packed(w, SPEC)
        kv = quant_gemm_o4(qa, pw, head_dim=128)
        assert kv.codes.shape == (4, 2, 128)
        assert kv.codes.dtype == jnp.int8
        assert (np.asarray(kv.codes) >= 0).all() and (np.asarray(kv.codes) <= 15).all()
        # Dequantized KV approximates the full-precision GEMM output per head.
        full = np.asarray(quant_gemm(qa, pw, out_dtype=jnp.float32)).reshape(4, 2, 128)
        deq = np.asarray(dequantize_kv(kv.codes, kv.params))
        rngs = full.max(-1) - full.min(-1)
        assert (np.abs(deq - full) <= rngs[..., None] / 15 + 1e-4).all()


class TestFusedEpilogues:
    def test_rmsnorm_reorder_quant(self):
        r = rng(6)
        x = jnp.array(r.normal(size=(4, 512)).astype(np.float32))
        nw = jnp.array(r.normal(size=(512,)).astype(np.float32))
        idx = jnp.array(r.permutation(512).astype(np.int32))
        qa = rmsnorm_reorder_quant(x, nw, idx, SPEC, eps=1e-6)
        from atom_tpu.models.nn import rmsnorm

        expect = np.asarray(
            quantize_activation(jnp.take(rmsnorm(x, nw, 1e-6), idx, axis=-1), SPEC)
        )
        got = np.asarray(dequantize_activation(qa, jnp.float32))
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_silu_mul_quant(self):
        r = rng(7)
        g = jnp.array(r.normal(size=(4, 256)).astype(np.float32))
        u = jnp.array(r.normal(size=(4, 256)).astype(np.float32))
        qa = silu_mul_quant(g, u, SPEC)
        expect = np.asarray(
            quantize_activation(jax.nn.silu(g) * u, SPEC)
        )
        np.testing.assert_allclose(
            np.asarray(dequantize_activation(qa, jnp.float32)), expect, atol=1e-4
        )

    def test_reorder_quant(self):
        r = rng(8)
        x = jnp.array(r.normal(size=(4, 512)).astype(np.float32))
        idx = jnp.array(r.permutation(512).astype(np.int32))
        qa = reorder_quant(x, idx, SPEC)
        expect = np.asarray(quantize_activation(jnp.take(x, idx, -1), SPEC))
        np.testing.assert_allclose(
            np.asarray(dequantize_activation(qa, jnp.float32)), expect, atol=1e-4
        )


class TestPagedKV:
    HKV, PS, D = 2, 16, 128

    def test_append_gather_roundtrip_decode(self):
        pages, params = make_kv_pages(8, self.HKV, self.PS, self.D)
        r = rng(9)
        x = jnp.array(r.normal(size=(3, self.HKV, self.D)).astype(np.float32))
        kv = quantize_kv_asym(x)
        page_idx = jnp.array([0, 2, 5])
        slot = jnp.array([3, 0, 15])
        pages, params = append_kv_decode(pages, params, kv, page_idx, slot)
        # Gather back sequence 1 (page 2 only).
        codes, prm = gather_kv(pages, params, jnp.array([2]))
        got = np.asarray(dequantize_kv(codes, prm))[0]  # slot 0
        expect = np.asarray(dequantize_kv(kv.codes, kv.params))[1]
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_append_prefill_and_decode_consistency(self):
        # Prefill-append a sequence, then batch_decode must equal explicit attention.
        r = rng(10)
        t, hq = 24, 4
        groups = hq // self.HKV
        pages, kparams = make_kv_pages(8, self.HKV, self.PS, self.D)
        vpages, vparams = make_kv_pages(8, self.HKV, self.PS, self.D)

        k_raw = jnp.array(r.normal(size=(t, self.HKV, self.D)).astype(np.float32))
        v_raw = jnp.array(r.normal(size=(t, self.HKV, self.D)).astype(np.float32))
        kq, vq = quantize_kv_asym(k_raw), quantize_kv_asym(v_raw)
        table = jnp.array([4, 1, 6, 0])  # this sequence's pages
        pages, kparams = append_kv_prefill(pages, kparams, kq, table, self.PS)
        vpages, vparams = append_kv_prefill(vpages, vparams, vq, table, self.PS)

        q = jnp.array(r.normal(size=(1, hq, self.D)).astype(np.float32))
        out = np.asarray(
            batch_decode(
                q, pages, kparams, vpages, vparams,
                page_table=table[None], seq_lens=jnp.array([t]),
                rope_theta=10000.0, out_dtype=jnp.float32,
            )
        )

        # Explicit reference: dequant K/V, RoPE on K, masked softmax.
        from atom_tpu.models.nn import rope_tables

        kd = np.asarray(dequantize_kv(kq.codes, kq.params))
        vd = np.asarray(dequantize_kv(vq.codes, vq.params))
        cos, sin = rope_tables(jnp.arange(t), self.D, 10000.0)
        cos, sin = np.asarray(cos), np.asarray(sin)
        half = self.D // 2
        k_rot = kd * cos[:, None, :] + np.concatenate(
            [-kd[..., half:], kd[..., :half]], axis=-1
        ) * sin[:, None, :]
        k_rep = np.repeat(k_rot, groups, axis=1)
        v_rep = np.repeat(vd, groups, axis=1)
        scores = np.einsum("hd,thd->ht", np.asarray(q[0]), k_rep) / np.sqrt(self.D)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        expect = np.einsum("ht,thd->hd", probs, v_rep)
        np.testing.assert_allclose(out[0], expect, rtol=1e-4, atol=1e-4)

    def test_decode_ignores_padding_pages(self):
        # Garbage in out-of-range pages must not affect the result.
        r = rng(11)
        t, hq = 10, 2
        pages, kparams = make_kv_pages(4, self.HKV, self.PS, self.D)
        vpages, vparams = make_kv_pages(4, self.HKV, self.PS, self.D)
        k_raw = jnp.array(r.normal(size=(t, self.HKV, self.D)).astype(np.float32))
        v_raw = jnp.array(r.normal(size=(t, self.HKV, self.D)).astype(np.float32))
        kq, vq = quantize_kv_asym(k_raw), quantize_kv_asym(v_raw)
        table = jnp.array([1, 3])
        pages, kparams = append_kv_prefill(pages, kparams, kq, table, self.PS)
        vpages, vparams = append_kv_prefill(vpages, vparams, vq, table, self.PS)

        q = jnp.array(r.normal(size=(1, hq, self.D)).astype(np.float32))
        base = np.asarray(
            batch_decode(q, pages, kparams, vpages, vparams, table[None],
                         jnp.array([t]), out_dtype=jnp.float32)
        )
        # Poison page 2 (not in the table) and the padding slots of page 3.
        pages2 = pages.at[2].set(127)
        kparams2 = kparams.at[2].set(99.0)
        out = np.asarray(
            batch_decode(q, pages2, kparams2, vpages, vparams, table[None],
                         jnp.array([t]), out_dtype=jnp.float32)
        )
        np.testing.assert_allclose(base, out, atol=1e-6)
