"""Oracle tests for the quantization core (SURVEY.md §7 phase 1).

Closed-form cases pin the exact semantics of the reference's ``model/quant.py``
(scale formulas, clipping, keeper split, channel grouping) without depending on
torch/bitsandbytes.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import KeeperPrecision, QuantSpec, QuantType
from atom_tpu.quant import (
    dequantize_groups,
    fake_quantize_fp4,
    fake_quantize_tensor,
    pack_int4,
    pack_uint4,
    quantize_activation,
    quantize_groups,
    quantize_kv_head,
    quantize_weight,
    quantize_weight_grouped,
    unpack_int4,
    unpack_uint4,
)


def rng(seed=0):
    return np.random.default_rng(seed)


class TestGroupQuant:
    def test_sym_int8_closed_form(self):
        # absmax = 127 -> scale = 1.0 -> integers are exactly representable.
        w = jnp.array([[127.0, -64.0, 3.0, -127.0]])
        q = quantize_groups(w, bits=8, sym=True)
        np.testing.assert_allclose(np.asarray(q.scale), [[1.0]])
        np.testing.assert_array_equal(np.asarray(q.codes), [[127, -64, 3, -127]])
        np.testing.assert_allclose(np.asarray(dequantize_groups(q)), np.asarray(w))

    def test_sym_qmin_is_minus_2_pow_bm1(self):
        # The symmetric grid is [-2^(b-1), 2^(b-1)-1]: a value at -absmax rounds
        # to -(qmax+1) and is NOT clamped to -qmax (quant.py:167-168,181).
        w = jnp.array([[7.0, -7.875]])  # absmax 7.875 -> scale = 1.125
        q = quantize_groups(w, bits=4, sym=True)
        assert int(q.codes[0, 1]) == -7  # -7.875/1.125 = -7 exactly
        w2 = jnp.array([[3.5, -8.0]])  # scale = 8/7
        q2 = quantize_groups(w2, bits=4, sym=True)
        assert int(q2.codes[0, 1]) == -7  # round(-7.0) = -7, within [-8, 7]

    def test_sym_int4_rounding(self):
        # absmax = 7 -> scale 1; 3.4 rounds to 3, 3.6 to 4.
        w = jnp.array([[7.0, 3.4, 3.6, -7.0]])
        out = fake_quantize_tensor(w, bits=4, group_size=0, sym=True)
        np.testing.assert_allclose(np.asarray(out), [[7.0, 3.0, 4.0, -7.0]])

    def test_asym_int4_closed_form(self):
        # range [0, 15] -> scale 1, zero 0.
        w = jnp.array([[0.0, 15.0, 7.2, 3.9]])
        q = quantize_groups(w, bits=4, sym=False)
        np.testing.assert_allclose(np.asarray(q.scale), [[1.0]])
        np.testing.assert_allclose(np.asarray(q.zero), [[0.0]])
        np.testing.assert_array_equal(np.asarray(q.codes), [[0, 15, 7, 4]])

    def test_asym_negative_range(self):
        # range [-8, 7] -> scale 1, zero 8: x = code - 8.
        w = jnp.array([[-8.0, 7.0, 0.0, -3.0]])
        q = quantize_groups(w, bits=4, sym=False)
        np.testing.assert_allclose(np.asarray(q.scale), [[1.0]])
        np.testing.assert_allclose(np.asarray(q.zero), [[8.0]])
        np.testing.assert_allclose(
            np.asarray(dequantize_groups(q)), np.asarray(w)
        )

    def test_clip_ratio_sym(self):
        # clip 0.5 halves the scale; positives clamp at qmax*scale, negatives at
        # qmin*scale = -8/7*4 (sym qmin is -2^(b-1), matching the reference grid).
        w = jnp.array([[8.0, 4.0, -8.0, 2.3]])
        out = fake_quantize_tensor(w, bits=4, group_size=0, sym=True, clip_ratio=0.5)
        s = np.float32(4.0) / np.float32(7.0)
        np.testing.assert_allclose(
            np.asarray(out),
            [[4.0, 4.0, -8 * s, np.round(np.float32(2.3) / s) * s]],
            rtol=1e-6,
        )

    def test_group_split(self):
        # Two groups with very different magnitudes quantize independently.
        w = jnp.concatenate(
            [jnp.full((1, 128), 100.0), jnp.full((1, 128), 0.01)], axis=-1
        )
        out = fake_quantize_tensor(w, bits=4, group_size=128, sym=True)
        np.testing.assert_allclose(np.asarray(out[0, :128]), 100.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0, 128:]), 0.01, rtol=1e-6)

    def test_error_bound_random(self):
        # |x - q(x)| <= scale/2 everywhere (no clipping active).
        x = rng(1).normal(size=(16, 256)).astype(np.float32)
        out = np.asarray(fake_quantize_tensor(jnp.array(x), 4, 128, True))
        scales = np.abs(x.reshape(16, 2, 128)).max(-1) / 7.0
        err = np.abs(out - x).reshape(16, 2, 128)
        assert (err <= scales[..., None] / 2 + 1e-6).all()

    def test_bits16_noop(self):
        x = jnp.array([[1.234, 5.678]])
        out = fake_quantize_tensor(x, bits=16, group_size=0, sym=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


class TestExponential:
    def test_power_of_two_levels(self):
        # Exponent-only: outputs are sign * 2^e * (absmax / 2^(2^(b-1)-1)).
        w = jnp.array([[8.0, 5.0, 1.3, -2.2]])
        out = np.asarray(
            fake_quantize_tensor(w, bits=4, group_size=0, sym=True, exponential=True)
        )
        scale = 8.0 / 2**7
        levels = np.log2(np.abs(out) / scale)
        np.testing.assert_allclose(levels, np.round(levels), atol=1e-5)


class TestFP4:
    def test_codebook_exact(self):
        # Values exactly on the codebook round-trip exactly.
        codes = np.array([0.0, 0.0625, 2, 3, 4, 6, 8, 12]) / 12.0
        w = jnp.array(np.concatenate([codes, -codes])[None, :] * 5.0)
        out = np.asarray(fake_quantize_fp4(w))
        np.testing.assert_allclose(out, np.asarray(w), rtol=1e-6)

    def test_nearest_rounding(self):
        # 0.4 normalized (absmax 1.0 at another position) -> nearest of
        # {0.3333, 0.5} is 0.3333... midpoint is 0.41666 so 0.4 -> 4/12.
        w = jnp.array([[1.0, 0.4, -0.45]])
        out = np.asarray(fake_quantize_fp4(w))
        np.testing.assert_allclose(out[0, 1], 4 / 12, rtol=1e-5)
        np.testing.assert_allclose(out[0, 2], -0.5, rtol=1e-5)

    def test_via_quant_type(self):
        w = jnp.array(rng(2).normal(size=(4, 128)).astype(np.float32))
        a = fake_quantize_tensor(w, 4, 128, True, quant_type=QuantType.FP)
        b = fake_quantize_fp4(w.reshape(4, 1, 128)).reshape(4, 128)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestWeightQuant:
    def test_channel_group_shares_scale(self):
        # With channel_group=2, rows (0,1) share a scale: a small row paired with
        # a big row is quantized on the big row's grid.
        w = np.zeros((2, 128), np.float32)
        w[0] = 7.0
        w[1] = 0.05
        out = np.asarray(
            quantize_weight_grouped(
                jnp.array(w), bits=4, group_size=128, sym=True, channel_group=2
            )
        )
        # scale = 1.0 from row 0 -> row 1's 0.05 rounds to 0.
        np.testing.assert_allclose(out[1], 0.0)
        # Without channel grouping it survives.
        out1 = np.asarray(
            quantize_weight_grouped(
                jnp.array(w), bits=4, group_size=128, sym=True, channel_group=1
            )
        )
        np.testing.assert_allclose(out1[1], 0.05, rtol=1e-5)

    def test_keeper_block_preserved_int8(self):
        spec = QuantSpec(keeper=128, keeper_precision=KeeperPrecision.INT8)
        w = np.asarray(rng(3).normal(size=(64, 512)).astype(np.float32))
        w[:, -128:] *= 100.0  # outliers live in the keeper block
        out = np.asarray(quantize_weight(jnp.array(w), spec))
        # Keeper block: per-row INT8 -> relative error bounded by scale/2.
        keep = w[:, -128:]
        scales = np.abs(keep).max(-1, keepdims=True) / 127.0
        assert (np.abs(out[:, -128:] - keep) <= scales / 2 + 1e-5).all()
        # Body: INT4 grid with clip 0.85.
        assert np.abs(out[:, :-128] - w[:, :-128]).max() < np.abs(w[:, :-128]).max()

    def test_fp16_spec_noop(self):
        spec = QuantSpec(wbits=16, abits=16, keeper=0)
        w = jnp.array(rng(4).normal(size=(8, 256)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(quantize_weight(w, spec)), np.asarray(w)
        )


class TestActivationQuant:
    def test_keeper_not_int4_quantized(self):
        spec = QuantSpec()  # keeper 128 INT8, act group 128 sym, clip 0.9
        x = np.asarray(rng(5).normal(size=(4, 512)).astype(np.float32))
        x[:, -128:] *= 50.0
        out = np.asarray(quantize_activation(jnp.array(x), spec))
        keep = x[:, -128:]
        scales = np.abs(keep).max(-1, keepdims=True) / 127.0
        assert (np.abs(out[:, -128:] - keep) <= scales / 2 + 1e-4).all()

    def test_keeper_isolated_from_body_groups(self):
        # Huge keeper values must not blow up the body's group scales: the body
        # groups exclude the keeper block entirely (zeroed before group quant).
        spec = QuantSpec()
        x = np.ones((2, 256), np.float32)
        x[:, -128:] = 1e4
        out = np.asarray(quantize_activation(jnp.array(x), spec))
        # Body group absmax is 1.0 (not 1e4); with clip 0.9 the max saturates to
        # 0.9 * absmax.  Had the keeper leaked into the group, the scale would be
        # ~1e4/7 and 1.0 would quantize to 0.
        np.testing.assert_allclose(out[:, :128], 0.9, rtol=1e-5)

    def test_abits16_noop(self):
        spec = QuantSpec(abits=16)
        x = jnp.array(rng(6).normal(size=(4, 256)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(quantize_activation(x, spec)), np.asarray(x)
        )

    def test_3d_shape_preserved(self):
        spec = QuantSpec()
        x = jnp.array(rng(7).normal(size=(2, 3, 512)).astype(np.float32))
        assert quantize_activation(x, spec).shape == (2, 3, 512)


class TestKVQuant:
    def test_asym_per_head(self):
        spec = QuantSpec()
        x = np.asarray(rng(8).normal(size=(2, 4, 3, 128)).astype(np.float32))
        out = np.asarray(quantize_kv_head(jnp.array(x), spec))
        # Per-(b, h, t) asym INT4: error bounded by (max-min)/15/2.
        rng_ = x.max(-1) - x.min(-1)
        err = np.abs(out - x)
        assert (err <= rng_[..., None] / 15 / 2 + 1e-5).all()

    def test_disabled(self):
        spec = QuantSpec(kv_cache=False)
        x = jnp.array(rng(9).normal(size=(1, 2, 2, 128)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(quantize_kv_head(x, spec)), np.asarray(x)
        )


class TestPacking:
    def test_int4_roundtrip(self):
        codes = jnp.array(
            rng(10).integers(-8, 8, size=(16, 256)), dtype=jnp.int8
        )
        np.testing.assert_array_equal(
            np.asarray(unpack_int4(pack_int4(codes))), np.asarray(codes)
        )

    def test_uint4_roundtrip(self):
        codes = jnp.array(
            rng(11).integers(0, 16, size=(16, 256)), dtype=jnp.int8
        )
        np.testing.assert_array_equal(
            np.asarray(unpack_uint4(pack_uint4(codes))), np.asarray(codes)
        )

    def test_packed_halves_bytes(self):
        codes = jnp.zeros((4, 128), jnp.int8)
        assert pack_int4(codes).shape == (4, 64)


class TestFP8:
    def test_e5m2_exact_on_representable(self):
        from atom_tpu.quant import fake_cast_e5m2

        x = jnp.array([1.0, 1.25, 0.5, -3.0, 0.0])
        np.testing.assert_array_equal(
            np.asarray(fake_cast_e5m2(x)), np.asarray(x)
        )

    def test_e4m3_rounds(self):
        from atom_tpu.quant import fake_cast_e4m3

        x = jnp.array([1.0, 1.0625, 448.0])
        out = np.asarray(fake_cast_e4m3(x))
        np.testing.assert_allclose(out[0], 1.0)
        np.testing.assert_allclose(out[2], 448.0)
        # 1.0625 lies between codes 1.0 and 1.125 -> rounds to even (1.0).
        assert out[1] in (1.0, 1.125)
