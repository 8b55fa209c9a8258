"""Tests for calibration: saliency stats, reorder indices, GPTQ."""
import jax.numpy as jnp
import numpy as np

from atom_tpu.config import KeeperPrecision, QuantType
from atom_tpu.calib.gptq import (
    gptq_add_batch,
    gptq_init,
    gptq_quantize_weight,
)
from atom_tpu.calib.outlier import (
    SaliencyAccumulator,
    abs_mean_update,
    hessian_diag_update,
    invert_permutation,
    reorder_index_ascending,
    reorder_index_per_head,
)


def rng(seed=0):
    return np.random.default_rng(seed)


class TestSaliency:
    def test_hessian_diag_matches_direct(self):
        xs = [rng(i).normal(size=(7, 32)).astype(np.float32) for i in range(4)]
        stats = None
        for x in xs:
            stats = hessian_diag_update(stats, jnp.array(x), nsamples=4)
        direct = sum((2.0 / 4) * (x**2).sum(0) for x in xs)
        np.testing.assert_allclose(np.asarray(stats), direct, rtol=1e-5)

    def test_abs_mean_running_max(self):
        a = np.full((4, 8), 1.0, np.float32)
        b = np.full((4, 8), 3.0, np.float32)
        stats = abs_mean_update(None, jnp.array(a))
        stats = abs_mean_update(stats, jnp.array(b))
        np.testing.assert_allclose(np.asarray(stats), 3.0)

    def test_reorder_outliers_last(self):
        sal = jnp.array([5.0, 1.0, 9.0, 3.0])
        idx = np.asarray(reorder_index_ascending(sal))
        np.testing.assert_array_equal(idx, [1, 3, 0, 2])  # 9.0 lands last

    def test_per_head_descending(self):
        # head_dim 4, 2 heads; outliers first within each head.
        sal = jnp.array([1.0, 4.0, 2.0, 3.0, 10.0, 5.0, 30.0, 20.0])
        idx = np.asarray(reorder_index_per_head(sal, head_dim=4))
        np.testing.assert_array_equal(idx, [1, 3, 2, 0, 6, 7, 4, 5])

    def test_invert_permutation(self):
        p = jnp.array([2, 0, 3, 1])
        x = jnp.array([10.0, 11.0, 12.0, 13.0])
        y = x[p]
        np.testing.assert_array_equal(
            np.asarray(y[invert_permutation(p)]), np.asarray(x)
        )

    def test_accumulator_routing(self):
        acc = SaliencyAccumulator(metric="hessian", nsamples=1)
        acc.update({
            "l.q_proj.input": jnp.ones((2, 8)),
            "l.q_proj.output": jnp.ones((2, 8)),
        })
        idx = acc.reorder_indices(head_dim=4)
        assert idx["l.q_proj.input"].shape == (8,)
        assert idx["l.q_proj.output"].shape == (8,)


class TestHessianAccum:
    def test_matches_closed_form(self):
        st = gptq_init(16)
        xs = [rng(i + 10).normal(size=(3, 16)).astype(np.float32) for i in range(3)]
        for x in xs:
            st = gptq_add_batch(st, jnp.array(x)[None])  # [1, tokens, feat]
        # Running renormalization telescopes to (2/n) * sum X^T X.
        direct = (2.0 / 3) * sum(x.T @ x for x in xs)
        np.testing.assert_allclose(np.asarray(st.hessian), direct, rtol=1e-4)
        assert int(st.nsamples) == 3


class TestGPTQ:
    def _hessian(self, x):
        return jnp.array((2.0 / 1) * x.T @ x)

    def test_identity_hessian_is_rtn(self):
        # With an identity Hessian there is no cross-column correlation: GPTQ
        # must reduce to round-to-nearest on the find_params grid.
        w = rng(1).normal(size=(8, 64)).astype(np.float32)
        h = jnp.eye(64)
        q = np.asarray(
            gptq_quantize_weight(
                jnp.array(w), h, bits=4, sym=True, group_size=0,
                channel_group=1, keeper=0, percdamp=0.0,
            )
        )
        # RTN on the same grid (computed with the same fp32 ops so borderline
        # half-values round identically): scale = 2*absmax/15, zero 8.
        from atom_tpu.calib.gptq import _find_params

        scale, zero = _find_params(jnp.array(w), 4, True, 1, 1.0, QuantType.INT)
        codes = jnp.clip(jnp.round(jnp.array(w) / scale) + zero, 0, 15)
        rtn = np.asarray(scale * (codes - zero))
        s = np.asarray(scale)
        # Exact-half grid points (e.g. w == -absmax -> w/scale == -7.5) may round
        # either way depending on whether the compiler emits x/s or x*(1/s);
        # allow a one-level difference there and demand exactness elsewhere.
        ratio = w / s
        near_half = np.abs(ratio - np.floor(ratio) - 0.5) < 1e-3
        diff = np.abs(q - rtn)
        assert (diff[~near_half] <= 1e-5).all()
        assert (diff[near_half] <= s.repeat(w.shape[1], 1)[near_half] + 1e-5).all()

    def test_correlated_hessian_beats_rtn(self):
        # On a correlated Hessian, GPTQ's compensated solution must achieve a
        # lower H-weighted reconstruction error than round-to-nearest.
        r = rng(2)
        x = r.normal(size=(512, 128)).astype(np.float32)
        # Correlate the inputs.
        mix = r.normal(size=(128, 128)).astype(np.float32) * 0.3 + np.eye(128)
        x = x @ mix
        w = r.normal(size=(32, 128)).astype(np.float32)
        h = self._hessian(x)
        q = np.asarray(
            gptq_quantize_weight(
                jnp.array(w), h, bits=4, sym=True, group_size=64,
                channel_group=1, keeper=0,
            )
        )
        # RTN baseline on the same per-group grid.
        wg = w.reshape(32, 2, 64)
        xmax = np.abs(wg).max(-1, keepdims=True)
        scale = 2 * xmax / 15
        rtn = (np.clip(np.round(wg / scale) + 8, 0, 15) - 8) * scale
        rtn = rtn.reshape(32, 128)
        hn = np.asarray(h)

        def werr(a):
            e = a - w
            return np.trace(e @ hn @ e.T)

        assert werr(q) < werr(rtn) * 0.95

    def test_keeper_compensated_and_int8(self):
        r = rng(3)
        x = r.normal(size=(256, 128)).astype(np.float32)
        w = r.normal(size=(16, 128)).astype(np.float32)
        h = self._hessian(x)
        q = np.asarray(
            gptq_quantize_weight(
                jnp.array(w), h, bits=4, sym=True, group_size=32,
                channel_group=1, keeper=32,
                keeper_precision=KeeperPrecision.INT8,
            )
        )
        keep = q[:, -32:]
        # Keeper block sits on a per-row INT8 grid.
        scales = np.abs(keep).max(1, keepdims=True) / 127.0
        codes = keep / scales
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-2)
        # And is compensated: not simply the original weights quantized.
        raw_keep = w[:, -32:]
        assert not np.allclose(keep, raw_keep, atol=1e-3)

    def test_channel_group_shares_grid(self):
        r = rng(4)
        w = np.zeros((4, 64), np.float32)
        w[0] = r.normal(size=64) * 10
        w[1] = r.normal(size=64) * 0.01  # paired with a big row -> coarse grid
        w[2:] = r.normal(size=(2, 64))
        h = jnp.eye(64)
        q = np.asarray(
            gptq_quantize_weight(
                jnp.array(w), h, bits=4, sym=True, group_size=0,
                channel_group=2, keeper=0, percdamp=0.0,
            )
        )
        # Row 1 is quantized on row 0's grid -> rounds to ~0 everywhere.
        np.testing.assert_allclose(q[1], 0.0, atol=1e-6)

    def test_fp4_codebook_output(self):
        r = rng(5)
        w = r.normal(size=(8, 64)).astype(np.float32)
        h = jnp.eye(64)
        q = np.asarray(
            gptq_quantize_weight(
                jnp.array(w), h, bits=4, sym=True, group_size=32,
                channel_group=1, keeper=0, quant_type=QuantType.FP,
                percdamp=0.0,
            )
        )
        # All outputs land on the FP4 codebook grid (code * scale).
        assert np.isfinite(q).all()
        assert np.abs(q - w).max() < np.abs(w).max()  # sanity: did something

    def test_dead_columns_zeroed(self):
        w = rng(6).normal(size=(4, 32)).astype(np.float32)
        h = np.eye(32, dtype=np.float32)
        h[5, 5] = 0.0  # dead input channel
        q = np.asarray(
            gptq_quantize_weight(
                jnp.array(w), jnp.array(h), bits=4, sym=True, group_size=0,
                channel_group=1, keeper=0,
            )
        )
        np.testing.assert_allclose(q[:, 5], 0.0, atol=1e-6)
