"""Tests for the OPT and Mixtral model families + their calibration wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import ATOM_W4A4, FP16_BASELINE
from atom_tpu.calib import pipeline
from atom_tpu.calib.data import synthetic_loaders
from atom_tpu.models import TINY_MIXTRAL, TINY_OPT
from atom_tpu.models import mixtral, opt
from atom_tpu.utils.eval import perplexity

TINY_SPEC = ATOM_W4A4.replace(weight_group_size=64, act_group_size=64, keeper=64)


class TestOPT:
    @pytest.fixture(scope="class")
    def model(self):
        return opt.init_params(jax.random.PRNGKey(0), TINY_OPT, dtype=jnp.float32)

    def test_forward_finite_and_causal(self, model):
        ids1 = jnp.arange(16).reshape(1, 16) % TINY_OPT.vocab_size
        l1 = opt.forward(model, ids1, TINY_OPT, FP16_BASELINE)
        assert l1.shape == (1, 16, TINY_OPT.vocab_size)
        assert np.isfinite(np.asarray(l1)).all()
        ids2 = ids1.at[0, -1].set(3)
        l2 = opt.forward(model, ids2, TINY_OPT, FP16_BASELINE)
        np.testing.assert_allclose(
            np.asarray(l1[0, :-1]), np.asarray(l2[0, :-1]), atol=1e-5
        )

    def test_reorder_invariance_fp(self, model):
        batches, _ = synthetic_loaders(TINY_OPT.vocab_size, nsamples=2, seqlen=32)
        ids = jnp.asarray(batches[0])
        base = np.asarray(opt.forward(model, ids, TINY_OPT, FP16_BASELINE))
        sal = pipeline.collect_saliency(model, TINY_OPT, batches)
        idx = pipeline.compute_reorder_indices(sal, head_dim=TINY_OPT.head_dim)
        reordered = pipeline.reorder_model(model, TINY_OPT, idx)
        out = np.asarray(opt.forward(reordered, ids, TINY_OPT, FP16_BASELINE))
        np.testing.assert_allclose(base, out, atol=2e-4)

    def test_full_pipeline_gptq(self, model):
        # TINY_OPT hidden=128 == keeper 64 + group 64.
        spec = TINY_SPEC
        batches, test_stream = synthetic_loaders(
            TINY_OPT.vocab_size, nsamples=2, seqlen=32, test_tokens=256
        )
        qparams, _ = pipeline.calibrate(model, TINY_OPT, spec, batches)
        ppl = perplexity(qparams, TINY_OPT, spec, test_stream, seqlen=32)
        assert np.isfinite(ppl)


class TestMixtral:
    @pytest.fixture(scope="class")
    def model(self):
        return mixtral.init_params(
            jax.random.PRNGKey(0), TINY_MIXTRAL, dtype=jnp.float32
        )

    def test_forward_finite(self, model):
        ids = jnp.arange(16).reshape(1, 16) % TINY_MIXTRAL.vocab_size
        logits = mixtral.forward(model, ids, TINY_MIXTRAL, FP16_BASELINE)
        assert logits.shape == (1, 16, TINY_MIXTRAL.vocab_size)
        assert np.isfinite(np.asarray(logits)).all()

    def test_routing_weights_dense(self):
        logits = jnp.array([[1.0, 2.0, 0.5, -1.0], [0.0, 0.0, 5.0, 4.0]])
        w = np.asarray(mixtral.route_top_k(logits, TINY_MIXTRAL))
        # Exactly top-2 nonzero per token, rows sum to 1.
        assert ((w > 0).sum(axis=1) == 2).all()
        np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-6)
        assert w[0, 1] > w[0, 0] > 0 and w[0, 2] == 0
        assert w[1, 2] > w[1, 3] > 0 and w[1, 0] == 0

    def test_moe_matches_explicit_loop(self, model):
        # Dense-masked dispatch == explicit per-expert gather computation.
        lp = mixtral.get_layer(model, 0)
        cfg = TINY_MIXTRAL
        hid = jax.random.normal(
            jax.random.PRNGKey(3), (8, cfg.hidden_size), jnp.float32
        )
        tapf = lambda *_: None
        tapf.collecting = False
        out = np.asarray(mixtral.moe_block(lp, hid, cfg, FP16_BASELINE, tapf))

        logits = hid @ lp["router"]
        w = np.asarray(mixtral.route_top_k(logits, cfg))
        expected = np.zeros((8, cfg.hidden_size), np.float32)
        for t in range(8):
            for e in range(cfg.num_experts):
                if w[t, e] > 0:
                    x = np.asarray(hid[t])
                    g = x @ np.asarray(lp["w1"][e])
                    u = x @ np.asarray(lp["w3"][e])
                    act = (g / (1 + np.exp(-g))) * u
                    expected[t] += w[t, e] * (act @ np.asarray(lp["w2"][e]))
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)

    def test_reorder_invariance_fp(self, model):
        batches, _ = synthetic_loaders(
            TINY_MIXTRAL.vocab_size, nsamples=2, seqlen=32
        )
        ids = jnp.asarray(batches[0])
        base = np.asarray(
            mixtral.forward(model, ids, TINY_MIXTRAL, FP16_BASELINE)
        )
        sal = pipeline.collect_saliency(model, TINY_MIXTRAL, batches)
        idx = pipeline.compute_reorder_indices(sal, head_dim=TINY_MIXTRAL.head_dim)
        reordered = pipeline.reorder_model(model, TINY_MIXTRAL, idx)
        out = np.asarray(
            mixtral.forward(reordered, ids, TINY_MIXTRAL, FP16_BASELINE)
        )
        np.testing.assert_allclose(base, out, atol=3e-4)

    def test_full_pipeline_gptq(self, model):
        spec = TINY_SPEC
        batches, test_stream = synthetic_loaders(
            TINY_MIXTRAL.vocab_size, nsamples=2, seqlen=32, test_tokens=256
        )
        qparams, _ = pipeline.calibrate(model, TINY_MIXTRAL, spec, batches)
        # Router stays unquantized (float) after the pipeline.
        r0 = np.asarray(mixtral.get_layer(model, 0)["router"])
        # (it was reordered, so compare sorted values instead of raw entries)
        rq = np.asarray(mixtral.get_layer(qparams, 0)["router"])
        np.testing.assert_allclose(
            np.sort(r0.ravel()), np.sort(rq.ravel()), atol=1e-6
        )
        ppl = perplexity(qparams, TINY_MIXTRAL, spec, test_stream, seqlen=32)
        assert np.isfinite(ppl)
