"""Tests for the functional fake-quant Llama model + calibration pipeline.

Key invariants (reference parity, SURVEY.md §3.2):
  * at 16-bit the quantizer hook points are no-ops -> plain transformer;
  * the calibration reorder is a pure permutation -> FP16 outputs invariant;
  * the full W4A4 pipeline degrades PPL only moderately on a synthetic corpus;
  * GPTQ runs layer-streamed and produces finite, quantized weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import ATOM_W4A4, FP16_BASELINE, QuantSpec
from atom_tpu.calib import pipeline
from atom_tpu.calib.data import synthetic_loaders
from atom_tpu.models import TINY_LLAMA, TINY_LLAMA_GQA
from atom_tpu.models import llama
from atom_tpu.utils.eval import perplexity

# Tiny spec matching the tiny geometry (hidden 256, head_dim 64): keeper 64,
# groups 64 so hidden/keeper/group alignment mirrors the 4096/128/128 original.
TINY_SPEC = ATOM_W4A4.replace(
    weight_group_size=64, act_group_size=64, keeper=64
)


@pytest.fixture(scope="module")
def tiny_model():
    params = llama.init_params(jax.random.PRNGKey(0), TINY_LLAMA, dtype=jnp.float32)
    return params


@pytest.fixture(scope="module")
def tiny_data():
    return synthetic_loaders(
        TINY_LLAMA.vocab_size, nsamples=4, seqlen=64, test_tokens=1024
    )


class TestForward:
    def test_fp16_forward_finite(self, tiny_model):
        ids = jnp.arange(32).reshape(1, 32) % TINY_LLAMA.vocab_size
        logits = llama.forward(tiny_model, ids, TINY_LLAMA, FP16_BASELINE)
        assert logits.shape == (1, 32, TINY_LLAMA.vocab_size)
        assert np.isfinite(np.asarray(logits)).all()

    def test_causality(self, tiny_model):
        # Changing a future token must not affect earlier logits.
        ids1 = jnp.arange(16).reshape(1, 16) % TINY_LLAMA.vocab_size
        ids2 = ids1.at[0, -1].set(7)
        l1 = llama.forward(tiny_model, ids1, TINY_LLAMA, FP16_BASELINE)
        l2 = llama.forward(tiny_model, ids2, TINY_LLAMA, FP16_BASELINE)
        np.testing.assert_allclose(
            np.asarray(l1[0, :-1]), np.asarray(l2[0, :-1]), atol=1e-5
        )

    def test_gqa_forward(self):
        params = llama.init_params(
            jax.random.PRNGKey(1), TINY_LLAMA_GQA, dtype=jnp.float32
        )
        ids = jnp.arange(16).reshape(1, 16) % TINY_LLAMA_GQA.vocab_size
        logits = llama.forward(params, ids, TINY_LLAMA_GQA, FP16_BASELINE)
        assert np.isfinite(np.asarray(logits)).all()

    def test_taps_shapes(self, tiny_model):
        ids = jnp.arange(16).reshape(1, 16) % TINY_LLAMA.vocab_size
        logits, taps = llama.forward_collect_taps(
            tiny_model, ids, TINY_LLAMA, FP16_BASELINE
        )
        h = TINY_LLAMA.hidden_size
        assert taps["layers.0.self_attn.q_proj.input"].shape == (1, 16, h)
        assert taps["layers.1.mlp.down_proj.input"].shape == (
            1, 16, TINY_LLAMA.intermediate_size,
        )
        # Scan-forward and loop-forward agree.
        l2 = llama.forward(tiny_model, ids, TINY_LLAMA, FP16_BASELINE)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(l2), atol=1e-4
        )

    def test_quantized_forward_close(self, tiny_model):
        ids = jnp.arange(32).reshape(1, 32) % TINY_LLAMA.vocab_size
        base = np.asarray(
            llama.forward(tiny_model, ids, TINY_LLAMA, FP16_BASELINE)
        )
        q = np.asarray(llama.forward(tiny_model, ids, TINY_LLAMA, TINY_SPEC))
        # Activation-only quantization (weights are not pre-quantized here):
        # outputs stay correlated with the fp path.
        corr = np.corrcoef(base.ravel(), q.ravel())[0, 1]
        assert corr > 0.98


class TestReorderInvariance:
    def test_fp_outputs_invariant_under_reorder(self, tiny_model, tiny_data):
        batches, _ = tiny_data
        ids = jnp.asarray(batches[0])
        base = np.asarray(
            llama.forward(tiny_model, ids, TINY_LLAMA, FP16_BASELINE)
        )
        sal = pipeline.collect_saliency(tiny_model, TINY_LLAMA, batches[:2])
        idx = pipeline.compute_reorder_indices(sal, head_dim=TINY_LLAMA.head_dim)
        reordered = pipeline.reorder_model(tiny_model, TINY_LLAMA, idx)
        out = np.asarray(
            llama.forward(reordered, ids, TINY_LLAMA, FP16_BASELINE)
        )
        np.testing.assert_allclose(base, out, atol=2e-4)

    def test_saliency_keys_cover_all_linears(self, tiny_model, tiny_data):
        batches, _ = tiny_data
        sal = pipeline.collect_saliency(tiny_model, TINY_LLAMA, batches[:1])
        for i in range(TINY_LLAMA.num_layers):
            for mod in ("self_attn.q_proj", "mlp.down_proj", "mlp.gate_proj"):
                assert f"layers.{i}.{mod}.input" in sal
                assert f"layers.{i}.{mod}.output" in sal


class TestFullPipeline:
    def test_rtn_pipeline_ppl(self, tiny_model, tiny_data):
        batches, test_stream = tiny_data
        spec = TINY_SPEC.replace(use_gptq=False)
        qparams, idx = pipeline.calibrate(tiny_model, TINY_LLAMA, spec, batches)
        ppl_fp = perplexity(
            tiny_model, TINY_LLAMA, FP16_BASELINE, test_stream, seqlen=64
        )
        ppl_q = perplexity(qparams, TINY_LLAMA, spec, test_stream, seqlen=64)
        assert np.isfinite(ppl_q)
        # Untrained random model: PPL ~ vocab; quantization shouldn't explode it.
        assert ppl_q < ppl_fp * 1.5

    def test_gptq_pipeline_runs_and_quantizes(self, tiny_model, tiny_data):
        batches, test_stream = tiny_data
        spec = TINY_SPEC
        qparams, idx = pipeline.calibrate(
            tiny_model, TINY_LLAMA, spec, batches[:2]
        )
        w = np.asarray(llama.get_layer(qparams, 0)["wq"])
        w0 = np.asarray(llama.get_layer(tiny_model, 0)["wq"])
        assert np.isfinite(w).all()
        assert not np.allclose(w, w0)  # actually changed
        # Body (non-keeper input channels) has few distinct values per group
        # column-block — it sits on a 4-bit grid per (group x channel-group).
        ppl_q = perplexity(qparams, TINY_LLAMA, spec, test_stream, seqlen=64)
        assert np.isfinite(ppl_q)
