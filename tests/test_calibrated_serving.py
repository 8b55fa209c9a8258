"""Calibrate -> serve bridge: exact weight transfer + end-to-end parity.

The reference splits calibration (``model/``, fake-quant torch) from serving
(``e2e/punica-atom``, real kernels) and bridges them offline; here the bridge
is ``models.hf_loader.pack_calibrated_params``.  These tests pin its two
exactness contracts and the end-to-end behavior:

  * RTN: packing the REORDERED ORIGINAL weights reproduces the accuracy
    pipeline's fake-quant values bit-for-bit (shared ``compute_scale_sym``).
  * GPTQ: codes are recovered exactly on the scales exported by
    ``calibrate(..., scales_out=...)`` (the grid comes from error-compensated
    weights mid-loop and is NOT derivable from the fake values).
  * A calibrated model served through the real-kernel prefill produces the
    same logits as the accuracy-pipeline forward (up to cross-program
    activation-quant rounding).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atom_tpu.calib.pipeline import calibrate, reorder_model
from atom_tpu.config import QuantSpec
from atom_tpu.models import llama
from atom_tpu.models.configs import Arch, ModelConfig
from atom_tpu.models.hf_loader import pack_calibrated_params
from atom_tpu.ops.formats import dequantize_weight, unpack_from_kernel

TINY = ModelConfig(
    arch=Arch.LLAMA,
    vocab_size=199,
    hidden_size=256,
    intermediate_size=384,
    num_layers=2,
    num_heads=2,
    num_kv_heads=2,
    head_dim=128,
    max_position_embeddings=512,
)
SPEC_RTN = QuantSpec(use_gptq=False)
SPEC_GPTQ = QuantSpec(use_gptq=True)


def _calib_inputs():
    # float32 params: the exactness contract is about the quantization math;
    # bf16 storage would interpose value rounding orthogonal to it.
    params = llama.init_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
    rng = np.random.Generator(np.random.PCG64(7))
    batches = [
        jnp.asarray(rng.integers(1, TINY.vocab_size, (1, 64)), jnp.int32)
        for _ in range(2)
    ]
    return params, batches


def _fused_fake(lp, names):
    return jnp.concatenate([lp[n] for n in names], axis=1).astype(jnp.float32)


def _check_layer(sp_layer, lp, *, keeper, exact_body=True):
    """Dequantized packed weights vs the accuracy model's fake-quant values."""
    for kw, names in (
        (sp_layer.wqkv, ("wq", "wk", "wv")),
        (sp_layer.wo, ("wo",)),
        (sp_layer.wgateup, ("wgate", "wup")),
        (sp_layer.wdown, ("wdown",)),
    ):
        fake = _fused_fake(lp, names)
        deq = np.asarray(dequantize_weight(unpack_from_kernel(kw), jnp.float32))
        body_got, body_want = deq[:-keeper], np.asarray(fake)[:-keeper]
        if exact_body:
            assert np.array_equal(body_got, body_want), (
                names,
                float(np.abs(body_got - body_want).max()),
            )
        else:
            np.testing.assert_allclose(body_got, body_want, rtol=1e-5, atol=1e-6)
        # Keeper grid re-derives from the fake values up to 1-ulp scale noise
        # (absmax/127 of values that are themselves code*scale products).
        np.testing.assert_allclose(
            deq[-keeper:], np.asarray(fake)[-keeper:], rtol=1e-5, atol=1e-7
        )


@pytest.mark.quick
def test_rtn_pack_from_originals_is_exact():
    params, batches = _calib_inputs()
    calib, idx = calibrate(params, TINY, SPEC_RTN, batches)
    orig_reordered = reorder_model(params, TINY, idx)
    sp = pack_calibrated_params(
        calib, TINY, SPEC_RTN, orig_params=orig_reordered
    )
    for i in range(TINY.num_layers):
        lp = jax.tree.map(lambda a: a[i], calib["layers"])
        _check_layer(sp.layers[i], lp, keeper=SPEC_RTN.keeper)
        # Reorder indices and norms transfer untouched.
        assert np.array_equal(sp.layers[i].attn_reorder, lp["attn_ln_idx"])
        assert np.array_equal(sp.layers[i].o_reorder, lp["attn_out_idx"])
        assert np.array_equal(sp.layers[i].mlp_reorder, lp["mlp_ln_idx"])


@pytest.mark.quick
def test_gptq_pack_on_exported_scales_is_exact():
    params, batches = _calib_inputs()
    scales = {}
    calib, _ = calibrate(params, TINY, SPEC_GPTQ, batches, scales_out=scales)
    assert set(scales) == {
        f"{i}.{w}"
        for i in range(TINY.num_layers)
        for w in ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown")
    }
    sp = pack_calibrated_params(calib, TINY, SPEC_GPTQ, gptq_scales=scales)
    for i in range(TINY.num_layers):
        lp = jax.tree.map(lambda a: a[i], calib["layers"])
        # GPTQ's quantized value lands in place as w - ((w - q)/d)*d, which is
        # q only up to f32 rounding (~1 ulp) — codes recover exactly on the
        # exported scales, values compare near-exactly.
        _check_layer(sp.layers[i], lp, keeper=SPEC_GPTQ.keeper, exact_body=False)


@pytest.mark.quick
def test_fallback_requant_is_near_exact():
    """No originals, no scales: clip must NOT be re-applied; values stay on
    (or within one step of) the grid."""
    params, batches = _calib_inputs()
    calib, idx = calibrate(params, TINY, SPEC_RTN, batches)
    sp = pack_calibrated_params(calib, TINY, SPEC_RTN)
    for i in range(TINY.num_layers):
        lp = jax.tree.map(lambda a: a[i], calib["layers"])
        fake = _fused_fake(lp, ("wq", "wk", "wv"))
        deq = np.asarray(
            dequantize_weight(unpack_from_kernel(sp.layers[i].wqkv), jnp.float32)
        )
        err = np.abs(deq - np.asarray(fake))
        # One INT4 step on the widest plausible grid (scale' <= 8/7 * scale).
        step = np.abs(np.asarray(fake)).max() / 7 * (8 / 7)
        assert err.max() <= step + 1e-6, err.max()
        assert np.mean(err > 1e-6) < 0.35  # most values land exactly


def test_served_logits_match_accuracy_pipeline():
    """Real-kernel prefill over a GPTQ-calibrated model ~= accuracy forward.

    The two are the SAME computation at different rounding points (serving
    runs bf16 embeddings/norms and fused kernels where the accuracy sim is
    f32 XLA), and at W4A4 each flipped INT4 activation code perturbs its
    token's whole row by ~a quant step — measured on this geometry: corr
    ~0.988, argmax agreement ~0.77-0.81, |diff| ~15% of |logit| mean.  So the
    gates are STRUCTURAL: a wiring bug (wrong reorder, scale layout, RoPE
    placement) collapses correlation to ~0 and argmax agreement to ~1/vocab,
    which is what this test exists to catch.
    """
    from atom_tpu.serving.kvpool import KvPool, SeqKvCache
    from atom_tpu.serving.model import (
        _lm_head_logits,
        make_serving_state,
        prefill_hidden,
    )

    params, batches = _calib_inputs()
    scales = {}
    calib, _ = calibrate(params, TINY, SPEC_GPTQ, batches, scales_out=scales)
    sp = pack_calibrated_params(calib, TINY, SPEC_GPTQ, gptq_scales=scales)

    rng = np.random.Generator(np.random.PCG64(3))
    t = 48
    ids = jnp.asarray(rng.integers(1, TINY.vocab_size, t), jnp.int32)

    want = np.asarray(
        llama.forward(calib, ids[None], TINY, SPEC_GPTQ)[0], np.float32
    )

    page = 128
    pool = KvPool(TINY.num_layers, 8, TINY.num_kv_heads, page, TINY.head_dim)
    kv = SeqKvCache(pool, t)
    state = make_serving_state(
        TINY.num_layers, 8, 1, TINY.num_kv_heads, page, TINY.head_dim
    )
    table_row = np.zeros((4,), np.int32)
    table_row[: len(kv.page_ids)] = kv.page_ids
    x, _ = prefill_hidden(
        sp, state.pages, ids, jnp.asarray(table_row), TINY, SPEC_GPTQ
    )
    got = np.asarray(
        _lm_head_logits(x, sp.lm_head, TINY.vocab_size), np.float32
    )

    assert got.shape == want.shape == (t, TINY.vocab_size)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.97, corr
    assert np.abs(got - want).mean() < 0.25 * np.abs(want).mean()
    argmax_agree = np.mean(got.argmax(-1) == want.argmax(-1))
    assert argmax_agree >= 0.6, argmax_agree


MOE_TINY = ModelConfig(
    arch=Arch.MIXTRAL,
    vocab_size=199,
    hidden_size=256,
    intermediate_size=384,
    num_layers=2,
    num_heads=2,
    num_kv_heads=2,
    head_dim=128,
    num_experts=4,
    num_experts_per_tok=2,
)


def test_moe_gptq_pack_and_served_logits():
    """Mixtral bridge: exact expert-weight transfer + structural logits
    parity between the accuracy forward and the real-kernel MoE prefill."""
    from atom_tpu.models import mixtral
    from atom_tpu.models.hf_loader import pack_calibrated_params_moe
    from atom_tpu.serving.model import _lm_head_logits, make_serving_state
    from atom_tpu.serving.moe import prefill_hidden_moe

    params = mixtral.init_params(jax.random.PRNGKey(0), MOE_TINY, jnp.float32)
    rng = np.random.Generator(np.random.PCG64(11))
    batches = [
        jnp.asarray(rng.integers(1, MOE_TINY.vocab_size, (1, 64)), jnp.int32)
        for _ in range(2)
    ]
    scales = {}
    calib, _ = calibrate(params, MOE_TINY, SPEC_GPTQ, batches,
                         scales_out=scales)
    sp = pack_calibrated_params_moe(
        calib, MOE_TINY, SPEC_GPTQ, gptq_scales=scales
    )

    # exact transfer of the stacked expert weights (values near-exact: GPTQ
    # lands q as w - ((w-q)/d)*d, ~1 ulp off the code*scale product)
    lp = jax.tree.map(lambda a: a[0], calib["layers"])
    k = SPEC_GPTQ.keeper
    for e in range(MOE_TINY.num_experts):
        fake = jnp.concatenate(
            [lp["w1"][e], lp["w3"][e]], axis=1
        ).astype(jnp.float32)
        kw = jax.tree.map(lambda a: a[e], sp.layers[0].wgateup)
        deq = np.asarray(dequantize_weight(unpack_from_kernel(kw), jnp.float32))
        np.testing.assert_allclose(
            deq[:-k], np.asarray(fake)[:-k], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            deq[-k:], np.asarray(fake)[-k:], rtol=1e-5, atol=1e-7
        )

    # structural logits parity (see the Llama test for the gate rationale)
    t = 48
    ids = jnp.asarray(rng.integers(1, MOE_TINY.vocab_size, t), jnp.int32)
    want = np.asarray(
        mixtral.forward(calib, ids[None], MOE_TINY, SPEC_GPTQ)[0], np.float32
    )
    state = make_serving_state(
        MOE_TINY.num_layers, 4, 1, MOE_TINY.num_kv_heads, 128,
        MOE_TINY.head_dim,
    )
    table_row = jnp.arange(1, 2, dtype=jnp.int32)
    x, _ = prefill_hidden_moe(
        sp, state.pages, ids, table_row, MOE_TINY, SPEC_GPTQ
    )
    got = np.asarray(
        _lm_head_logits(x, sp.lm_head, MOE_TINY.vocab_size), np.float32
    )
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.97, corr
    assert np.abs(got - want).mean() < 0.25 * np.abs(want).mean()


def test_hf_checkpoint_to_engine_journey(tmp_path):
    """The full user journey: a local HF Llama checkpoint -> CLI calibration
    (GPTQ) -> --export_serving -> load_serving -> continuous-batching engine
    generating tokens.  Geometry derives from the checkpoint's own config
    (the preset name only picks dataset defaults)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import LlamaConfig, LlamaForCausalLM

    from atom_tpu import main as cli
    from atom_tpu.serving import (
        KvPool,
        RequestSet,
        TextGenConfig,
        TextGenEngine,
    )
    from atom_tpu.serving.model import make_serving_state, make_step_fns
    from atom_tpu.utils.checkpoint import load_serving

    hf_cfg = LlamaConfig(
        vocab_size=199, hidden_size=256, intermediate_size=384,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(hf_cfg).eval().save_pretrained(str(tmp_path / "hf"))

    out = str(tmp_path / "srv")
    cli.main([
        "tiny-llama", "synthetic", "--hf_path", str(tmp_path / "hf"),
        "--use_gptq", "--reorder", "--calib_samples", "2",
        "--seqlen", "64", "--export_serving", out,
    ])

    params, cfg, spec = load_serving(out)
    assert cfg.hidden_size == 256 and cfg.num_layers == 2

    page = 128
    tg = TextGenConfig(
        batch_size=2, page_size=page, max_seq_len=256,
        prefill_buckets=(32, 64),
    )
    n_pages = 2 * 2 + 2
    pool = KvPool(cfg.num_layers, n_pages, cfg.num_kv_heads, page, cfg.head_dim)
    state = make_serving_state(
        cfg.num_layers, n_pages, 2, cfg.num_kv_heads, page, cfg.head_dim
    )
    engine = TextGenEngine(
        tg, pool, *make_step_fns(params, cfg, spec), state
    )
    rng = np.random.Generator(np.random.PCG64(2))
    rs = RequestSet(
        np.asarray([5, 9], np.int32),
        np.asarray([40, 40], np.int32),  # crosses the W=32 ring flush
        [rng.integers(1, cfg.vocab_size, p).astype(np.int32) for p in (5, 9)],
    )
    free_before = pool.num_free_pages
    res = engine.run(rs, record=True)
    assert res["output_tokens"] == 80
    assert all(len(t) == 40 for t in res["tokens"].values())
    assert pool.num_free_pages == free_before


@pytest.mark.quick
def test_serving_checkpoint_roundtrip(tmp_path):
    """save_serving/load_serving round-trips ServingParams bit-for-bit."""
    from atom_tpu.serving.model import init_serving_params
    from atom_tpu.utils.checkpoint import load_serving, save_serving

    from atom_tpu.serving.moe import init_moe_serving_params

    spec = QuantSpec(use_gptq=False)
    for name, cfg, init in (
        ("llama", TINY, init_serving_params),
        ("moe", MOE_TINY, init_moe_serving_params),
    ):
        sp = init(jax.random.PRNGKey(5), cfg, spec)
        save_serving(str(tmp_path / name), sp, cfg, spec)
        got, cfg2, spec2 = load_serving(str(tmp_path / name))
        assert cfg2 == cfg and spec2 == spec
        for a, b in zip(jax.tree.leaves(sp), jax.tree.leaves(got)):
            assert a.dtype == b.dtype
            assert np.array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32)
            )
