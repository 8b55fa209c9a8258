"""Baseline serving stacks (bf16 / W8A8): correctness + burst mechanics."""
import jax
import jax.numpy as jnp
import numpy as np

from atom_tpu.models.configs import Arch, ModelConfig
from atom_tpu.serving.baselines import (
    _quant_w8,
    _w8a8_matmul,
    bf16_decode_burst,
    bf16_decode_step,
    init_bf16_params,
    init_w8_params,
    make_dense_kv,
    w8a8_decode_burst,
)

TINY = ModelConfig(
    arch=Arch.LLAMA,
    vocab_size=101,
    hidden_size=256,
    intermediate_size=384,
    num_layers=2,
    num_heads=2,
    num_kv_heads=1,  # GQA in the baseline path too
    head_dim=128,
)


def test_w8a8_matmul_close_to_fp():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 128), jnp.float32) * 0.05
    got = _w8a8_matmul(x, _quant_w8(w)).astype(jnp.float32)
    want = x @ w
    err = np.abs(np.asarray(got - want)).mean() / np.abs(np.asarray(want)).mean()
    assert err < 0.02, err


def test_bf16_decode_step_and_burst():
    params = init_bf16_params(jax.random.PRNGKey(0), TINY)
    kvs = make_dense_kv(TINY.num_layers, 4, 64, TINY.num_kv_heads, TINY.head_dim)
    ids = jnp.ones((4,), jnp.int32)
    lens = jnp.asarray([3, 5, 1, 7], jnp.int32)
    tok, kvs = bf16_decode_step(params, kvs, ids, lens, TINY)
    assert tok.shape == (4,) and tok.dtype == jnp.int32
    # burst advances lengths and stays finite
    tok2, kvs, lens2 = bf16_decode_burst(params, kvs, tok, lens, jnp.int32(5), TINY)
    np.testing.assert_array_equal(np.asarray(lens2), np.asarray(lens) + 5)
    assert np.all(np.asarray(tok2) >= 0)


def test_w8a8_burst_runs():
    params = init_w8_params(jax.random.PRNGKey(0), TINY)
    kvs = make_dense_kv(TINY.num_layers, 4, 64, TINY.num_kv_heads, TINY.head_dim)
    ids = jnp.ones((4,), jnp.int32)
    lens = jnp.asarray([3, 5, 1, 7], jnp.int32)
    tok, kvs, lens2 = w8a8_decode_burst(params, kvs, ids, lens, jnp.int32(4), TINY)
    np.testing.assert_array_equal(np.asarray(lens2), np.asarray(lens) + 4)
    assert tok.shape == (4,)


def test_bf16_decode_matches_full_attention():
    """Decode-step attention over the ring buffer == full attention oracle."""
    from atom_tpu.models.nn import apply_rope, causal_mask, repeat_kv, rope_tables

    cfg = TINY
    params = init_bf16_params(jax.random.PRNGKey(2), cfg)
    b, t = 2, 6
    kvs = make_dense_kv(cfg.num_layers, b, 16, cfg.num_kv_heads, cfg.head_dim)
    rng = np.random.Generator(np.random.PCG64(0))
    seq = rng.integers(1, cfg.vocab_size, (b, t)).astype(np.int32)

    # feed tokens one by one
    toks = []
    for i in range(t):
        lens = jnp.full((b,), i + 1, jnp.int32)
        tok, kvs = bf16_decode_step(
            params, kvs, jnp.asarray(seq[:, i]), lens, cfg
        )
        toks.append(np.asarray(tok))

    # oracle: full forward over the sequence, argmax at the last position
    x = params.embed[jnp.asarray(seq)].astype(jnp.bfloat16)
    dh = cfg.head_dim
    cos, sin = rope_tables(jnp.arange(t), dh, cfg.rope_theta)
    mask = causal_mask(t, t)
    from atom_tpu.models.nn import rmsnorm

    for lp in params.layers:
        h = rmsnorm(x, lp.ln_attn, cfg.norm_eps)
        q = (h @ lp.wq).reshape(b, t, cfg.num_heads, dh).transpose(0, 2, 1, 3)
        k = (h @ lp.wk).reshape(b, t, cfg.num_kv_heads, dh).transpose(0, 2, 1, 3)
        v = (h @ lp.wv).reshape(b, t, cfg.num_kv_heads, dh).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k.astype(jnp.float32), cos, sin)
        k = repeat_kv(k, cfg.kv_groups)
        v = repeat_kv(v.astype(jnp.float32), cfg.kv_groups)
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k) * (dh ** -0.5)
        p = jax.nn.softmax(s + mask, axis=-1)
        attn = jnp.einsum("bhqk,bhkd->bhqd", p, v).astype(jnp.bfloat16)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, -1)
        x = x + attn @ lp.wo
        hmlp = rmsnorm(x, lp.ln_mlp, cfg.norm_eps)
        act = (
            jax.nn.silu((hmlp @ lp.wgate).astype(jnp.float32))
            * (hmlp @ lp.wup).astype(jnp.float32)
        ).astype(jnp.bfloat16)
        x = x + act @ lp.wdown
    x = rmsnorm(x, params.final_norm, cfg.norm_eps)
    logits = x[:, -1].astype(jnp.float32) @ params.lm_head.astype(jnp.float32)
    want = np.asarray(jnp.argmax(logits, axis=-1))
    np.testing.assert_array_equal(toks[-1], want)


def test_w4a16_gemm_and_burst():
    from atom_tpu.ops.pallas_gemm_w4a16 import (
        dequantize_w4a16,
        quantize_w4a16,
        w4a16_gemm,
    )
    from atom_tpu.serving.baselines import (
        init_w4a16_params,
        make_dense_kv,
        w4a16_decode_burst,
    )

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (256, 192), jnp.float32) * 0.05
    wq = quantize_w4a16(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 256), jnp.bfloat16)
    got = w4a16_gemm(x, wq, interpret=True).astype(jnp.float32)
    want = x.astype(jnp.float32) @ dequantize_w4a16(wq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)

    params = init_w4a16_params(jax.random.PRNGKey(0), TINY)
    kvs = make_dense_kv(TINY.num_layers, 4, 64, TINY.num_kv_heads, TINY.head_dim)
    ids = jnp.ones((4,), jnp.int32)
    lens = jnp.asarray([3, 5, 1, 7], jnp.int32)
    tok, kvs, lens2 = w4a16_decode_burst(params, kvs, ids, lens, jnp.int32(3), TINY)
    np.testing.assert_array_equal(np.asarray(lens2), np.asarray(lens) + 3)


def test_baseline_engine_and_prefill_consistency():
    """All three baseline stacks run the full engine; for bf16 additionally
    check prefill -> decode continuation consistency (decode over the dense
    cache reproduces the token a longer prefill predicts)."""
    import numpy as np

    from atom_tpu.serving import KvPool, RequestSet, TextGenConfig, TextGenEngine
    from atom_tpu.serving.baselines import (
        baseline_prefill_step,
        bf16_decode_step,
        init_w4a16_params,
        init_w8_params,
        make_baseline_step_fns,
    )

    batch = 4
    tg = TextGenConfig(
        batch_size=batch, page_size=64, max_seq_len=256,
        prefill_buckets=(32, 64),
    )
    rng = np.random.Generator(np.random.PCG64(7))
    n_req = 5
    prompt_lens = rng.integers(3, 30, n_req).astype(np.int32)
    output_lens = rng.integers(2, 20, n_req).astype(np.int32)
    rs = RequestSet(
        prompt_lens,
        output_lens,
        [rng.integers(1, TINY.vocab_size, p).astype(np.int32) for p in prompt_lens],
    )
    for stack, init in (
        ("bf16", init_bf16_params),
        ("w8a8", init_w8_params),
        ("w4a16", init_w4a16_params),
    ):
        pool = KvPool(TINY.num_layers, 24, TINY.num_kv_heads, 64, TINY.head_dim)
        params = init(jax.random.PRNGKey(0), TINY)
        state = make_dense_kv(
            TINY.num_layers, batch, tg.max_seq_len, TINY.num_kv_heads,
            TINY.head_dim,
        )
        engine = TextGenEngine(
            tg, pool, *make_baseline_step_fns(params, TINY, stack), state
        )
        res = engine.run(rs)
        assert res["requests"] == n_req, stack
        assert res["output_tokens"] == int(output_lens.sum()), stack

    # --- prefill -> decode continuation (bf16) ---
    params = init_bf16_params(jax.random.PRNGKey(1), TINY)
    kvs = make_dense_kv(TINY.num_layers, 2, 128, TINY.num_kv_heads, TINY.head_dim)
    prompt = rng.integers(1, TINY.vocab_size, 11).astype(np.int32)
    ids = np.zeros((32,), np.int32)
    ids[:11] = prompt
    tok, kvs = baseline_prefill_step(
        params, kvs, jnp.asarray(ids), jnp.int32(11), jnp.int32(0), TINY, "bf16"
    )
    seq = list(prompt)
    cur = int(tok)
    for i in range(6):
        seq.append(cur)
        lens = jnp.asarray([len(seq), 0], jnp.int32)
        nxt, kvs = bf16_decode_step(
            params, kvs, jnp.asarray([cur, 0], np.int32), lens, TINY
        )
        cur = int(nxt[0])
    # oracle: fresh prefill over the whole generated prefix
    kvs2 = make_dense_kv(TINY.num_layers, 1, 128, TINY.num_kv_heads, TINY.head_dim)
    ids2 = np.zeros((32,), np.int32)
    ids2[: len(seq)] = seq
    want, _ = baseline_prefill_step(
        params, kvs2, jnp.asarray(ids2), jnp.int32(len(seq)), jnp.int32(0),
        TINY, "bf16",
    )
    assert cur == int(want)
