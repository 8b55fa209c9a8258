"""Serving engine end-to-end smoke + consistency tests (CPU, tiny geometry).

The reference's serving tests are launch smoke tests (`test_int4.py`) plus a
decode-vs-reference numerics test; here the engine additionally runs REAL
quantized weights end-to-end, so we can assert decode/prefill consistency:
generating token-by-token (through the hot ring, bulk flushes, and the paged
kernel) must reproduce the tokens a longer prefill predicts.
"""
import jax
import jax.numpy as jnp
import numpy as np

from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import ModelConfig, Arch
from atom_tpu.serving import (
    KvPool,
    RequestSet,
    TextGenConfig,
    TextGenEngine,
)
from atom_tpu.serving.model import (
    init_serving_params,
    make_serving_state,
    make_step_fns,
)

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
SPEC = QuantSpec(weight_channel_group=1)
PAGE = 128


def _make_engine(batch_size=4, n_pages=24):
    pool = KvPool(
        TINY.num_layers, n_pages, TINY.num_kv_heads, PAGE, TINY.head_dim
    )
    params = init_serving_params(jax.random.PRNGKey(0), TINY, SPEC)
    state = make_serving_state(
        TINY.num_layers, n_pages, batch_size, TINY.num_kv_heads, PAGE,
        TINY.head_dim,
    )
    prefill_fn, decode_fn = make_step_fns(params, TINY, SPEC)
    cfg = TextGenConfig(
        batch_size=batch_size,
        page_size=PAGE,
        max_seq_len=512,
        prefill_buckets=(64, 128),
    )
    return TextGenEngine(cfg, pool, prefill_fn, decode_fn, state), pool


def test_engine_completes_workload():
    engine, pool = _make_engine()
    rng = np.random.Generator(np.random.PCG64(3))
    n_req = 6
    prompt_lens = rng.integers(3, 40, n_req).astype(np.int32)
    output_lens = rng.integers(2, 50, n_req).astype(np.int32)
    rs = RequestSet(
        prompt_lens,
        output_lens,
        [rng.integers(1, TINY.vocab_size, p).astype(np.int32) for p in prompt_lens],
    )
    free_before = pool.num_free_pages
    result = engine.run(rs)
    assert result["requests"] == n_req
    assert result["output_tokens"] == int(output_lens.sum())
    assert result["throughput_tok_s"] > 0
    # all pages returned to the pool
    assert pool.num_free_pages == free_before


def _run_decode_prefill_consistency(cfg, spec=None):
    from atom_tpu.serving.kvpool import SeqKvCache, batch_page_table
    from atom_tpu.serving.model import decode_step, prefill_step

    SPEC = spec if spec is not None else globals()["SPEC"]
    n_pages = 12
    pool = KvPool(cfg.num_layers, n_pages, cfg.num_kv_heads, PAGE, cfg.head_dim)
    params = init_serving_params(jax.random.PRNGKey(1), cfg, SPEC)
    state = make_serving_state(
        cfg.num_layers, n_pages, 1, cfg.num_kv_heads, PAGE, cfg.head_dim
    )
    rng = np.random.Generator(np.random.PCG64(9))
    prompt = rng.integers(1, cfg.vocab_size, 27).astype(np.int32)
    n_gen = 40  # crosses the W=32 flush boundary at len 32 and 64

    # Path A: prefill prompt, then decode step-by-step.
    kv = SeqKvCache(pool, len(prompt))
    bucket = 32
    ids = np.zeros((bucket,), np.int32)
    ids[: len(prompt)] = prompt
    table_row = np.zeros((4,), np.int32)
    table_row[: len(kv.page_ids)] = kv.page_ids
    tok, state = prefill_step(
        params, state, jnp.asarray(ids), jnp.asarray(table_row),
        jnp.int32(len(prompt)), jnp.int32(0), cfg, SPEC,
    )
    generated = [int(tok)]
    for i in range(n_gen - 1):
        kv.acquire_one()
        table, lens = batch_page_table([kv], 4)
        tok, state = decode_step(
            params, state,
            jnp.asarray([generated[-1]], jnp.int32),
            jnp.asarray(table), jnp.asarray(lens),
            cfg, SPEC,
            flush=((i + 1) % 32 == 0),  # the host's ring-wrap cadence
        )
        generated.append(int(tok[0]))

    # Path B: prefill (prompt + generated[:k]) and compare next-token preds
    # around the flush boundaries and at the end.
    #
    # NOTE: exact agreement is NOT guaranteed — prefill and decode are
    # different compiled programs, and 1-ulp f32 reassociation occasionally
    # flips a KV code sitting exactly on a quantization rounding boundary
    # (measured: 1 code in ~7000), which can flip a near-tie argmax.  The
    # bit-exact state machinery (ring order, flush placement, merge math) is
    # covered by the op-level tests; here we require a strong majority.
    mismatches = 0
    checks = (1, 4, 5, 6, 37, 38, n_gen - 1)
    for k in checks:
        kv2 = SeqKvCache(pool, len(prompt) + k)
        bucket2 = 128
        ids2 = np.zeros((bucket2,), np.int32)
        seq = np.concatenate([prompt, np.asarray(generated[:k], np.int32)])
        ids2[: len(seq)] = seq
        tr2 = np.zeros((4,), np.int32)
        tr2[: len(kv2.page_ids)] = kv2.page_ids
        tok2, state = prefill_step(
            params, state, jnp.asarray(ids2), jnp.asarray(tr2),
            jnp.int32(len(seq)), jnp.int32(0), cfg, SPEC,
        )
        if int(tok2) != generated[k]:
            mismatches += 1
        kv2.release()
    assert mismatches <= 2, (
        f"{mismatches}/{len(checks)} prefill-continuation checks diverged"
    )


def test_decode_matches_prefill_continuation():
    """MHA geometry (unfused qkv path: n_kv % 512 != 0)."""
    _run_decode_prefill_consistency(TINY)


GQA_FUSED_CFG = ModelConfig(
    arch=Arch.LLAMA,
    vocab_size=199,
    hidden_size=512,
    intermediate_size=768,
    num_layers=2,
    num_heads=8,
    num_kv_heads=4,
    head_dim=128,
    max_position_embeddings=512,
)


def test_decode_matches_prefill_continuation_gqa_fused():
    """GQA geometry through the FUSED qkv epilogue (n_q=1024, n_kv=512,
    groups=2) — the 70B-class head layout at tiny hidden size.

    Runs with ``fused_serving=False``: the strict <=2/7 argmax bound needs
    prefill and decode to share the XLA quantize chains; the fused
    norm+quant-prologue kernels are separately-compiled programs whose f32
    reassociation flips enough near-tie argmaxes at vocab-199 random
    weights to make an argmax bound meaningless (measured 4/7).  The fused
    path's numerics are pinned directly by
    ``test_fused_decode_hidden_matches_unfused`` below and
    tests/test_pallas_fused_in.py.
    """
    _run_decode_prefill_consistency(
        GQA_FUSED_CFG, spec=SPEC.replace(fused_serving=False)
    )


def test_fused_decode_hidden_matches_unfused(monkeypatch):
    """One decode step at the GQA geometry, fused_serving on vs off, same
    params/state: hidden states agree to quantization-flip tolerance.

    Bound calibration (round 5): the fused kernels are BITWISE-equal to the
    unfused chains on captured leaf inputs ON HARDWARE (norm statistic
    hoisted to XLA as ``rstd``, residual-add rounding pinned via ``_rp``,
    the quantizer's bf16 dtype contract pinned via ``reduce_precision``).
    On the CPU CLIENT this suite runs under, 1-ulp f32 fuzz BETWEEN
    SEPARATELY-COMPILED programs (FMA/reassociation/excess-precision
    choices differ per program instance) seeds ~0.05% quantizer code flips
    (scripts/probe_cpu_parity.py), which dynamic act-block scales amplify —
    one flipped absmax rescales all 128 codes of its block — to a measured
    13.3% of elements moving >0.05 after 2 layers on the current toolchain
    (was 9.7% on round 4's).  That overlaps the 12.7-13% damage of the r3
    HARDWARE divergence, so this CPU test CANNOT be the tripwire for that
    class (ADVICE r4): the hardware tripwire is ``scripts/hw_smoke.py
    --paths parity`` (frac>0.05 < 2% on-chip, where the pins make the
    paths near-bitwise), run at the top of every TPU queue.  Here we keep
    only the structural bound: a real wiring bug moves ~every element or
    blows max|d| past O(1)."""
    from atom_tpu.serving.model import decode_hidden

    monkeypatch.setenv("ATOM_TPU_FUSED_MLP", "1")  # opt-in since round 5
    cfg = GQA_FUSED_CFG
    b, n_pages = 32, 12
    nofuse = SPEC.replace(fused_serving=False)
    fused = SPEC.replace(fused_serving=True)
    params = init_serving_params(jax.random.PRNGKey(5), cfg, SPEC)
    rng = np.random.Generator(np.random.PCG64(6))
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, b), jnp.int32)
    table = jnp.zeros((b, 2), jnp.int32)
    lens = jnp.ones((b,), jnp.int32)

    outs = {}
    for name, sp in (("fused", fused), ("nofuse", nofuse)):
        state = make_serving_state(
            cfg.num_layers, n_pages, b, cfg.num_kv_heads, PAGE, cfg.head_dim
        )
        x, _ = decode_hidden(params, state, ids, table, lens, cfg, sp)
        outs[name] = np.asarray(x, np.float32)
    # sparse quantization-boundary flips propagate through 2 layers: bound
    # the damage (a systematic error would move EVERY element), don't demand
    # element-wise closeness
    diff = np.abs(outs["fused"] - outs["nofuse"])
    # structural bound only — see docstring; the r3-failure-class tripwire
    # lives in hw_smoke's on-chip parity path, not in this CPU suite
    assert np.mean(diff > 0.05) < 0.25, (
        f"{np.mean(diff > 0.05):.2%} elements moved > 0.05"
    )
    assert diff.max() < 1.5, f"max divergence {diff.max():.3f}"


def test_engine_error_paths():
    """Prompt over the largest bucket -> clean ValueError; KV pool exhaustion
    -> RuntimeError (the reference's kvcache asserts on empty free-list)."""
    import pytest

    from atom_tpu.serving.kvpool import KvPool

    engine, pool = _make_engine(batch_size=2, n_pages=24)
    rng = np.random.Generator(np.random.PCG64(4))
    long_prompt = rng.integers(1, TINY.vocab_size, 300).astype(np.int32)
    rs = RequestSet(
        np.asarray([300], np.int32), np.asarray([4], np.int32), [long_prompt]
    )
    with pytest.raises(ValueError, match="exceeds largest prefill bucket"):
        engine.run(rs)

    small_pool = KvPool(TINY.num_layers, 2, TINY.num_kv_heads, PAGE, TINY.head_dim)
    with pytest.raises(RuntimeError, match="exhausted"):
        small_pool.alloc(5)


def test_late_joining_sequence_flush_correctness():
    """A request admitted mid-ring-window (nonzero ring row at prefill) must
    decode correctly across the synchronized flush: its pending block spans
    only part of the ring, and rows written before it joined must be masked.
    """
    from atom_tpu.serving.kvpool import SeqKvCache, batch_page_table
    from atom_tpu.serving.model import decode_step, prefill_step

    n_pages = 16
    pool = KvPool(TINY.num_layers, n_pages, TINY.num_kv_heads, PAGE, TINY.head_dim)
    params = init_serving_params(jax.random.PRNGKey(6), TINY, SPEC)
    state = make_serving_state(
        TINY.num_layers, n_pages, 2, TINY.num_kv_heads, PAGE, TINY.head_dim
    )
    rng = np.random.Generator(np.random.PCG64(12))
    prompt_a = rng.integers(1, TINY.vocab_size, 19).astype(np.int32)
    prompt_b = rng.integers(1, TINY.vocab_size, 11).astype(np.int32)

    def prefill(slot, prompt, kv):
        ids = np.zeros((32,), np.int32)
        ids[: len(prompt)] = prompt
        tr = np.zeros((4,), np.int32)
        tr[: len(kv.page_ids)] = kv.page_ids
        tok, st = prefill_step(
            params, state, jnp.asarray(ids), jnp.asarray(tr),
            jnp.int32(len(prompt)), jnp.int32(slot), TINY, SPEC,
        )
        return int(tok), st

    # seq A joins at step 0; seq B joins 13 steps later (ring row 13)
    kv_a = SeqKvCache(pool, len(prompt_a))
    tok_a, state = prefill(0, prompt_a, kv_a)
    gen_a = [tok_a]
    gen_b = []
    kv_b = None
    ids = np.zeros((2,), np.int32)
    n_steps = 45  # crosses the flush at step 32
    for i in range(n_steps):
        if i == 13:
            kv_b = SeqKvCache(pool, len(prompt_b))
            tok_b, state = prefill(1, prompt_b, kv_b)
            gen_b.append(tok_b)
        kv_a.acquire_one()
        ids[0] = gen_a[-1]
        if kv_b is not None:
            kv_b.acquire_one()
            ids[1] = gen_b[-1]
        table, lens = batch_page_table([kv_a, kv_b], 4)
        tok, state = decode_step(
            params, state, jnp.asarray(ids), jnp.asarray(table),
            jnp.asarray(lens), TINY, SPEC,
            flush=((i + 1) % 32 == 0),
        )
        gen_a.append(int(tok[0]))
        if kv_b is not None:
            gen_b.append(int(tok[1]))

    # both sequences reproduce fresh-prefill continuations (majority; see
    # the quantization-boundary note in _run_decode_prefill_consistency)
    mismatches = 0
    checks = 0
    for prompt, gen in ((prompt_a, gen_a), (prompt_b, gen_b)):
        for k in (len(gen) - 6, len(gen) - 1):
            kv2 = SeqKvCache(pool, len(prompt) + k)
            ids2 = np.zeros((128,), np.int32)
            seq = np.concatenate([prompt, np.asarray(gen[:k], np.int32)])
            ids2[: len(seq)] = seq
            tr2 = np.zeros((4,), np.int32)
            tr2[: len(kv2.page_ids)] = kv2.page_ids
            tok2, state = prefill_step(
                params, state, jnp.asarray(ids2), jnp.asarray(tr2),
                jnp.int32(len(seq)), jnp.int32(0), TINY, SPEC,
            )
            checks += 1
            if int(tok2) != gen[k]:
                mismatches += 1
            kv2.release()
    assert mismatches <= 1, f"{mismatches}/{checks} continuations diverged"


def test_quantized_lm_head_option():
    """Opt-in W4A16 lm_head: logits stay close to the bf16 head and the
    decode step runs end-to-end with the quantized head."""
    from atom_tpu.serving.kvpool import SeqKvCache, batch_page_table
    from atom_tpu.serving.model import (
        _lm_head_logits,
        decode_step,
        prefill_step,
        quantize_lm_head,
    )

    params = init_serving_params(jax.random.PRNGKey(2), TINY, SPEC)
    qparams = quantize_lm_head(params)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, TINY.hidden_size), jnp.bfloat16)
    ref = np.asarray(_lm_head_logits(x, params.lm_head))
    got = np.asarray(_lm_head_logits(x, qparams.lm_head, TINY.vocab_size))
    # random-weight logits are near-zero sums; at this tiny K (2 quant
    # groups) the INT4 error is relatively large — check direction + spread
    err = np.abs(got - ref).mean() / (ref.std() + 1e-9)
    cos = float((ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert err < 0.15 and cos > 0.98, (err, cos)

    # full prefill+decode runs with the quantized head
    pool = KvPool(TINY.num_layers, 8, TINY.num_kv_heads, PAGE, TINY.head_dim)
    state = make_serving_state(
        TINY.num_layers, 8, 1, TINY.num_kv_heads, PAGE, TINY.head_dim
    )
    rng = np.random.Generator(np.random.PCG64(2))
    prompt = rng.integers(1, TINY.vocab_size, 9).astype(np.int32)
    ids = np.zeros((32,), np.int32)
    ids[: len(prompt)] = prompt
    kv = SeqKvCache(pool, len(prompt))
    tr = np.zeros((4,), np.int32)
    tr[: len(kv.page_ids)] = kv.page_ids
    tok, state = prefill_step(
        qparams, state, jnp.asarray(ids), jnp.asarray(tr),
        jnp.int32(len(prompt)), jnp.int32(0), TINY, SPEC,
    )
    kv.acquire_one()
    table, lens = batch_page_table([kv], 4)
    tok2, state = decode_step(
        qparams, state, jnp.asarray([int(tok)], jnp.int32),
        jnp.asarray(table), jnp.asarray(lens), TINY, SPEC,
    )
    assert 0 <= int(tok2[0]) < TINY.vocab_size


def test_w4a16_head_logits_delta():
    """Quantified basis for the lm_head precision default (W8A16).

    Probe on iid-gaussian logits — the WORST case for argmax stability
    (top-1 margins among 4096 iid gaussians are tiny; real-model margins
    are far larger).  The INT8 head must stay essentially noise-free even
    here; the INT4 head's measured numbers (~11%% noise, ~77%% worst-case
    agreement) are why it is opt-in rather than the default.
    """
    import jax
    import jax.numpy as jnp

    from atom_tpu.ops.pallas_gemm_w4a16 import quantize_w4a16, quantize_w8a16
    from atom_tpu.serving.model import _lm_head_logits

    d, v, n = 1024, 4096, 256
    head = jax.random.normal(jax.random.PRNGKey(0), (d, v), jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(1), (n, d), jnp.bfloat16)
    ref = _lm_head_logits(x, head)

    def probe(quantized):
        q = _lm_head_logits(x, quantized)
        noise = float(jnp.std(q - ref)) / float(jnp.std(ref))
        agree = float(jnp.mean(
            (jnp.argmax(ref, -1) == jnp.argmax(q, -1)).astype(jnp.float32)
        ))
        return noise, agree

    noise8, agree8 = probe(quantize_w8a16(head.astype(jnp.float32)))
    assert noise8 < 0.02, f"W8A16 logits noise {noise8:.4f} >= 2%"
    assert agree8 >= 0.95, f"W8A16 worst-case argmax agreement {agree8:.3f}"

    noise4, agree4 = probe(quantize_w4a16(head.astype(jnp.float32)))
    assert noise4 < 0.2, f"W4A16 logits noise {noise4:.4f} drifted"
    assert agree4 >= 0.6, f"W4A16 worst-case argmax agreement {agree4:.3f}"
    # the gap that motivates the default:
    assert noise8 * 5 < noise4


def test_scanned_prefill_attention_matches_onepass():
    """causal_code_attention(key_block>0) — the flash-style long-context
    path — must match the one-pass softmax to f32 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from atom_tpu.ops import reference as R
    from atom_tpu.serving.model import causal_code_attention

    t, h, dh, groups = 640, 4, 128, 2  # GQA: 8 q heads over 4 kv heads
    q = jax.random.normal(jax.random.PRNGKey(0), (t, h * groups, dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (t, h, dh), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (t, h, dh), jnp.float32)
    kq = R.quantize_kv_asym(k)
    vq = R.quantize_kv_asym(v)
    ref = causal_code_attention(q, kq, vq, groups, dh ** -0.5, key_block=0)
    for kb in (128, 320):
        out = causal_code_attention(q, kq, vq, groups, dh ** -0.5, key_block=kb)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,  # bf16 output grid
        )


def test_long_context_prefill_4k():
    """Monolithic prefill past the 2048 scan threshold: a 4096-token prompt
    through prefill_step (flash-style scanned attention, no [H,T,T]
    materialization), with a decode continuation on the resulting pages."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from atom_tpu.config import QuantSpec
    from atom_tpu.models.configs import Arch, ModelConfig
    from atom_tpu.serving.model import (
        decode_step, init_serving_params, make_serving_state, prefill_step,
    )

    cfg = ModelConfig(
        arch=Arch.LLAMA, vocab_size=256, hidden_size=512,
        intermediate_size=1024, num_layers=1, num_heads=4, num_kv_heads=4,
        head_dim=128,
    )
    spec = QuantSpec(weight_channel_group=1)
    page, batch = 256, 2
    t_true = 4000
    params = init_serving_params(jax.random.PRNGKey(0), cfg, spec)
    rng = np.random.Generator(np.random.PCG64(4))
    prompt = rng.integers(1, cfg.vocab_size, t_true).astype(np.int32)
    n_pages = 20
    state = make_serving_state(
        cfg.num_layers, n_pages, batch, cfg.num_kv_heads, page, cfg.head_dim
    )
    ids = np.zeros((4096,), np.int32)
    ids[:t_true] = prompt
    table_row = jnp.asarray(list(range(1, 17)) + [0] * 4, jnp.int32)
    tok, state = prefill_step(
        params, state, jnp.asarray(ids), table_row, jnp.int32(t_true),
        jnp.int32(0), cfg, spec,
    )
    assert 0 <= int(tok) < cfg.vocab_size
    assert int(state.flushed[0]) == t_true
    # decode continuation over the 4k-token pages
    table = jnp.asarray([list(range(1, 17)) + [0] * 4, [0] * 20], jnp.int32)
    lens = t_true
    ids_b = jnp.asarray([int(tok), 0], jnp.int32)
    for _ in range(3):
        lens += 1
        ids_b2, state = decode_step(
            params, state, ids_b, table, jnp.asarray([lens, 0], jnp.int32),
            cfg, spec,
        )
        assert 0 <= int(ids_b2[0]) < cfg.vocab_size
        ids_b = jnp.asarray([int(ids_b2[0]), 0], jnp.int32)
