"""Multi-adapter LoRA serving (serving/lora.py) vs oracles.

Covers the reference's LoRA contract (``punica/ops/__init__.py:90-110``,
``models/llama_lora.py:77-211``): per-request adapter gather-matmul
semantics, zero-adapter == base-model equality, per-request isolation in a
mixed batch, and the engine wiring end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import ATOM_W4A4
from atom_tpu.models.configs import Arch, ModelConfig
from atom_tpu.serving import KvPool, TextGenConfig, TextGenEngine
from atom_tpu.serving.lora import (
    LoraManager,
    add_lora,
    init_llama_lora,
    lora_decode_step,
    make_lora_step_fns,
)
from atom_tpu.serving.model import (
    decode_step,
    init_serving_params,
    make_serving_state,
    make_step_fns,
)
from atom_tpu.serving.workload import RequestSet

pytestmark = pytest.mark.quick

PAGE = 64
SPEC = ATOM_W4A4
TINY = ModelConfig(
    arch=Arch.LLAMA,
    vocab_size=199,
    hidden_size=256,
    intermediate_size=384,
    num_layers=2,
    num_heads=2,
    num_kv_heads=2,
    head_dim=128,
)


def test_add_lora_matches_per_request_loop():
    """Batched gather-einsum == the reference's per-request semantics
    (y[i] += x[i] @ wa[idx[i]].T @ wb[idx[i]].T * scale)."""
    lw = init_llama_lora(jax.random.PRNGKey(0), TINY, capacity=3, rank=8)
    b, d = 5, TINY.hidden_size
    x = jax.random.normal(jax.random.PRNGKey(1), (b, d), jnp.float32)
    idx = jnp.asarray([2, 0, 1, 2, 0], jnp.int32)
    scale = 0.7
    got = add_lora(x, lw.q, idx, layer=1, scale=scale)
    for i in range(b):
        wa = np.asarray(lw.q.wa[int(idx[i]), 1], np.float32)
        wb = np.asarray(lw.q.wb[int(idx[i]), 1], np.float32)
        want = (np.asarray(x[i]) @ wa.T @ wb.T) * scale
        np.testing.assert_allclose(np.asarray(got[i]), want, rtol=1e-5,
                                   atol=1e-5)
    # scalar idx (prefill): whole batch through adapter 1
    got_s = add_lora(x, lw.q, jnp.int32(1), layer=0, scale=scale)
    want_s = add_lora(x, lw.q, jnp.full((b,), 1, jnp.int32), 0, scale)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-6, atol=1e-6)


def _mini_setup(batch, n_pages=12):
    params = init_serving_params(jax.random.PRNGKey(1), TINY, SPEC)
    state = make_serving_state(
        TINY.num_layers, n_pages, batch, TINY.num_kv_heads, PAGE,
        TINY.head_dim,
    )
    return params, state


def test_zero_adapter_decode_matches_base():
    """wb == 0 => LoRA decode step reproduces the base decode step exactly
    (the deltas are exact f32 zeros; both run the unfused qkv path at this
    geometry)."""
    b = 2
    params, state = _mini_setup(b)
    _, state_l = _mini_setup(b)
    lw = init_llama_lora(
        jax.random.PRNGKey(2), TINY, capacity=2, rank=8, zero_b=True
    )
    ids = jnp.asarray([3, 7], jnp.int32)
    table = jnp.asarray([[1, 0], [2, 0]], jnp.int32)
    lens = jnp.asarray([1, 1], jnp.int32)
    adapters = jnp.asarray([0, 1], jnp.int32)

    tok_b, _ = decode_step(params, state, ids, table, lens, TINY, SPEC)
    tok_l, _ = lora_decode_step(
        params, lw, state_l, ids, table, lens, adapters, TINY, SPEC, 1.0
    )
    np.testing.assert_array_equal(np.asarray(tok_b), np.asarray(tok_l))


def test_adapter_isolation_in_mixed_batch():
    """A mixed batch [adapter0, adapter1] gives each slot the same token it
    gets in a uniform batch of its own adapter."""
    b = 2
    params, _ = _mini_setup(b)
    lw = init_llama_lora(jax.random.PRNGKey(3), TINY, capacity=2, rank=8)
    ids = jnp.asarray([3, 3], jnp.int32)  # same token both slots
    table = jnp.asarray([[1, 0], [2, 0]], jnp.int32)
    lens = jnp.asarray([1, 1], jnp.int32)

    toks = {}
    for name, adapters in (
        ("mixed", [0, 1]), ("all0", [0, 0]), ("all1", [1, 1]),
    ):
        _, state = _mini_setup(b)
        tok, _ = lora_decode_step(
            params, lw, state, ids, table, lens,
            jnp.asarray(adapters, jnp.int32), TINY, SPEC, 1.0,
        )
        toks[name] = np.asarray(tok)
    assert toks["mixed"][0] == toks["all0"][0]
    assert toks["mixed"][1] == toks["all1"][1]
    # the two adapters actually disagree somewhere (guards a dead delta path)
    assert (toks["all0"] != toks["all1"]).any()


def test_lora_decode_matches_prefill_continuation():
    """The decode==prefill consistency property holds with a live adapter
    (KV written through the LoRA path, ring + flush crossings included)."""
    from atom_tpu.serving.kvpool import SeqKvCache, batch_page_table
    from atom_tpu.serving.lora import lora_prefill_step

    n_pages = 12
    pool = KvPool(TINY.num_layers, n_pages, TINY.num_kv_heads, PAGE,
                  TINY.head_dim)
    params, state = _mini_setup(1, n_pages)
    lw = init_llama_lora(jax.random.PRNGKey(4), TINY, capacity=2, rank=8)
    aid = jnp.int32(1)
    rng = np.random.Generator(np.random.PCG64(9))
    prompt = rng.integers(1, TINY.vocab_size, 27).astype(np.int32)
    n_gen = 40  # crosses the W=32 ring flush

    kv = SeqKvCache(pool, len(prompt))
    ids = np.zeros((32,), np.int32)
    ids[: len(prompt)] = prompt
    table_row = np.zeros((4,), np.int32)
    table_row[: len(kv.page_ids)] = kv.page_ids
    tok, state = lora_prefill_step(
        params, lw, state, jnp.asarray(ids), jnp.asarray(table_row),
        jnp.int32(len(prompt)), jnp.int32(0), aid, TINY, SPEC, 1.0,
    )
    generated = [int(tok)]
    for i in range(n_gen - 1):
        kv.acquire_one()
        table, lens = batch_page_table([kv], 4)
        tok, state = lora_decode_step(
            params, lw, state,
            jnp.asarray([generated[-1]], jnp.int32),
            jnp.asarray(table), jnp.asarray(lens),
            jnp.asarray([1], jnp.int32), TINY, SPEC, 1.0,
            flush=((i + 1) % 32 == 0),
        )
        generated.append(int(tok[0]))

    mismatches = 0
    checks = (1, 5, 33, n_gen - 1)
    for k in checks:
        kv2 = SeqKvCache(pool, len(prompt) + k)
        ids2 = np.zeros((128,), np.int32)
        seq = np.concatenate([prompt, np.asarray(generated[:k], np.int32)])
        ids2[: len(seq)] = seq
        tr2 = np.zeros((4,), np.int32)
        tr2[: len(kv2.page_ids)] = kv2.page_ids
        tok2, state = lora_prefill_step(
            params, lw, state, jnp.asarray(ids2), jnp.asarray(tr2),
            jnp.int32(len(seq)), jnp.int32(0), aid, TINY, SPEC, 1.0,
        )
        if int(tok2) != generated[k]:
            mismatches += 1
        kv2.release()
    kv.release()
    assert mismatches <= 1, (
        f"{mismatches}/{len(checks)} prefill-continuation checks diverged"
    )


def test_lora_engine_end_to_end():
    """Engine with per-request adapters: distinct adapters produce distinct
    streams for identical prompts; zero-delta adapters reproduce the base
    engine's streams."""
    b = 4
    n_pages = 24
    params, state = _mini_setup(b, n_pages)
    pool = KvPool(TINY.num_layers, n_pages, TINY.num_kv_heads, PAGE,
                  TINY.head_dim)
    tg = TextGenConfig(batch_size=b, max_seq_len=PAGE * 4, page_size=PAGE,
                       prefill_buckets=(32,))
    lw = init_llama_lora(jax.random.PRNGKey(5), TINY, capacity=2, rank=8)
    rng = np.random.Generator(np.random.PCG64(3))
    prompt = rng.integers(1, TINY.vocab_size, 9).astype(np.int32)
    rs = RequestSet(
        prompt_lens=np.full(4, len(prompt), np.int32),
        output_lens=np.full(4, 12, np.int32),
        prompts=[prompt.copy() for _ in range(4)],
        adapter_ids=np.asarray([0, 1, 0, 1], np.int32),
    )
    pre, dec = make_lora_step_fns(params, lw, TINY, SPEC, scale=1.0)
    eng = TextGenEngine(tg, pool, pre, dec, state, lora=True)
    res = eng.run(rs, record=True)
    toks = res["tokens"]
    assert toks[0] == toks[2] and toks[1] == toks[3]  # same adapter+prompt
    assert toks[0] != toks[1]                          # different adapters
    assert pool.num_free_pages == n_pages - 1

    # zero-delta store vs base engine: the math is identical (the layer
    # blocks are bitwise-equal in isolation) but the jitted programs differ,
    # and 1-ulp reassociation occasionally flips a KV code on a quantization
    # rounding boundary which can flip a near-tie argmax (same caveat as
    # test_decode_matches_prefill_continuation) — require strong agreement.
    params2, state2 = _mini_setup(b, n_pages)
    pool2 = KvPool(TINY.num_layers, n_pages, TINY.num_kv_heads, PAGE,
                   TINY.head_dim)
    lw0 = init_llama_lora(jax.random.PRNGKey(6), TINY, capacity=2, rank=8,
                          zero_b=True)
    pre0, dec0 = make_lora_step_fns(params2, lw0, TINY, SPEC, scale=1.0)
    eng0 = TextGenEngine(tg, pool2, pre0, dec0, state2, lora=True)
    res0 = eng0.run(rs, record=True)

    params3, state3 = _mini_setup(b, n_pages)
    pool3 = KvPool(TINY.num_layers, n_pages, TINY.num_kv_heads, PAGE,
                   TINY.head_dim)
    pre_b, dec_b = make_step_fns(params3, TINY, SPEC)
    eng_b = TextGenEngine(tg, pool3, pre_b, dec_b, state3)
    res_b = eng_b.run(rs, record=True)
    # Greedy streams cascade after one flip, so only the pre-divergence
    # prefix is a stable contract: prefill token + first decode token.
    # (Bitwise single-step equality is covered by
    # test_zero_adapter_decode_matches_base; step-state consistency by
    # test_lora_decode_matches_prefill_continuation.)
    for r in range(4):
        assert res0["tokens"][r][:2] == res_b["tokens"][r][:2]


def test_lora_decode_burst_matches_step_loop():
    """One compiled ``lora_decode_burst`` window == W host-driven
    ``lora_decode_step`` calls (ids bitwise; the bench's dispatch-free path
    computes the same thing it claims to time)."""
    from atom_tpu.ops.kv_hot import HOT_W
    from atom_tpu.serving.lora import lora_decode_burst

    b, n_pages = 2, 12
    lw = init_llama_lora(jax.random.PRNGKey(8), TINY, capacity=2, rank=8)
    adapters = jnp.asarray([1, 0], jnp.int32)
    table = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    ids0 = jnp.asarray([3, 7], jnp.int32)
    lens0 = jnp.asarray([5, 9], jnp.int32)

    params, state = _mini_setup(b, n_pages)
    # donated state must not alias seq_lens (flushed gets its own buffer)
    state = state._replace(flushed=jnp.asarray([5, 9], jnp.int32))
    ids_b, _, lens_b = lora_decode_burst(
        params, lw, state, ids0, table, lens0, jnp.int32(1), adapters,
        TINY, SPEC,
    )

    _, state = _mini_setup(b, n_pages)
    state = state._replace(flushed=lens0)
    ids_s, lens_s = ids0, lens0
    for i in range(HOT_W):
        lens_s = lens_s + 1
        ids_s, state = lora_decode_step(
            params, lw, state, ids_s, table, lens_s, adapters, TINY, SPEC,
            1.0, flush=(i == HOT_W - 1),
        )
    np.testing.assert_array_equal(np.asarray(ids_b), np.asarray(ids_s))
    np.testing.assert_array_equal(np.asarray(lens_b), np.asarray(lens_s))


def test_lora_manager_alloc_load_free():
    lw = init_llama_lora(jax.random.PRNGKey(7), TINY, capacity=2, rank=4,
                         zero_b=True)
    mgr = LoraManager(lw)
    s0 = mgr.alloc()
    s1 = mgr.alloc()
    assert {s0, s1} == {0, 1}
    with pytest.raises(KeyError):
        mgr.alloc()
    wa = np.ones((TINY.num_layers, 4, TINY.hidden_size), np.float32)
    wb = np.ones((TINY.num_layers, TINY.num_heads * TINY.head_dim, 4),
                 np.float32)
    mgr.load(s0, "q", wa, wb)
    np.testing.assert_allclose(
        np.asarray(mgr.store.q.wa[s0], np.float32), wa)
    np.testing.assert_allclose(
        np.asarray(mgr.store.q.wb[s0], np.float32), wb)
    mgr.free(s0)
    assert mgr.alloc() == s0
