"""Real-kernel Mixtral (MoE) serving: single-chip consistency + EP parity.

North-star config 5 (the reference does not serve Mixtral): packed W4A4
expert GEMMs with dense top-2 routing, expert parallelism over the same mesh
axis as head-sharded attention (``serving/moe.py``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import Arch, ModelConfig
from atom_tpu.serving.model import make_serving_state
from atom_tpu.serving.moe import (
    decode_step_moe,
    init_moe_serving_params,
    make_moe_ep_step_fns,
    make_moe_step_fns,
    prefill_step_moe,
    shard_moe_serving_params,
)

CFG = ModelConfig(
    arch=Arch.MIXTRAL,
    vocab_size=256,
    hidden_size=512,
    intermediate_size=1024,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,   # GQA
    head_dim=128,
    num_experts=4,
    num_experts_per_tok=2,
)
SPEC = QuantSpec(weight_channel_group=1, fused_serving=False)
PAGE = 128
EP = 2  # heads 4 -> 2/shard, kv 2 -> 1/shard, experts 4 -> 2/shard


def test_moe_serving_decode_and_prefill():
    """Single-chip MoE serving: prefill + decode through the real kernels,
    crossing the ring-flush boundary; routing reacts to the hidden state
    (different tokens take different expert mixes)."""
    params = init_moe_serving_params(jax.random.PRNGKey(0), CFG, SPEC)
    n_pages, batch = 8, 2
    state = make_serving_state(
        CFG.num_layers, n_pages, batch, CFG.num_kv_heads, PAGE, CFG.head_dim
    )
    rng = np.random.Generator(np.random.PCG64(2))
    prompt = rng.integers(1, CFG.vocab_size, 30).astype(np.int32)
    ids = np.zeros((64,), np.int32)
    ids[: len(prompt)] = prompt
    table_row = jnp.asarray([1, 2, 0, 0], jnp.int32)
    prefill_fn, decode_fn = make_moe_step_fns(params, CFG, SPEC)
    tok, state = prefill_fn(
        state, jnp.asarray(ids), table_row, jnp.int32(len(prompt)), jnp.int32(0)
    )
    assert 0 <= int(tok) < CFG.vocab_size

    table = jnp.asarray([[1, 2, 0, 0], [0, 0, 0, 0]], jnp.int32)
    lens = len(prompt)
    ids_b = jnp.asarray([int(tok), 0], jnp.int32)
    toks = []
    for _ in range(36):  # crosses the W=32 flush
        lens += 1
        nxt, state = decode_fn(
            state, ids_b, table, jnp.asarray([lens, 0], jnp.int32)
        )
        toks.append(int(nxt[0]))
        ids_b = jnp.asarray([int(nxt[0]), 0], jnp.int32)
    assert len(set(toks)) > 1  # not stuck
    assert int(state.flushed[0]) >= 32


def test_moe_ep_matches_single_chip():
    """EP (experts + heads sharded over one axis) decode/prefill must be
    bitwise-equal to the single-chip MoE step, through a ring flush."""
    from jax.sharding import Mesh

    from atom_tpu.serving.parallel import make_state_sharded

    devs = np.array(jax.devices()[:EP])
    mesh = Mesh(devs, ("ep",))
    params = init_moe_serving_params(jax.random.PRNGKey(1), CFG, SPEC)
    n_pages, batch = 8, 2
    rng = np.random.Generator(np.random.PCG64(3))
    prompt = rng.integers(1, CFG.vocab_size, 20).astype(np.int32)
    ids = np.zeros((32,), np.int32)
    ids[: len(prompt)] = prompt
    table_row = jnp.asarray([1, 2, 0, 0], jnp.int32)
    table = jnp.asarray([[1, 2, 0, 0], [0, 0, 0, 0]], jnp.int32)
    n_steps = 35

    # --- single chip ---
    state = make_serving_state(
        CFG.num_layers, n_pages, batch, CFG.num_kv_heads, PAGE, CFG.head_dim
    )
    pre_s, dec_s = make_moe_step_fns(params, CFG, SPEC)
    tok, state = pre_s(
        state, jnp.asarray(ids), table_row, jnp.int32(len(prompt)), jnp.int32(0)
    )
    toks_s = [int(tok)]
    lens = len(prompt)
    ids_b = jnp.asarray([int(tok), 0], jnp.int32)
    for _ in range(n_steps):
        lens += 1
        nxt, state = dec_s(state, ids_b, table, jnp.asarray([lens, 0], jnp.int32))
        toks_s.append(int(nxt[0]))
        ids_b = jnp.asarray([int(nxt[0]), 0], jnp.int32)

    # --- expert parallel ---
    sparams = shard_moe_serving_params(params, CFG, mesh, axis="ep")
    sstate = make_state_sharded(
        CFG.num_layers, n_pages, batch, CFG.num_kv_heads, PAGE, CFG.head_dim,
        mesh, axis="ep",
    )
    pre_e, dec_e = make_moe_ep_step_fns(sparams, CFG, SPEC, mesh, axis="ep")
    tok, sstate = pre_e(
        sstate, jnp.asarray(ids), table_row, jnp.int32(len(prompt)), jnp.int32(0)
    )
    toks_e = [int(tok)]
    lens = len(prompt)
    ids_b = jnp.asarray([int(tok), 0], jnp.int32)
    for _ in range(n_steps):
        lens += 1
        nxt, sstate = dec_e(sstate, ids_b, table, jnp.asarray([lens, 0], jnp.int32))
        toks_e.append(int(nxt[0]))
        ids_b = jnp.asarray([int(nxt[0]), 0], jnp.int32)

    assert toks_e == toks_s

    # KV pages identical too (gather the head-sharded arrays)
    for l in range(CFG.num_layers):
        for a, b_ in zip(state.pages[l], sstate.pages[l]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_moe_routed_prefill_matches_dense():
    """Routed (sort-by-expert gather) expert MLP == dense routing, bitwise,
    when capacity covers every expert's load (same expert-major f32
    accumulation order)."""
    from atom_tpu.serving.moe import _moe_mlp, _moe_mlp_routed

    key = jax.random.PRNGKey(3)
    t = 96
    params = init_moe_serving_params(key, CFG, SPEC)
    lp = params.layers[0]
    x = jax.random.normal(key, (t, CFG.hidden_size), jnp.bfloat16)
    attn = jax.random.normal(
        jax.random.PRNGKey(4),
        (t, CFG.num_heads * CFG.head_dim), jnp.float32,
    ) * 0.3

    dense = _moe_mlp(x, attn, lp, CFG, SPEC)
    routed = _moe_mlp_routed(x, attn, lp, CFG, SPEC, capacity=t)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(routed))


def test_moe_routed_capacity_drop_semantics():
    """With capacity below an expert's load, overflow tokens drop ONLY that
    expert's contribution (rows past capacity), everything else intact."""
    from atom_tpu.serving.moe import _moe_mlp_routed

    key = jax.random.PRNGKey(5)
    t = 64
    params = init_moe_serving_params(key, CFG, SPEC)
    lp = params.layers[0]
    x = jax.random.normal(key, (t, CFG.hidden_size), jnp.bfloat16)
    attn = jnp.zeros((t, CFG.num_heads * CFG.head_dim), jnp.float32)

    full = _moe_mlp_routed(x, attn, lp, CFG, SPEC, capacity=t)
    tight = _moe_mlp_routed(x, attn, lp, CFG, SPEC, capacity=16)
    # mean expert load = t*k/E = 32 > 16: some tokens must differ (dropped),
    # but outputs stay finite and the residual stream is preserved.
    assert np.isfinite(np.asarray(tight, np.float32)).all()
    assert not np.array_equal(np.asarray(full), np.asarray(tight))


@pytest.mark.quick
def test_moe_fused_experts_match_unfused(monkeypatch):
    """Fused per-expert kernels + fused-in o_proj (decode batch) match the
    unfused chain up to quantization-boundary code flips (the in-kernel
    f32 chains contract differently; see tests/test_pallas_fused_in.py)."""
    from atom_tpu.serving.moe import _moe_mlp

    monkeypatch.setenv("ATOM_TPU_FUSED_MLP", "1")  # opt-in since round 5
    fspec = SPEC.replace(fused_serving=True)
    key = jax.random.PRNGKey(11)
    b = 32
    params = init_moe_serving_params(key, CFG, SPEC)
    lp = params.layers[0]
    x = jax.random.normal(key, (b, CFG.hidden_size), jnp.bfloat16)
    attn = jax.random.normal(
        jax.random.PRNGKey(12),
        (b, CFG.num_heads * CFG.head_dim), jnp.float32,
    ).astype(jnp.bfloat16) * 0.3

    want = np.asarray(_moe_mlp(x, attn, lp, CFG, SPEC), np.float32)
    got = np.asarray(_moe_mlp(x, attn, lp, CFG, fspec), np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=0.5)
