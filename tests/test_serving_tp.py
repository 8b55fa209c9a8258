"""Tensor-parallel serving step == single-chip step, bitwise (CPU mesh).

The TP scheme (column-parallel GEMMs, head-sharded KV, epilogues on gathered
full activations) computes every output element on exactly one shard with the
single-chip op order, so tokens AND the quantized KV pages must match exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import Arch, ModelConfig
from atom_tpu.serving.kvpool import KvPool
from atom_tpu.serving.model import (
    decode_step,
    init_serving_params,
    make_serving_state,
    prefill_step,
)
from atom_tpu.serving.parallel import (
    make_state_sharded,
    make_tp_step_fns,
    shard_serving_params,
)

CFG = ModelConfig(
    arch=Arch.LLAMA,
    vocab_size=256,
    hidden_size=1024,
    intermediate_size=2048,
    num_layers=2,
    num_heads=8,
    num_kv_heads=8,
    head_dim=128,
)
SPEC = QuantSpec(weight_channel_group=1, fused_serving=False)
PAGE = 128
TP = 4


@pytest.fixture(scope="module")
def mesh():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:TP])
    return Mesh(devs, ("tp",))


GQA_CFG = ModelConfig(
    arch=Arch.LLAMA,
    vocab_size=256,
    hidden_size=512,
    intermediate_size=1024,
    num_layers=2,
    num_heads=8,
    num_kv_heads=4,  # groups=2; TP=4 leaves 1 kv head / 2 q heads per shard
    head_dim=128,
)


@pytest.mark.parametrize("cfg", [CFG, GQA_CFG], ids=["mha", "gqa"])
def test_tp_decode_and_prefill_match_single_chip(mesh, cfg):
    CFG = cfg
    params = init_serving_params(jax.random.PRNGKey(0), CFG, SPEC)
    n_pages = 8
    batch = 2
    rng = np.random.Generator(np.random.PCG64(1))
    prompt = rng.integers(1, CFG.vocab_size, 30).astype(np.int32)

    # --- single chip ---
    state = make_serving_state(
        CFG.num_layers, n_pages, batch, CFG.num_kv_heads, PAGE, CFG.head_dim
    )
    ids = np.zeros((32,), np.int32)
    ids[: len(prompt)] = prompt
    table_row = jnp.asarray([1, 2], jnp.int32)
    tok_s, state = prefill_step(
        params, state, jnp.asarray(ids), table_row, jnp.int32(len(prompt)),
        jnp.int32(0), CFG, SPEC,
    )
    table = jnp.asarray([[1, 2], [0, 0]], jnp.int32)
    lens = jnp.asarray([len(prompt) + 1, 0], jnp.int32)
    ids_b = jnp.asarray([int(tok_s), 3], jnp.int32)
    tok2_s, state = decode_step(params, state, ids_b, table, lens, CFG, SPEC)

    # --- tensor parallel ---
    sparams = shard_serving_params(params, CFG, mesh)
    sstate = make_state_sharded(
        CFG.num_layers, n_pages, batch, CFG.num_kv_heads, PAGE, CFG.head_dim,
        mesh,
    )
    prefill_tp, decode_tp = make_tp_step_fns(sparams, CFG, SPEC, mesh)
    tok_t, sstate = prefill_tp(
        sstate, jnp.asarray(ids), table_row, jnp.int32(len(prompt)),
        jnp.int32(0),
    )
    assert int(tok_t) == int(tok_s)
    tok2_t, sstate = decode_tp(sstate, ids_b, table, lens)
    np.testing.assert_array_equal(np.asarray(tok2_t), np.asarray(tok2_s))

    # KV pages + hot ring identical (gathers the head-sharded arrays)
    for l in range(CFG.num_layers):
        for a, b_ in zip(state.pages[l], sstate.pages[l]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        for a, b_ in zip(state.hot[l], sstate.hot[l]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_tp_decode_matches_through_ring_flush(mesh):
    """Generations longer than the hot-ring window (HOT_W=32) must still match
    single-chip: the TP decode path has to run the flush variant on every
    W-th step or the ring wraps over unflushed KV (advisor round-1 high)."""
    from atom_tpu.ops.kv_hot import HOT_W
    from atom_tpu.serving.model import make_step_fns

    cfg = GQA_CFG
    params = init_serving_params(jax.random.PRNGKey(2), cfg, SPEC)
    n_pages, batch = 8, 2
    rng = np.random.Generator(np.random.PCG64(7))
    prompt = rng.integers(1, cfg.vocab_size, 20).astype(np.int32)
    ids = np.zeros((32,), np.int32)
    ids[: len(prompt)] = prompt
    n_steps = HOT_W + 6  # crosses one flush boundary

    # --- single chip (reference cadence via make_step_fns) ---
    state = make_serving_state(
        cfg.num_layers, n_pages, batch, cfg.num_kv_heads, PAGE, cfg.head_dim
    )
    prefill_s, decode_s = make_step_fns(params, cfg, SPEC)
    table_row = jnp.asarray([1, 2], jnp.int32)
    tok, state = prefill_s(
        state, jnp.asarray(ids), table_row, jnp.int32(len(prompt)), jnp.int32(0)
    )
    table = jnp.asarray([[1, 2], [0, 0]], jnp.int32)
    toks_s = [int(tok)]
    lens = len(prompt)
    ids_b = jnp.asarray([int(tok), 0], jnp.int32)
    for i in range(n_steps):
        lens += 1
        tok_b, state = decode_s(
            state, ids_b, table, jnp.asarray([lens, 0], jnp.int32)
        )
        toks_s.append(int(tok_b[0]))
        ids_b = jnp.asarray([int(tok_b[0]), 0], jnp.int32)

    # --- tensor parallel ---
    sparams = shard_serving_params(params, cfg, mesh)
    sstate = make_state_sharded(
        cfg.num_layers, n_pages, batch, cfg.num_kv_heads, PAGE, cfg.head_dim,
        mesh,
    )
    prefill_tp, decode_tp = make_tp_step_fns(sparams, cfg, SPEC, mesh)
    tok, sstate = prefill_tp(
        sstate, jnp.asarray(ids), table_row, jnp.int32(len(prompt)), jnp.int32(0)
    )
    toks_t = [int(tok)]
    lens = len(prompt)
    ids_b = jnp.asarray([int(tok), 0], jnp.int32)
    for i in range(n_steps):
        lens += 1
        tok_b, sstate = decode_tp(
            sstate, ids_b, table, jnp.asarray([lens, 0], jnp.int32)
        )
        toks_t.append(int(tok_b[0]))
        ids_b = jnp.asarray([int(tok_b[0]), 0], jnp.int32)

    assert toks_t == toks_s
