"""Sequence-parallel prefill == single-chip prefill (CPU virtual mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import Arch, ModelConfig
from atom_tpu.serving.model import (
    decode_step,
    init_serving_params,
    make_serving_state,
    prefill_step,
)
from atom_tpu.serving.sp import make_sp_prefill_fn

CFG = ModelConfig(
    arch=Arch.LLAMA,
    vocab_size=211,
    hidden_size=256,
    intermediate_size=384,
    num_layers=2,
    num_heads=2,
    num_kv_heads=1,  # GQA through the SP path too
    head_dim=128,
)
SPEC = QuantSpec(weight_channel_group=1)
PAGE = 128
SP = 4


@pytest.fixture(scope="module")
def mesh():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:SP])
    return Mesh(devs, ("sp",))


def test_sp_prefill_matches_single_chip_and_decodes(mesh):
    params = init_serving_params(jax.random.PRNGKey(3), CFG, SPEC)
    n_pages = 8
    rng = np.random.Generator(np.random.PCG64(5))
    prompt = rng.integers(1, CFG.vocab_size, 57).astype(np.int32)
    bucket = 128  # divisible by sp=4 -> 32 tokens per shard
    ids = np.zeros((bucket,), np.int32)
    ids[: len(prompt)] = prompt
    table_row = jnp.asarray([1, 2, 0, 0], jnp.int32)

    # single chip
    state_a = make_serving_state(
        CFG.num_layers, n_pages, 1, CFG.num_kv_heads, PAGE, CFG.head_dim
    )
    tok_a, state_a = prefill_step(
        params, state_a, jnp.asarray(ids), table_row,
        jnp.int32(len(prompt)), jnp.int32(0), CFG, SPEC,
    )

    # sequence parallel
    state_b = make_serving_state(
        CFG.num_layers, n_pages, 1, CFG.num_kv_heads, PAGE, CFG.head_dim
    )
    sp_prefill = make_sp_prefill_fn(params, CFG, SPEC, mesh)
    tok_b, state_b = sp_prefill(
        state_b, jnp.asarray(ids), table_row,
        jnp.int32(len(prompt)), jnp.int32(0),
    )
    assert int(tok_a) == int(tok_b)
    # the page state SP leaves behind equals single-chip prefill's
    for l in range(CFG.num_layers):
        for a, b in zip(state_a.pages[l], state_b.pages[l]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # decode continues single-chip from the SP-prefilled state
    table = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    lens = jnp.asarray([len(prompt) + 1], jnp.int32)
    tok2_a, _ = decode_step(
        params, state_a, jnp.asarray([int(tok_a)], jnp.int32), table, lens,
        CFG, SPEC,
    )
    tok2_b, _ = decode_step(
        params, state_b, jnp.asarray([int(tok_b)], jnp.int32), table, lens,
        CFG, SPEC,
    )
    assert int(tok2_a[0]) == int(tok2_b[0])
