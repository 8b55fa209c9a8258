"""Multi-device sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.config import ATOM_W4A4, FP16_BASELINE
from atom_tpu.models import TINY_LLAMA, TINY_MIXTRAL
from atom_tpu.models import llama, mixtral
from atom_tpu.parallel import (
    llama_param_specs,
    make_mesh,
    mixtral_param_specs,
    shard_params,
)
from jax.sharding import NamedSharding, PartitionSpec as P

TINY_SPEC = ATOM_W4A4.replace(weight_group_size=64, act_group_size=64, keeper=64)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((2, 4), ("dp", "tp"))


class TestLlamaTP:
    def test_sharded_forward_matches_single(self, mesh):
        params = llama.init_params(jax.random.PRNGKey(0), TINY_LLAMA, jnp.float32)
        ids = jnp.tile(jnp.arange(16)[None], (4, 1)) % TINY_LLAMA.vocab_size
        base = np.asarray(llama.forward(params, ids, TINY_LLAMA, FP16_BASELINE))

        sp = shard_params(params, llama_param_specs(), mesh)
        ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("dp", None)))
        out = np.asarray(llama.forward(sp, ids_sharded, TINY_LLAMA, FP16_BASELINE))
        np.testing.assert_allclose(base, out, atol=2e-4)

    def test_sharded_quantized_forward(self, mesh):
        params = llama.init_params(jax.random.PRNGKey(1), TINY_LLAMA, jnp.float32)
        sp = shard_params(params, llama_param_specs(), mesh)
        ids = jnp.tile(jnp.arange(16)[None], (2, 1)) % TINY_LLAMA.vocab_size
        ids = jax.device_put(ids, NamedSharding(mesh, P("dp", None)))
        base = np.asarray(llama.forward(params, ids, TINY_LLAMA, TINY_SPEC))
        out = np.asarray(llama.forward(sp, ids, TINY_LLAMA, TINY_SPEC))
        np.testing.assert_allclose(base, out, atol=2e-3)


class TestMixtralEP:
    def test_expert_parallel_forward(self, mesh):
        params = mixtral.init_params(
            jax.random.PRNGKey(0), TINY_MIXTRAL, jnp.float32
        )
        base_ids = jnp.tile(jnp.arange(16)[None], (2, 1)) % TINY_MIXTRAL.vocab_size
        base = np.asarray(
            mixtral.forward(params, base_ids, TINY_MIXTRAL, FP16_BASELINE)
        )
        sp = shard_params(params, mixtral_param_specs(), mesh)
        ids = jax.device_put(base_ids, NamedSharding(mesh, P("dp", None)))
        out = np.asarray(mixtral.forward(sp, ids, TINY_MIXTRAL, FP16_BASELINE))
        np.testing.assert_allclose(base, out, atol=3e-4)
