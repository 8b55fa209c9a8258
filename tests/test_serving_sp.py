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
# fused_serving off: these tests assert BITWISE equality between the
# single-chip and sharded paths, which must share the XLA quantize chains
# (the fused norm+quant-prologue kernels are separately-compiled programs
# with documented quantization-boundary flips; tests/test_pallas_fused_in.py
# pins their numerics directly).
SPEC = QuantSpec(weight_channel_group=1, fused_serving=False)
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


def test_sp_tp_2d_prefill_matches_single_chip():
    """2-D (sp x tp) prefill == single-chip prefill: same token, bitwise
    pages; decode then continues on the TP step over the same tp axis."""
    from jax.sharding import Mesh

    from atom_tpu.serving.parallel import (
        make_state_sharded,
        make_tp_step_fns,
        shard_serving_params,
    )
    from atom_tpu.serving.sp import make_sp_tp_prefill_fn

    cfg = ModelConfig(
        arch=Arch.LLAMA,
        vocab_size=212,
        hidden_size=512,
        intermediate_size=1024,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,  # GQA; tp=2 -> 1 kv head per shard
        head_dim=128,
    )
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("sp", "tp"))
    params = init_serving_params(jax.random.PRNGKey(7), cfg, SPEC)
    n_pages = 8
    rng = np.random.Generator(np.random.PCG64(8))
    prompt = rng.integers(1, cfg.vocab_size, 41).astype(np.int32)
    bucket = 64  # 32 tokens per sp shard
    ids = np.zeros((bucket,), np.int32)
    ids[: len(prompt)] = prompt
    table_row = jnp.asarray([1, 2, 0, 0], jnp.int32)

    state_a = make_serving_state(
        cfg.num_layers, n_pages, 1, cfg.num_kv_heads, PAGE, cfg.head_dim
    )
    tok_a, state_a = prefill_step(
        params, state_a, jnp.asarray(ids), table_row,
        jnp.int32(len(prompt)), jnp.int32(0), cfg, SPEC,
    )

    sparams = shard_serving_params(params, cfg, mesh, axis="tp")
    state_b = make_state_sharded(
        cfg.num_layers, n_pages, 1, cfg.num_kv_heads, PAGE, cfg.head_dim,
        mesh, axis="tp",
    )
    prefill_2d = make_sp_tp_prefill_fn(sparams, cfg, SPEC, mesh)
    tok_b, state_b = prefill_2d(
        state_b, jnp.asarray(ids), table_row,
        jnp.int32(len(prompt)), jnp.int32(0),
    )
    assert int(tok_a) == int(tok_b)
    for l in range(cfg.num_layers):
        for a, b in zip(state_a.pages[l], state_b.pages[l]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # decode continues on the TP step functions over the same tp axis
    _, decode_tp = make_tp_step_fns(sparams, cfg, SPEC, mesh, axis="tp")
    table = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    lens = jnp.asarray([len(prompt) + 1], jnp.int32)
    tok2_a, _ = decode_step(
        params, state_a, jnp.asarray([int(tok_a)], jnp.int32), table, lens,
        cfg, SPEC,
    )
    tok2_b, _ = decode_tp(
        state_b, jnp.asarray([int(tok_b)], jnp.int32), table, lens
    )
    assert int(tok2_a[0]) == int(tok2_b[0])


def test_sp_tp_long_context_8k_prefill():
    """8192-token sp x tp prefill through the flash-style scanned attention
    (t_full > PREFILL_SCAN_THRESHOLD): bitwise-identical pages and token vs
    the single-chip scanned prefill — the long-context 70B shape."""
    from jax.sharding import Mesh

    from atom_tpu.serving.parallel import (
        make_state_sharded,
        shard_serving_params,
    )
    from atom_tpu.serving.sp import make_sp_tp_prefill_fn

    cfg = ModelConfig(
        arch=Arch.LLAMA,
        vocab_size=212,
        hidden_size=256,
        intermediate_size=512,
        num_layers=1,
        num_heads=2,
        num_kv_heads=2,
        head_dim=128,
        max_position_embeddings=8192,
    )
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("sp", "tp"))
    params = init_serving_params(jax.random.PRNGKey(7), cfg, SPEC)
    rng = np.random.Generator(np.random.PCG64(13))
    t_true = 8000
    bucket = 8192  # 4096 tokens per sp shard; scan path (8192 > 2048)
    prompt = rng.integers(1, cfg.vocab_size, t_true).astype(np.int32)
    ids = np.zeros((bucket,), np.int32)
    ids[:t_true] = prompt
    page = 256
    n_pages = 34
    table_row = jnp.asarray(list(range(1, 33)) + [0, 0], jnp.int32)

    state_a = make_serving_state(
        cfg.num_layers, n_pages, 1, cfg.num_kv_heads, page, cfg.head_dim
    )
    tok_a, state_a = prefill_step(
        params, state_a, jnp.asarray(ids), table_row,
        jnp.int32(t_true), jnp.int32(0), cfg, SPEC,
    )

    sparams = shard_serving_params(params, cfg, mesh, axis="tp")
    state_b = make_state_sharded(
        cfg.num_layers, n_pages, 1, cfg.num_kv_heads, page, cfg.head_dim,
        mesh, axis="tp",
    )
    prefill_2d = make_sp_tp_prefill_fn(sparams, cfg, SPEC, mesh)
    tok_b, state_b = prefill_2d(
        state_b, jnp.asarray(ids), table_row,
        jnp.int32(t_true), jnp.int32(0),
    )
    assert int(tok_a) == int(tok_b)
    assert int(state_b.flushed[0]) == t_true
    for a, b in zip(state_a.pages[0], state_b.pages[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sp_prefill_kernel_path_matches_single_chip(mesh):
    """SP prefill routed through the Pallas flash-prefill kernel vs the
    single-chip kernel path.

    The kernel itself is bitwise row-independent (verified eagerly: shard
    q rows + row_offset == the same rows of the full call, on this exact
    data), and layer-0 pages are written from identical attention inputs —
    those stay bitwise.  Deeper layers are NOT bitwise: XLA fuses the ops
    around the kernel differently under shard_map vs plain jit (the
    documented cross-program f32 reassociation), flipping rare
    quantization-boundary KV codes (measured 0.03%).  Assert layer-0
    bitwise + sparse flips deeper + same next token."""
    import atom_tpu.serving.model as SM

    params = init_serving_params(jax.random.PRNGKey(4), CFG, SPEC)
    n_pages = 8
    rng = np.random.Generator(np.random.PCG64(6))
    prompt = rng.integers(1, CFG.vocab_size, 57).astype(np.int32)
    bucket = 128
    ids = np.zeros((bucket,), np.int32)
    ids[: len(prompt)] = prompt
    table_row = jnp.asarray([1, 2, 0, 0], jnp.int32)

    old = SM.PREFILL_KERNEL_THRESHOLD
    SM.PREFILL_KERNEL_THRESHOLD = 0
    try:
        state_a = make_serving_state(
            CFG.num_layers, n_pages, 1, CFG.num_kv_heads, PAGE, CFG.head_dim
        )
        tok_a, state_a = prefill_step(
            params, state_a, jnp.asarray(ids), table_row,
            jnp.int32(len(prompt)), jnp.int32(0), CFG, SPEC,
        )
        state_b = make_serving_state(
            CFG.num_layers, n_pages, 1, CFG.num_kv_heads, PAGE, CFG.head_dim
        )
        sp_prefill = make_sp_prefill_fn(params, CFG, SPEC, mesh)
        tok_b, state_b = sp_prefill(
            state_b, jnp.asarray(ids), table_row,
            jnp.int32(len(prompt)), jnp.int32(0),
        )
    finally:
        SM.PREFILL_KERNEL_THRESHOLD = old
    assert int(tok_a) == int(tok_b)
    for a, b in zip(state_a.pages[0], state_b.pages[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for l in range(1, CFG.num_layers):
        for a, b in zip(state_a.pages[l], state_b.pages[l]):
            neq = np.mean(np.asarray(a) != np.asarray(b))
            assert neq < 0.005, f"layer {l}: {neq:.4%} codes flipped"
