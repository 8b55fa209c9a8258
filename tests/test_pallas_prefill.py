"""Flash-prefill kernel vs the jnp oracle (``causal_code_attention``).

Same mathematics, different f32 contraction order (online-softmax blocks vs
one-pass), so the comparison is allclose at attention-output scale — the
inputs here are real quantized K/V codes, so there is no additional
quantization stage for flips to hide in.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.ops.pallas_prefill import flash_code_attention
from atom_tpu.ops.reference import quantize_kv_asym
from atom_tpu.serving.model import causal_code_attention


def _mk(tq, tk, hq, hkv, dh, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (tq, hq, dh), jnp.bfloat16)
    kq = quantize_kv_asym(jax.random.normal(ks[1], (tk, hkv, dh), jnp.float32))
    vq = quantize_kv_asym(jax.random.normal(ks[2], (tk, hkv, dh), jnp.float32))
    return q, kq, vq


def _cmp(got, want, atol=5e-3):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=atol)


@pytest.mark.quick
def test_flash_prefill_matches_oracle():
    tq = tk = 512
    q, kq, vq = _mk(tq, tk, 4, 4, 128)
    want = causal_code_attention(q, kq, vq, 1, 128 ** -0.5)
    got = flash_code_attention(
        q, kq.codes, kq.params, vq.codes, vq.params, 1, 128 ** -0.5,
        tq_blk=128, tk_blk=256, interpret=True,
    )
    _cmp(got, want)


@pytest.mark.quick
def test_flash_prefill_gqa_and_ragged_blocks():
    # Tq not a multiple of the q block; GQA groups=2; Tk padded
    tq, tk = 320, 320
    q, kq, vq = _mk(tq, tk, 4, 2, 128, seed=1)
    want = causal_code_attention(q, kq, vq, 2, 128 ** -0.5)
    got = flash_code_attention(
        q, kq.codes, kq.params, vq.codes, vq.params, 2, 128 ** -0.5,
        tq_blk=128, tk_blk=128, interpret=True,
    )
    _cmp(got, want)


@pytest.mark.quick
def test_flash_prefill_row_offset_sp_shard():
    # an SP shard: local queries at global positions offset..offset+tq-1
    # attending the full gathered key range
    tq, tk, off = 128, 512, 256
    q, kq, vq = _mk(tq, tk, 2, 2, 128, seed=2)
    row_pos = off + jnp.arange(tq)
    want = causal_code_attention(
        q, kq, vq, 1, 128 ** -0.5, row_pos=row_pos
    )
    got = flash_code_attention(
        q, kq.codes, kq.params, vq.codes, vq.params, 1, 128 ** -0.5,
        row_offset=jnp.int32(off), offset_max=tk - tq,
        tq_blk=128, tk_blk=128, interpret=True,
    )
    _cmp(got, want)


def test_flash_prefill_long_context_vs_scanned():
    # past the scan threshold: kernel vs the lax.scan flash path
    tq = tk = 2560
    q, kq, vq = _mk(tq, tk, 2, 1, 128, seed=3)
    want = causal_code_attention(
        q, kq, vq, 2, 128 ** -0.5, key_block=1024
    )
    got = flash_code_attention(
        q, kq.codes, kq.params, vq.codes, vq.params, 2, 128 ** -0.5,
        tq_blk=512, tk_blk=512, interpret=True,
    )
    _cmp(got, want)


def test_prefill_hidden_kernel_matches_scanned_path():
    """serving integration: prefill_hidden routed through the Pallas kernel
    == the production scanned path, to quantization-flip tolerance.

    ONE layer: the attention paths differ by 1-bf16-ulp reassociation noise
    (~0.4% of elements), and each flipped code perturbs downstream quantized
    GEMM rows at tiny magnitude.  With more layers the token-mixing cascade
    amplifies chaotically (measured: 2 layers -> mean |diff| 0.076 on random
    weights for EVERY alternate-path pairing, including scanned vs one-pass),
    so multi-layer equality is not a meaningful contract for any of the
    three attention paths."""
    import atom_tpu.serving.model as SM
    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.models.configs import Arch, ModelConfig
    from atom_tpu.ops.kv_layout import make_kv_pages_kernel

    cfg = ModelConfig(
        arch=Arch.LLAMA, vocab_size=256, hidden_size=512,
        intermediate_size=1024, num_layers=1, num_heads=4, num_kv_heads=2,
        head_dim=128, max_position_embeddings=512,
    )
    spec = ATOM_W4A4.replace(fused_serving=False)
    params = SM.init_serving_params(jax.random.PRNGKey(0), cfg, spec)
    t, page = 256, 128
    table_row = jnp.arange(1, 4, dtype=jnp.int32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, t), jnp.int32
    )

    def run():
        pages = [
            make_kv_pages_kernel(5, cfg.num_kv_heads, page, cfg.head_dim)
            for _ in range(cfg.num_layers)
        ]
        x, new_pages = SM.prefill_hidden(
            params, pages, ids, table_row, cfg, spec
        )
        return np.asarray(x, np.float32), jax.tree.map(
            np.asarray, new_pages
        )

    old = (SM.PREFILL_SCAN_THRESHOLD, SM.PREFILL_KEY_BLOCK,
           SM.PREFILL_KERNEL_THRESHOLD)
    try:
        SM.PREFILL_SCAN_THRESHOLD, SM.PREFILL_KEY_BLOCK = 0, 64
        want, pages_w = run()
        SM.PREFILL_SCAN_THRESHOLD = 10**9
        SM.PREFILL_KERNEL_THRESHOLD = 0
        got, pages_g = run()
    finally:
        (SM.PREFILL_SCAN_THRESHOLD, SM.PREFILL_KEY_BLOCK,
         SM.PREFILL_KERNEL_THRESHOLD) = old
    # KV pages are written from the attention INPUTS, which are identical
    # (the paths differ only downstream of the attention read) — bitwise.
    for pw, pg in zip(pages_w, pages_g):
        np.testing.assert_array_equal(pw.k_pages, pg.k_pages)
        np.testing.assert_array_equal(pw.v_pages, pg.v_pages)
        np.testing.assert_array_equal(pw.params, pg.params)
    diff = np.abs(got - want)
    assert diff.max() < 0.5, f"max diff {diff.max():.4f}"
    moved = np.mean(diff > (0.01 + 0.02 * np.abs(want)))
    assert moved < 0.02, f"{moved:.4%} elements moved beyond flip noise"
