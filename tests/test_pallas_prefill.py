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
