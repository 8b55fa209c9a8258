"""Paged INT4 decode attention: Pallas kernel vs. jnp oracles.

Mirrors the reference's decode test strategy (`test_batch_decode_int4.py`
`ref_batch_decode` comparison, SURVEY.md §4) but asserts numerics on every
configuration instead of a smoke run.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.ops import reference as R
from atom_tpu.ops.kv_layout import (
    append_kv_decode_kernel,
    append_kv_prefill_kernel,
    kv_codes_from_kernel,
    kv_pages_from_reference,
    make_kv_pages_kernel,
)
from atom_tpu.ops.pallas_decode import (
    append_params_pallas,
    paged_decode_attention_rotated,
)

PAGE = 128
HEAD_DIM = 128


def _build_caches(key, batch, kv_heads, seq_lens, max_pages, n_pages):
    """Fill both the reference-layout and kernel-layout caches with the same
    quantized KV; return (ref cache arrays, kernel pages, page_table)."""
    kr, kv_key = jax.random.split(key)
    k_ref, k_prm_ref = R.make_kv_pages(n_pages, kv_heads, PAGE, HEAD_DIM)
    v_ref, v_prm_ref = R.make_kv_pages(n_pages, kv_heads, PAGE, HEAD_DIM)
    kpages = make_kv_pages_kernel(n_pages, kv_heads, PAGE, HEAD_DIM)

    table = np.zeros((batch, max_pages), np.int32)
    next_page = 1
    for b in range(batch):
        need = -(-seq_lens[b] // PAGE)
        table[b, :need] = np.arange(next_page, next_page + need)
        next_page += need
    assert next_page <= n_pages
    table = jnp.asarray(table)

    for b in range(batch):
        t = seq_lens[b]
        kv_key, k1, k2 = jax.random.split(kv_key, 3)
        k_vals = jax.random.normal(k1, (t, kv_heads, HEAD_DIM), jnp.float32)
        v_vals = jax.random.normal(k2, (t, kv_heads, HEAD_DIM), jnp.float32)
        kq = R.quantize_kv_asym(k_vals)
        vq = R.quantize_kv_asym(v_vals)
        k_ref, k_prm_ref = R.append_kv_prefill(
            k_ref, k_prm_ref, kq, table[b], PAGE
        )
        v_ref, v_prm_ref = R.append_kv_prefill(
            v_ref, v_prm_ref, vq, table[b], PAGE
        )
        kpages = append_kv_prefill_kernel(kpages, kq, vq, table[b])
    return (k_ref, k_prm_ref, v_ref, v_prm_ref), kpages, table


@pytest.mark.parametrize(
    "batch,kv_heads,groups,seq_lens",
    [
        (2, 4, 1, [200, 77]),   # MHA, ragged lengths
        (2, 2, 4, [130, 256]),  # GQA
        (1, 8, 1, [5]),         # single short sequence
    ],
)
def test_decode_rotated_matches_oracle(batch, kv_heads, groups, seq_lens):
    """Production kernel (K post-RoPE, affine code dots) vs jnp oracle."""
    key = jax.random.PRNGKey(5)
    max_pages = max(-(-t // PAGE) for t in seq_lens) + 1
    n_pages = 1 + sum(-(-t // PAGE) for t in seq_lens)
    _, kpages, table = _build_caches(
        key, batch, kv_heads, seq_lens, max_pages, n_pages
    )
    hq = kv_heads * groups
    q = jax.random.normal(
        jax.random.PRNGKey(11), (batch, hq, HEAD_DIM), jnp.float32
    )
    lens = jnp.asarray(seq_lens, jnp.int32)

    got = paged_decode_attention_rotated(
        q, kpages, table, lens, out_dtype=jnp.float32, interpret=True
    )

    k_codes, k_prm, v_codes, v_prm = kv_codes_from_kernel(kpages)
    sm = HEAD_DIM ** -0.5
    max_t = max_pages * PAGE

    def flat(x, width):  # [P, H, S, w] -> [P*S, H, w]
        return x.transpose(0, 2, 1, 3).reshape(max_t, kv_heads, width)

    want = []
    for b in range(batch):
        kc = jnp.repeat(flat(k_codes[table[b]], HEAD_DIM), groups, axis=1)
        kp = jnp.repeat(flat(k_prm[table[b]], 2), groups, axis=1)
        vc = jnp.repeat(flat(v_codes[table[b]], HEAD_DIM), groups, axis=1)
        vp = jnp.repeat(flat(v_prm[table[b]], 2), groups, axis=1)
        qb = q[b].astype(jnp.float32)
        dot = jnp.einsum("hd,thd->ht", qb, kc.astype(jnp.float32))
        scores = (
            dot * kp[:, :, 0].T + jnp.sum(qb, axis=1)[:, None] * kp[:, :, 1].T
        ) * sm
        maskrow = jnp.arange(max_t)[None, :] < seq_lens[b]
        scores = jnp.where(maskrow, scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        v = vc.astype(jnp.float32) * vp[:, :, 0:1] + vp[:, :, 1:2]
        want.append(jnp.einsum("ht,thd->hd", p, v))
    want = jnp.stack(want)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_kernel_layout_roundtrip_and_reference_conversion():
    key = jax.random.PRNGKey(1)
    kv_heads, t = 4, 170
    n_pages = 3
    k_vals = jax.random.normal(key, (t, kv_heads, HEAD_DIM), jnp.float32)
    kq = R.quantize_kv_asym(k_vals)
    vq = R.quantize_kv_asym(-k_vals)

    table_row = jnp.asarray([1, 2, 0], jnp.int32)
    kpages = append_kv_prefill_kernel(
        make_kv_pages_kernel(n_pages, kv_heads, PAGE, HEAD_DIM), kq, vq, table_row
    )
    k_ref, k_prm = R.make_kv_pages(n_pages, kv_heads, PAGE, HEAD_DIM)
    v_ref, v_prm = R.make_kv_pages(n_pages, kv_heads, PAGE, HEAD_DIM)
    k_ref, k_prm = R.append_kv_prefill(k_ref, k_prm, kq, table_row, PAGE)
    v_ref, v_prm = R.append_kv_prefill(v_ref, v_prm, vq, table_row, PAGE)

    converted = kv_pages_from_reference(k_ref, k_prm, v_ref, v_prm)
    for a, b in zip(kpages, converted):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # decode-append one more token at slot t % PAGE of page table_row[t//PAGE]
    key2 = jax.random.PRNGKey(2)
    newk = R.quantize_kv_asym(
        jax.random.normal(key2, (1, kv_heads, HEAD_DIM), jnp.float32)
    )
    newv = R.quantize_kv_asym(
        jax.random.normal(key2, (1, kv_heads, HEAD_DIM), jnp.float32) + 1.0
    )
    page_idx = table_row[jnp.asarray([t // PAGE])]
    slot = jnp.asarray([t % PAGE], jnp.int32)
    kpages2 = append_kv_decode_kernel(kpages, newk, newv, page_idx, slot)

    k_codes, k_params, v_codes, v_params = kv_codes_from_kernel(kpages2)
    p, s = int(page_idx[0]), int(slot[0])
    np.testing.assert_array_equal(
        np.asarray(k_codes[p, :, s, :]), np.asarray(newk.codes[0])
    )
    np.testing.assert_allclose(
        np.asarray(k_params[p, :, s, :]), np.asarray(newk.params[0]), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(v_codes[p, :, s, :]), np.asarray(newv.codes[0])
    )
    # pre-existing neighbours in the same byte rows survived the RMW,
    # and untouched pages' params survived the Pallas RMW append
    old = kv_codes_from_kernel(kpages)
    np.testing.assert_array_equal(
        np.asarray(v_codes[1, :, 7, :]), np.asarray(old[2][1, :, 7, :])
    )
    np.testing.assert_array_equal(
        np.asarray(k_params[1]), np.asarray(old[1][1])
    )


def test_params_append_pallas_touches_only_target():
    kv_heads, s = 2, 128
    kprm = jnp.arange(3 * kv_heads * 2 * s, dtype=jnp.float32).reshape(
        3, kv_heads, 2, s
    )
    vprm = -kprm
    new_k = jnp.full((2, kv_heads, 2), 7.5, jnp.float32)
    new_v = jnp.full((2, kv_heads, 2), -2.5, jnp.float32)
    page_idx = jnp.asarray([1, 2], jnp.int32)
    slot = jnp.asarray([5, 100], jnp.int32)
    k2, v2 = append_params_pallas(
        kprm, vprm, new_k, new_v, page_idx, slot, interpret=True
    )
    want_k = np.array(kprm)
    want_k[1, :, :, 5] = 7.5
    want_k[2, :, :, 100] = 7.5
    np.testing.assert_array_equal(np.asarray(k2), want_k)
    want_v = np.array(vprm)
    want_v[1, :, :, 5] = -2.5
    want_v[2, :, :, 100] = -2.5
    np.testing.assert_array_equal(np.asarray(v2), want_v)
