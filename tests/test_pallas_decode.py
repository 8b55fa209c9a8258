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
    append_kv_prefill_kernel,
    kv_codes_from_kernel,
    kv_pages_from_reference,
    make_kv_pages_kernel,
)
from atom_tpu.ops.pallas_decode import (
    flush_hot_pallas,
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



def test_flush_hot_pallas_and_hot_attention():
    """Flush W-aligned blocks into pages == reference prefill of the same
    tokens; hot attention + merge == full attention oracle."""
    from atom_tpu.ops.kv_hot import (
        hot_attention,
        hot_flush_blocks,
        make_hot,
        merge_attention,
        write_hot,
    )

    kv_heads, d, w = 2, HEAD_DIM, 32
    batch = 2
    n_pages = 4
    key = jax.random.PRNGKey(3)

    # Sequence lengths chosen so seq 0 flushes a FULL block and seq 1 flushes
    # with a masked prefix (its first 5 tokens were "prefilled").
    pre = [0, 5]
    total = [32, 32]
    k_vals = jax.random.normal(key, (batch, 32, kv_heads, d), jnp.float32)
    v_vals = -k_vals + 0.25

    kq = [R.quantize_kv_asym(k_vals[b]) for b in range(batch)]
    vq = [R.quantize_kv_asym(v_vals[b]) for b in range(batch)]

    # --- reference: straight prefill append of all 32 tokens ---
    want = make_kv_pages_kernel(n_pages, kv_heads, PAGE, HEAD_DIM)
    for b in range(batch):
        want = append_kv_prefill_kernel(
            want, kq[b], vq[b], jnp.asarray([b + 1, 0], jnp.int32)
        )

    # --- hot path: write rows 0..31 then flush (seq b -> page b+1, lane0 0) ---
    pages = make_kv_pages_kernel(n_pages, kv_heads, PAGE, HEAD_DIM)
    # pre-populate seq 1's prefix via prefill (tokens [0, 5))
    pages = append_kv_prefill_kernel(
        pages,
        R.KVQuant(kq[1].codes[:5], kq[1].params[:5]),
        R.KVQuant(vq[1].codes[:5], vq[1].params[:5]),
        jnp.asarray([2, 0], jnp.int32),
    )
    hot = make_hot(batch, kv_heads, d, w)
    for j in range(w):
        kj = R.KVQuant(
            jnp.stack([kq[b].codes[j] for b in range(batch)]),
            jnp.stack([kq[b].params[j] for b in range(batch)]),
        )
        vj = R.KVQuant(
            jnp.stack([vq[b].codes[j] for b in range(batch)]),
            jnp.stack([vq[b].params[j] for b in range(batch)]),
        )
        hot = write_hot(hot, jnp.int32(j % w), kj, vj)

    row_now = jnp.int32(w - 1)
    pages = flush_hot_pallas(
        pages,
        *hot_flush_blocks(hot, row_now),
        jnp.asarray([1, 2], jnp.int32),   # page_a
        jnp.asarray([0, 0], jnp.int32),   # page_b (no crossing)
        jnp.asarray([0, 0], jnp.int32),   # slot0
        jnp.asarray([0, 0], jnp.int32),   # o
        jnp.asarray(pre, jnp.int32),      # lo (= flushed before)
        jnp.asarray(total, jnp.int32),    # hi (= lens)
        interpret=True,
    )
    for a, b_ in zip(pages, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    # --- hot attention + merge == oracle over the full 32 tokens ---
    q = jax.random.normal(jax.random.PRNGKey(7), (batch, kv_heads, d), jnp.float32)
    lens = jnp.asarray(total, jnp.int32)
    table = jnp.asarray([[1, 0], [2, 0]], jnp.int32)
    sm = d ** -0.5

    # paged part over the first 16 "flushed" tokens + hot part over the rest
    flushed = jnp.asarray([16, 16], jnp.int32)
    out1, m1, l1 = paged_decode_attention_rotated(
        q, pages, table, flushed, return_state=True, out_dtype=jnp.float32,
        interpret=True,
    )
    n_hot = lens - flushed
    out2, m2, l2 = hot_attention(q, hot, n_hot, row_now, sm)
    got = merge_attention(out1, m1, l1, out2, m2, l2, out_dtype=jnp.float32)

    # oracle: dense attention over all 32 dequantized tokens
    for b in range(batch):
        kd = R.dequantize_kv(kq[b].codes, kq[b].params)  # [32, H, D]
        vd = R.dequantize_kv(vq[b].codes, vq[b].params)
        scores = jnp.einsum("hd,thd->ht", q[b], kd) * sm
        pmax = jax.nn.softmax(scores, axis=-1)
        want_o = jnp.einsum("ht,thd->hd", pmax, vd)
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(want_o), rtol=3e-4, atol=3e-4
        )

def test_flush_crossing_page_boundary():
    """A flush block spanning two pages lands correctly via the two passes."""
    from atom_tpu.ops.kv_hot import hot_flush_blocks, make_hot, write_hot

    kv_heads, d, w = 2, HEAD_DIM, 32
    n_pages = 4
    total = 144  # flush block = slots [112, 144): crosses the 128 boundary
    key = jax.random.PRNGKey(9)
    k_vals = jax.random.normal(key, (total, kv_heads, d), jnp.float32)
    kq = R.quantize_kv_asym(k_vals)
    vq = R.quantize_kv_asym(0.5 - k_vals)
    table = jnp.asarray([1, 2, 0], jnp.int32)

    want = append_kv_prefill_kernel(
        make_kv_pages_kernel(n_pages, kv_heads, PAGE, HEAD_DIM), kq, vq, table
    )

    pages = append_kv_prefill_kernel(
        make_kv_pages_kernel(n_pages, kv_heads, PAGE, HEAD_DIM),
        R.KVQuant(kq.codes[:112], kq.params[:112]),
        R.KVQuant(vq.codes[:112], vq.params[:112]),
        table,
    )
    hot = make_hot(1, kv_heads, d, w)
    for j in range(w):
        hot = write_hot(
            hot, jnp.int32(j),
            R.KVQuant(kq.codes[112 + j][None], kq.params[112 + j][None]),
            R.KVQuant(vq.codes[112 + j][None], vq.params[112 + j][None]),
        )
    row_now = jnp.int32(w - 1)
    # lens=144, W=32: page_lo = 112 // 128 = 0, slot0 = 0, o = 112
    pages = flush_hot_pallas(
        pages,
        *hot_flush_blocks(hot, row_now),
        jnp.asarray([1], jnp.int32),    # page_a
        jnp.asarray([2], jnp.int32),    # page_b (crossing)
        jnp.asarray([0], jnp.int32),    # slot0
        jnp.asarray([112], jnp.int32),  # o
        jnp.asarray([112], jnp.int32),  # lo
        jnp.asarray([144], jnp.int32),  # hi
        interpret=True,
    )
    for name, a, b_ in zip(["kp", "kprm", "vp", "vprm"], pages, want):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b_), err_msg=name
        )

def test_embed_gather_matches_take():
    from atom_tpu.ops.pallas_misc import embed_gather

    key = jax.random.PRNGKey(0)
    embed = jax.random.normal(key, (64, 256), jnp.bfloat16)
    ids = jnp.asarray([0, 7, 8, 63, 33, 33, 15, 9], jnp.int32)
    got = embed_gather(embed, ids, interpret=True)
    want = jnp.take(embed, ids, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
