"""Round-3 page-layout ring: direct unit tests.

Covers the two pieces the serving tests only reach at small geometry:

  * ``paged_ring_decode_attention`` (pages + ring suffix in ONE kernel) vs
    the two-kernel scheme (paged kernel softmax-merged with the XLA ring
    attention) and vs a dense dequantized oracle;
  * ``packed_w4_gemm_qkv_ring`` (in-GEMM ring store) vs
    ``packed_w4_gemm_qkv`` + ``write_hot`` at the FUSED geometry gate
    (b % 32 == 0, head_dim 128, n_q/n_kv % 512 == 0) that the engine tests'
    small batches never hit.

Reference analog: the fused o4 epilogue feeding the KV cache
(``e2e/punica-atom/.../DenseLayerGEMM_i4_o4.cu:728-775``) and the
fused-dequant decode attention (``kernels/include/flashinfer/decode.cuh:492``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atom_tpu.ops import reference as R
from atom_tpu.ops.kv_layout import append_kv_prefill_kernel, make_kv_pages_kernel
from atom_tpu.ops.kv_hot import (
    HotKV,
    hot_attention,
    make_hot,
    merge_attention,
    write_hot,
)
from atom_tpu.ops.pallas_decode import (
    paged_decode_attention_rotated,
    paged_ring_decode_attention,
)

PAGE = 64
HEAD_DIM = 128

pytestmark = pytest.mark.quick


@pytest.mark.parametrize(
    "kv_heads,groups,flushed,n_hot,row_now",
    [
        (2, 1, [64, 128], [7, 32], 12),   # MHA; seq 1 = full ring
        (2, 4, [0, 64], [3, 0], 2),       # GQA; seq 0 pages-empty, seq 1 ring-empty
        (8, 2, [64, 30], [32, 15], 31),   # ring row at wrap edge
    ],
)
def test_merged_kernel_matches_two_kernel_merge(
    kv_heads, groups, flushed, n_hot, row_now
):
    """ONE merged kernel == paged kernel + XLA ring attention + merge, and
    both == the dense dequantized-attention oracle."""
    b = len(flushed)
    hq = kv_heads * groups
    w = 32
    n_pages = 1 + sum((f + PAGE - 1) // PAGE for f in flushed)
    key = jax.random.PRNGKey(0)
    sm = HEAD_DIM ** -0.5

    pages = make_kv_pages_kernel(n_pages, kv_heads, PAGE, HEAD_DIM)
    tables = []
    kall, vall = [], []
    next_page = 1
    for s in range(b):
        f = flushed[s]
        kv = jax.random.normal(
            jax.random.fold_in(key, s), (max(f, 1), kv_heads, HEAD_DIM)
        )
        vv = jnp.roll(kv, 1, axis=0) * 0.5 + 0.125
        kq, vq = R.quantize_kv_asym(kv), R.quantize_kv_asym(vv)
        pids = []
        for off in range(0, f, PAGE):
            n_tok = min(PAGE, f - off)
            pages = append_kv_prefill_kernel(
                pages,
                R.KVQuant(kq.codes[off : off + n_tok], kq.params[off : off + n_tok]),
                R.KVQuant(vq.codes[off : off + n_tok], vq.params[off : off + n_tok]),
                jnp.asarray([next_page, 0], jnp.int32),
            )
            pids.append(next_page)
            next_page += 1
        tables.append(pids)
        kall.append(kq if f else None)
        vall.append(vq if f else None)

    max_pages = max(max(len(t) for t in tables), 1)
    table = jnp.asarray(
        [t + [0] * (max_pages - len(t)) for t in tables], jnp.int32
    )

    # hot ring: per-seq suffix of n_hot tokens ending at column row_now
    hot = make_hot(b, kv_heads, HEAD_DIM, w)
    ring_k = [[None] * w for _ in range(b)]
    ring_v = [[None] * w for _ in range(b)]
    for age in range(max(n_hot) - 1, -1, -1):
        col = (row_now - age) % w
        kj = jax.random.normal(
            jax.random.fold_in(key, 1000 + col), (b, kv_heads, HEAD_DIM)
        )
        vj = -kj * 0.25 + 0.0625
        kq = R.quantize_kv_asym(kj)
        vq = R.quantize_kv_asym(vj)
        hot = write_hot(hot, jnp.int32(col), kq, vq)
        for s in range(b):
            if age < n_hot[s]:
                ring_k[s][col] = (kq.codes[s], kq.params[s])
                ring_v[s][col] = (vq.codes[s], vq.params[s])

    q = jax.random.normal(jax.random.PRNGKey(9), (b, hq, HEAD_DIM), jnp.float32)
    fl = jnp.asarray(flushed, jnp.int32)
    nh = jnp.asarray(n_hot, jnp.int32)
    row = jnp.int32(row_now)

    got = paged_ring_decode_attention(
        q, pages, table, fl, hot, nh, row, out_dtype=jnp.float32,
        interpret=True,
    )

    # two-kernel scheme
    out1, m1, l1 = paged_decode_attention_rotated(
        q, pages, table, fl, return_state=True, out_dtype=jnp.float32,
        interpret=True,
    )
    out2, m2, l2 = hot_attention(q, hot, nh, row, sm)
    want = merge_attention(out1, m1, l1, out2, m2, l2, out_dtype=jnp.float32)
    # merged kernel does the ring step in bf16 MXU dots; the XLA fallback
    # is f32 einsum — only precision separates them
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-3, atol=1e-3
    )

    # dense oracle over dequantized K/V (only quantization error between them)
    for s in range(b):
        kd, vd = [], []
        if flushed[s]:
            kd.append(R.dequantize_kv(kall[s].codes, kall[s].params))
            vd.append(R.dequantize_kv(vall[s].codes, vall[s].params))
        for age in range(n_hot[s] - 1, -1, -1):
            col = (row_now - age) % w
            kc, kp = ring_k[s][col]
            vc, vp = ring_v[s][col]
            kd.append(R.dequantize_kv(kc[None], kp[None]))
            vd.append(R.dequantize_kv(vc[None], vp[None]))
        kd = jnp.concatenate(kd, axis=0)  # [T, H, D]
        vd = jnp.concatenate(vd, axis=0)
        kd = jnp.repeat(kd, groups, axis=1) if groups > 1 else kd
        vd = jnp.repeat(vd, groups, axis=1) if groups > 1 else vd
        scores = jnp.einsum("hd,thd->ht", q[s], kd) * sm
        p = jax.nn.softmax(scores, axis=-1)
        want_o = jnp.einsum("ht,thd->hd", p, vd)
        np.testing.assert_allclose(
            np.asarray(got[s]), np.asarray(want_o), rtol=3e-3, atol=3e-3
        )


@pytest.mark.parametrize("row_i", [0, 7, 13, 31])
def test_gemm_ring_store_matches_write_hot(row_i):
    """Fused-geometry gate (b=32, dh=128, n_q=n_kv=512): in-GEMM ring store
    == unfused GEMM + write_hot, with untouched ring columns preserved."""
    from atom_tpu.ops.pallas_gemm_packed import (
        packed_w4_gemm_qkv,
        packed_w4_gemm_qkv_ring,
    )

    M, dh = 32, HEAD_DIM
    n_q = n_kv = 512
    H = n_kv // dh
    kb = 256
    ng = kb // 128
    N = n_q + 2 * n_kv
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    a = jax.random.randint(ks[0], (M, kb + 128), -8, 8, jnp.int8)
    wp = jax.random.randint(ks[1], (kb // 2, N), -128, 127, jnp.int8)
    wk = jax.random.randint(ks[2], (128, N), -128, 127, jnp.int8)
    sa = jax.random.uniform(ks[3], (M, ng + 1), jnp.float32, 0.01, 0.02)
    sw = jax.random.uniform(ks[4], (ng + 1, N), jnp.float32, 0.01, 0.02)
    cos = jax.random.uniform(ks[5], (M, dh), jnp.float32, -1, 1)
    sin = jax.random.uniform(ks[6], (M, dh), jnp.float32, -1, 1)

    q0, kc0, kp0, vc0, vp0 = packed_w4_gemm_qkv(
        a, wp, wk, sa, sw, cos, sin, n_q=n_q, n_kv=n_kv, head_dim=dh,
        interpret=True,
    )

    hot = make_hot(M, H, dh)
    hot = hot._replace(
        k_codes=jnp.full(hot.k_codes.shape, 3, jnp.int8),
        prm=jnp.full(hot.prm.shape, 7.0, jnp.bfloat16),
        v_codes=jnp.full(hot.v_codes.shape, 5, jnp.int8),
    )
    row = jnp.int32(row_i)
    ref_hot = write_hot(
        hot, row,
        R.KVQuant(kc0.reshape(M, H, dh), kp0),
        R.KVQuant(vc0.reshape(M, H, dh), vp0),
    )

    q1, kc1, kp1, vc1 = packed_w4_gemm_qkv_ring(
        a, wp, wk, sa, sw, cos, sin,
        hot.k_codes, hot.prm, hot.v_codes, row,
        n_q=n_q, n_kv=n_kv, head_dim=dh, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))
    np.testing.assert_array_equal(np.asarray(ref_hot.k_codes), np.asarray(kc1))
    np.testing.assert_array_equal(
        np.asarray(ref_hot.prm, dtype=np.float32),
        np.asarray(kp1, dtype=np.float32),
    )
    np.testing.assert_array_equal(np.asarray(ref_hot.v_codes), np.asarray(vc1))
