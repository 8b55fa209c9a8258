#!/usr/bin/env python
"""Hardware validation + timing of the merged paged+ring decode kernel.

Round-3 page-layout ring: ``paged_ring_decode_attention`` runs the flushed
pages AND the hot-ring suffix in one Pallas kernel.  CPU tests cover it in
interpret mode (tests/test_ring_merged.py); this script checks the COMPILED
kernel on the tunneled TPU against the two-kernel scheme (paged kernel +
XLA ring attention + softmax merge) at 7B decode geometry, then slope-times
both paths.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_ring_kernel_hw.py
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    from atom_tpu.ops import reference as R
    from atom_tpu.ops.kv_hot import (
        hot_attention,
        make_hot,
        merge_attention,
        write_hot,
    )
    from atom_tpu.ops.kv_layout import (
        append_kv_prefill_kernel,
        make_kv_pages_kernel,
    )
    from atom_tpu.ops.pallas_decode import (
        paged_decode_attention_rotated,
        paged_ring_decode_attention,
    )
    from atom_tpu.utils.timing import bench_op

    b, ctx = args.batch, args.ctx
    h, hq, dh, page, w = 32, 32, 128, 256, 32
    sm = dh ** -0.5
    npp = -(-ctx // page)
    key = jax.random.PRNGKey(0)

    pages = make_kv_pages_kernel(b * npp + 1, h, page, dh)
    table = jnp.arange(1, b * npp + 1, dtype=jnp.int32).reshape(b, npp)
    t0 = time.time()
    assert ctx % page == 0

    # Fill ALL pages in one jitted, donated program: the eager per-page loop
    # dispatched b*npp appends over the ~30 ms tunnel, each one full-pool
    # copy-on-alias (~72 MB) because non-donated eager calls can't write in
    # place — population dominated the script's wall-clock.
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(pgs, tbl):
        def body(i, pgs_):
            s, p_i = i // npp, i % npp
            kv = jax.random.normal(jax.random.fold_in(key, s), (ctx, h, dh))
            vv = jnp.roll(kv, 1, axis=0) * 0.5 + 0.125
            # per-slot affine params: quantizing a chunk == chunking the
            # quantized whole
            kq = R.quantize_kv_asym(
                jax.lax.dynamic_slice_in_dim(kv, p_i * page, page))
            vq = R.quantize_kv_asym(
                jax.lax.dynamic_slice_in_dim(vv, p_i * page, page))
            return append_kv_prefill_kernel(
                pgs_, kq, vq,
                jnp.stack([tbl[s, p_i], jnp.int32(0)]),
            )
        return jax.lax.fori_loop(0, b * npp, body, pgs)

    pages = fill(pages, table)
    jax.block_until_ready(pages.k_pages)
    print(f"pages populated in {time.time()-t0:.0f}s", flush=True)

    hot = make_hot(b, h, dh, w)
    row = jnp.int32(13)
    for age in range(14):
        col = (13 - age) % w
        kj = jax.random.normal(jax.random.fold_in(key, 500 + col), (b, h, dh))
        hot = write_hot(
            hot, jnp.int32(col),
            R.quantize_kv_asym(kj), R.quantize_kv_asym(-kj * 0.25),
        )
    n_hot = jnp.full((b,), 14, jnp.int32)
    lens = jnp.full((b,), ctx, jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(9), (b, hq, dh), jnp.float32)

    t0 = time.time()
    got = paged_ring_decode_attention(q, pages, table, lens, hot, n_hot, row)
    got = np.asarray(got, dtype=np.float32)
    print(f"merged kernel compiled+ran in {time.time()-t0:.0f}s", flush=True)

    out1, m1, l1 = paged_decode_attention_rotated(
        q, pages, table, lens, return_state=True, out_dtype=jnp.float32)
    out2, m2, l2 = hot_attention(q, hot, n_hot, row, sm)
    want = np.asarray(
        merge_attention(out1, m1, l1, out2, m2, l2, out_dtype=jnp.float32))
    err = np.abs(got - want) / (np.abs(want) + 1e-3)
    frac = float(np.mean(err > 2e-2))
    print(f"parity vs two-kernel merge: max rel err {err.max():.2e}, "
          f"{frac:.5%} elems beyond 2e-2 (bf16-vs-f32 ring math)", flush=True)
    # A Mosaic miscompile corrupts whole tiles (gross, widespread error);
    # a handful of near-zero elements at bf16 noise is expected — a strict
    # max-err gate failed on 3/32k borderline elems even on CPU interpret.
    if frac > 1e-3 or err.max() > 0.5:
        bad = np.argwhere(err > 2e-2)
        print(f"FAIL: {bad.shape[0]} elems, first {bad[:3].tolist()}")
        raise SystemExit(1)

    t_merged = bench_op(
        lambda qq: paged_ring_decode_attention(
            qq, pages, table, lens, hot, n_hot, row),
        [q], iters=args.iters,
    )

    def two_kernel(qq):
        o1, mm1, ll1 = paged_decode_attention_rotated(
            qq, pages, table, lens, return_state=True, out_dtype=jnp.float32)
        o2, mm2, ll2 = hot_attention(qq, hot, n_hot, row, sm)
        return merge_attention(o1, mm1, ll1, o2, mm2, ll2)

    t_two = bench_op(two_kernel, [q], iters=args.iters)
    print(f"merged kernel:     {t_merged*1e6:8.1f} us")
    print(f"paged + XLA ring:  {t_two*1e6:8.1f} us")
    print(f"saved: {1e6*(t_two-t_merged):+.1f} us/layer "
          f"(x32 = {32e3*(t_two-t_merged):+.2f} ms/step)")


if __name__ == "__main__":
    main()
