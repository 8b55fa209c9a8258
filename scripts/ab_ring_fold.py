#!/usr/bin/env python
"""Validate + time the ring-folded qkv GEMM on real hardware (7B geometry).

Checks bitwise equality of (q, ring) against packed_w4_gemm_qkv + write_hot
across ring rows (incl. 8-row block boundaries), then slope-times both paths.

    python scripts/ab_ring_fold.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from atom_tpu.ops.kv_hot import make_hot, write_hot
from atom_tpu.ops.pallas_gemm_packed import (
    packed_w4_gemm_qkv,
    packed_w4_gemm_qkv_ring,
)
from atom_tpu.ops.reference import KVQuant


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096,
                    help="n_q = n_kv (4096 = 7B; small for CPU smoke)")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    M, dh = 32, 128
    n_q, n_kv = args.n, args.n  # 7B geometry by default
    N = n_q + 2 * n_kv
    kb = n_q - 128
    ng = kb // 128
    ks = jax.random.split(key, 8)
    a = jax.random.randint(ks[0], (M, kb + 128), -8, 8, jnp.int8)
    wp = jax.random.randint(ks[1], (kb // 2, N), -128, 127, jnp.int8)
    wk = jax.random.randint(ks[2], (128, N), -128, 127, jnp.int8)
    sa = jax.random.uniform(ks[3], (M, ng + 1), jnp.float32, 0.01, 0.02)
    sw = jax.random.uniform(ks[4], (ng + 1, N), jnp.float32, 0.01, 0.02)
    cos = jax.random.uniform(ks[5], (M, dh), jnp.float32, -1, 1)
    sin = jax.random.uniform(ks[6], (M, dh), jnp.float32, -1, 1)
    H = n_kv // dh

    t0 = time.time()
    q0, kc0, kp0, vc0, vp0 = packed_w4_gemm_qkv(
        a, wp, wk, sa, sw, cos, sin, n_q=n_q, n_kv=n_kv, head_dim=dh
    )
    jax.block_until_ready(q0)
    print(f"unfused compiled in {time.time()-t0:.0f}s", flush=True)

    ok = True
    row_ok = True
    for row_i in (0, 7, 13, 31):
        hot = make_hot(M, H, dh)
        hot = hot._replace(
            k_codes=jnp.full(hot.k_codes.shape, 3, jnp.int8),
            prm=jnp.full(hot.prm.shape, 7.0, jnp.bfloat16),
            v_codes=jnp.full(hot.v_codes.shape, 5, jnp.int8),
        )
        row = jnp.int32(row_i)
        ref_hot = write_hot(
            hot, row,
            KVQuant(kc0.reshape(M, H, dh), kp0),
            KVQuant(vc0.reshape(M, H, dh), vp0),
        )
        t0 = time.time()
        q1, kc1, kp1, vc1 = packed_w4_gemm_qkv_ring(
            a, wp, wk, sa, sw, cos, sin,
            hot.k_codes, hot.prm, hot.v_codes, row,
            n_q=n_q, n_kv=n_kv, head_dim=dh,
        )
        row_ok = True
        for name, ref, got in (
            ("q", q0, q1), ("kc", ref_hot.k_codes, kc1),
            ("prm", ref_hot.prm, kp1), ("vc", ref_hot.v_codes, vc1),
        ):
            r, g = np.asarray(ref), np.asarray(got)
            if not np.array_equal(r, g):
                bad = np.argwhere(r != g)
                print(f"row {row_i} {name}: MISMATCH {bad.shape[0]} elems, "
                      f"first {bad[:3].tolist()}")
                row_ok = False
        ok = ok and row_ok
        print(f"row {row_i}: {'OK' if row_ok else 'FAIL'} "
              f"({time.time()-t0:.0f}s)", flush=True)
    if not ok:
        raise SystemExit(1)

    # Slope timing with the ring LOOP-CARRIED, as production does
    # (decode_burst carries the ring through the step): benching with a
    # loop-INVARIANT ring makes XLA materialize a full copy-on-alias of the
    # ~6 MB ring every iteration in the fused arm — roughly the cost of the
    # write_hot rebuild it replaces — and the measured delta collapses to ~0.
    iters = args.iters

    @jax.jit
    def fused_chain(n, kc, pr, vc, cos_):
        def body(i, carry):
            kc_, pr_, vc_, c_ = carry
            q, kc_, pr_, vc_ = packed_w4_gemm_qkv_ring(
                a, wp, wk, sa, sw, c_, sin, kc_, pr_, vc_,
                (jnp.int32(5) + i) % 32,
                n_q=n_q, n_kv=n_kv, head_dim=dh,
            )
            return kc_, pr_, vc_, c_ + jnp.sum(q).astype(jnp.float32) * 1e-30
        kc, pr, vc, c = jax.lax.fori_loop(0, n, body, (kc, pr, vc, cos_))
        return jnp.sum(c)

    @jax.jit
    def unfused_chain(n, kc, pr, vc, cos_):
        def body(i, carry):
            kc_, pr_, vc_, c_ = carry
            q, kcq, kpq, vcq, vpq = packed_w4_gemm_qkv(
                a, wp, wk, sa, sw, c_, sin, n_q=n_q, n_kv=n_kv, head_dim=dh
            )
            h2 = write_hot(
                make_hot(M, H, dh)._replace(k_codes=kc_, prm=pr_, v_codes=vc_),
                (jnp.int32(5) + i) % 32,
                KVQuant(kcq.reshape(M, H, dh), kpq),
                KVQuant(vcq.reshape(M, H, dh), vpq),
            )
            return (h2.k_codes, h2.prm, h2.v_codes,
                    c_ + jnp.sum(q).astype(jnp.float32) * 1e-30)
        kc, pr, vc, c = jax.lax.fori_loop(0, n, body, (kc, pr, vc, cos_))
        return jnp.sum(c)

    hot = make_hot(M, H, dh)

    def slope(fn):
        lo, hi = jnp.int32(1), jnp.int32(1 + iters)
        float(fn(lo, hot.k_codes, hot.prm, hot.v_codes, cos))
        float(fn(hi, hot.k_codes, hot.prm, hot.v_codes, cos))
        ts = []
        for n in (lo, hi, lo, hi):
            t0 = time.perf_counter()
            float(fn(n, hot.k_codes, hot.prm, hot.v_codes, cos))
            ts.append(time.perf_counter() - t0)
        return (min(ts[1], ts[3]) - min(ts[0], ts[2])) / iters

    t_f = slope(fused_chain)
    t_u = slope(unfused_chain)
    print(f"fused ring: {t_f*1e6:7.1f} us")
    print(f"unfused+write_hot: {t_u*1e6:7.1f} us")
    print(f"saved: {1e6*(t_u-t_f):+.1f} us/layer")


if __name__ == "__main__":
    main()
