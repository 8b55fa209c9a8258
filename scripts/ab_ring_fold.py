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
    key = jax.random.PRNGKey(0)
    M, dh = 32, 128
    n_q, n_kv = 4096, 4096  # 7B geometry
    N = n_q + 2 * n_kv
    kb = 4096 - 128
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
        for name, ref, got in (
            ("q", q0, q1), ("kc", ref_hot.k_codes, kc1),
            ("prm", ref_hot.prm, kp1), ("vc", ref_hot.v_codes, vc1),
        ):
            r, g = np.asarray(ref), np.asarray(got)
            if not np.array_equal(r, g):
                bad = np.argwhere(r != g)
                print(f"row {row_i} {name}: MISMATCH {bad.shape[0]} elems, "
                      f"first {bad[:3].tolist()}")
                ok = False
        print(f"row {row_i}: {'OK' if ok else 'FAIL'} "
              f"({time.time()-t0:.0f}s)", flush=True)
    if not ok:
        raise SystemExit(1)

    from atom_tpu.utils.timing import bench_op

    hot = make_hot(M, H, dh)
    t_f = bench_op(
        lambda cos_: packed_w4_gemm_qkv_ring(
            a, wp, wk, sa, sw, cos_, sin,
            hot.k_codes, hot.prm, hot.v_codes, jnp.int32(5),
            n_q=n_q, n_kv=n_kv, head_dim=dh,
        ),
        [cos], iters=30,
    )

    def unfused(cos_):
        q, kc, kp, vc, vp = packed_w4_gemm_qkv(
            a, wp, wk, sa, sw, cos_, sin, n_q=n_q, n_kv=n_kv, head_dim=dh
        )
        h2 = write_hot(
            hot, jnp.int32(5),
            KVQuant(kc.reshape(M, H, dh), kp),
            KVQuant(vc.reshape(M, H, dh), vp),
        )
        return q, h2

    t_u = bench_op(unfused, [cos], iters=30)
    print(f"fused ring: {t_f*1e6:7.1f} us")
    print(f"unfused+write_hot: {t_u*1e6:7.1f} us")
    print(f"saved: {1e6*(t_u-t_f):+.1f} us/layer")


if __name__ == "__main__":
    main()
