"""Hardware smoke: compile + run ONE step of every serving path on the TPU.

Catches Mosaic lowering/compile regressions (which only surface on real
hardware — the CPU test suite runs Pallas in interpret mode) before the
long measurement queues spend hours on a path that crashes at compile.
Per-kernel shapes match the real benches (2 layers only: kernels are
per-layer, so layer count does not change any kernel's shape).

Usage:  python scripts/hw_smoke.py [--paths w4a4,fused,...]
Exit code = number of failing paths.
"""
import argparse
import os
import sys
import traceback


def _paths():
    from atom_tpu.benchmarks.bench_textgen import (
        burst_throughput_baseline,
        burst_throughput_lora,
        burst_throughput_moe,
        burst_throughput_w4a4,
        model_cfg,
    )

    cfg = model_cfg("7b", 2)

    def w4a4_fused():
        os.environ.pop("ATOM_TPU_NO_FUSED_MLP", None)
        os.environ.pop("ATOM_TPU_NO_FUSED_QKV", None)
        burst_throughput_w4a4(cfg, 32, 512, n_steps=1, head="w8a16")

    def w4a4_unfused():
        os.environ["ATOM_TPU_NO_FUSED_MLP"] = "1"
        os.environ["ATOM_TPU_NO_FUSED_QKV"] = "1"
        try:
            burst_throughput_w4a4(cfg, 32, 512, n_steps=1, head="w8a16")
        finally:
            os.environ.pop("ATOM_TPU_NO_FUSED_MLP", None)
            os.environ.pop("ATOM_TPU_NO_FUSED_QKV", None)

    def prefill512():
        import jax
        import jax.numpy as jnp
        import numpy as np
        from atom_tpu.config import ATOM_W4A4
        from atom_tpu.serving.kvpool import KvPool
        from atom_tpu.serving.model import (
            init_serving_params,
            make_serving_state,
            prefill_step,
        )

        spec = ATOM_W4A4
        params = init_serving_params(jax.random.PRNGKey(0), cfg, spec)
        page = 256
        max_pages = 4
        pool = KvPool(cfg.num_layers, 8, cfg.num_kv_heads, page, cfg.head_dim)
        state = make_serving_state(
            cfg.num_layers, 8, 1, cfg.num_kv_heads, page, cfg.head_dim
        )
        row = jnp.asarray(np.asarray(pool.alloc(max_pages), np.int32))
        tok, _ = prefill_step(
            params, state, jnp.ones((512,), jnp.int32), row,
            jnp.int32(500), jnp.int32(0), cfg, spec,
        )
        jax.block_until_ready(tok)

    def prefill_kernel_4k():
        # the flash-prefill Pallas kernel, forced on
        import jax
        import jax.numpy as jnp
        import numpy as np
        from atom_tpu.config import ATOM_W4A4
        from atom_tpu.serving import model as M
        from atom_tpu.serving.kvpool import KvPool

        spec = ATOM_W4A4
        params = M.init_serving_params(jax.random.PRNGKey(0), cfg, spec)
        page = 256
        max_pages = 16
        pool = KvPool(cfg.num_layers, 20, cfg.num_kv_heads, page, cfg.head_dim)
        state = M.make_serving_state(
            cfg.num_layers, 20, 1, cfg.num_kv_heads, page, cfg.head_dim
        )
        row = jnp.asarray(np.asarray(pool.alloc(max_pages), np.int32))
        old = M.PREFILL_KERNEL_THRESHOLD
        M.PREFILL_KERNEL_THRESHOLD = 1024
        try:
            tok, _ = M.prefill_step(
                params, state, jnp.ones((4096,), jnp.int32), row,
                jnp.int32(4000), jnp.int32(0), cfg, spec,
            )
            jax.block_until_ready(tok)
        finally:
            M.PREFILL_KERNEL_THRESHOLD = old

    return {
        "fused": w4a4_fused,
        "unfused": w4a4_unfused,
        "w8a8": lambda: burst_throughput_baseline(cfg, 32, 512, "w8a8", n_steps=1),
        "bf16": lambda: burst_throughput_baseline(cfg, 32, 512, "bf16", n_steps=1),
        "w4a16": lambda: burst_throughput_baseline(cfg, 32, 512, "w4a16", n_steps=1),
        "moe": lambda: burst_throughput_moe(32, 512, n_steps=1, layers=2),
        "lora": lambda: burst_throughput_lora(cfg, 32, 512, n_steps=1),
        "prefill512": prefill512,
        "prefill_kernel_4k": prefill_kernel_4k,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", default="")
    args = ap.parse_args(argv)
    paths = _paths()
    names = [n for n in args.paths.split(",") if n] or list(paths)
    failures = 0
    for name in names:
        print(f"--- {name}", flush=True)
        try:
            paths[name]()
            print(f"PASS {name}", flush=True)
        except Exception:
            failures += 1
            tb = traceback.format_exc()
            print(tb[-3000:], flush=True)
            print(f"FAIL {name}", flush=True)
    print(f"smoke: {len(names) - failures}/{len(names)} pass")
    return failures


if __name__ == "__main__":
    sys.exit(main())
