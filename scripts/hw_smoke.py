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
        os.environ["ATOM_TPU_FUSED_MLP"] = "1"  # opt-in since round 5
        try:
            burst_throughput_w4a4(cfg, 32, 512, n_steps=1, head="w8a16")
        finally:
            os.environ.pop("ATOM_TPU_FUSED_MLP", None)

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

    def _longctx(key_block):
        # direct repro of the r3 hardware failure (/tmp/r3_longctx.log):
        # prefill_hidden at t=2048 through real pages, one-pass + scanned.
        import jax
        import jax.numpy as jnp
        import numpy as np
        from atom_tpu.config import ATOM_W4A4
        from atom_tpu.ops.kv_layout import make_kv_pages_kernel
        from atom_tpu.serving import model as M

        spec = ATOM_W4A4
        params = M.init_serving_params(jax.random.PRNGKey(0), cfg, spec)
        t, page = 2048, 256
        n_pages = t // page + 2
        table_row = jnp.arange(1, n_pages + 1, dtype=jnp.int32)
        pages = [
            make_kv_pages_kernel(
                n_pages + 2, cfg.num_kv_heads, page, cfg.head_dim
            )
            for _ in range(cfg.num_layers)
        ]
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.vocab_size, t), jnp.int32
        )
        old = (M.PREFILL_SCAN_THRESHOLD, M.PREFILL_KEY_BLOCK)
        M.PREFILL_SCAN_THRESHOLD = 0 if key_block else 10**9
        M.PREFILL_KEY_BLOCK = key_block or old[1]
        try:
            x, new_pages = M.prefill_hidden(params, pages, ids, table_row, cfg, spec)
            jax.block_until_ready(x)
        finally:
            M.PREFILL_SCAN_THRESHOLD, M.PREFILL_KEY_BLOCK = old

    def parity():
        # Fused-vs-unfused decode_hidden parity ON HARDWARE — the tripwire
        # for the r3 Mosaic divergence class (~12.7-13% of elements beyond
        # 0.05).  On-chip the pins make the two paths near-bitwise (round-4
        # bisection); benign residue is the Mosaic reciprocal-multiply KV
        # quantize flips (~1.5% of codes -> well under 2% of outputs here).
        # The CPU suite CANNOT measure this (interpret-mode excess
        # precision seeds ~13% benign drift — tests/test_serving.py).
        import numpy as np

        import jax
        import jax.numpy as jnp
        from atom_tpu.config import QuantSpec
        from atom_tpu.models.configs import Arch, ModelConfig
        from atom_tpu.serving.model import (
            decode_hidden,
            init_serving_params,
            make_serving_state,
        )

        pcfg = ModelConfig(
            arch=Arch.LLAMA, vocab_size=199, hidden_size=512,
            intermediate_size=768, num_layers=2, num_heads=8,
            num_kv_heads=4, head_dim=128, max_position_embeddings=512,
        )
        spec = QuantSpec(weight_channel_group=1)
        b, n_pages, page = 32, 12, 128
        params = init_serving_params(jax.random.PRNGKey(5), pcfg, spec)
        rng = np.random.Generator(np.random.PCG64(6))
        ids = jnp.asarray(rng.integers(1, pcfg.vocab_size, b), jnp.int32)
        table = jnp.zeros((b, 2), jnp.int32)
        lens = jnp.ones((b,), jnp.int32)
        outs = {}
        import os as _os

        _os.environ["ATOM_TPU_FUSED_MLP"] = "1"  # opt-in since round 5
        for name, sp in (
            ("fused", spec), ("nofuse", spec.replace(fused_serving=False))
        ):
            state = make_serving_state(
                pcfg.num_layers, n_pages, b, pcfg.num_kv_heads, page,
                pcfg.head_dim,
            )
            x, _ = decode_hidden(params, state, ids, table, lens, pcfg, sp)
            outs[name] = np.asarray(x, np.float32)
        _os.environ.pop("ATOM_TPU_FUSED_MLP", None)
        diff = np.abs(outs["fused"] - outs["nofuse"])
        moved = float(np.mean(diff > 0.05))
        bitwise = float(np.mean(outs["fused"] == outs["nofuse"]))
        print(
            f"parity: bitwise {bitwise:.4%}, frac>0.05 {moved:.4%}, "
            f"max|d| {diff.max():.3f}"
        )
        assert moved < 0.02, (
            f"HARDWARE fused/unfused divergence: {moved:.2%} beyond 0.05 "
            f"(r3 failure class was 12.7-13%)"
        )

    def parity_7b():
        # Same check at PRODUCTION width (hidden 4096 / inter 11008, 1
        # layer): ab_fused_mlp's qkv A/B reports ~1% kc flips at d=4096 on
        # synthetic scales while the d=512 parity is bitwise — this decides
        # whether the production geometry is affected or the A/B's
        # synthetic inputs overstate boundary-sitting codes.
        import numpy as np

        import jax
        import jax.numpy as jnp
        from atom_tpu.config import ATOM_W4A4
        from atom_tpu.models.configs import Arch, ModelConfig
        from atom_tpu.serving.model import (
            decode_hidden,
            init_serving_params,
            make_serving_state,
        )

        pcfg = ModelConfig(
            arch=Arch.LLAMA, vocab_size=499, hidden_size=4096,
            intermediate_size=11008, num_layers=1, num_heads=32,
            num_kv_heads=32, head_dim=128, max_position_embeddings=512,
        )
        spec = ATOM_W4A4
        b, n_pages, page = 32, 12, 128
        params = init_serving_params(jax.random.PRNGKey(7), pcfg, spec)
        rng = np.random.Generator(np.random.PCG64(8))
        ids = jnp.asarray(rng.integers(1, pcfg.vocab_size, b), jnp.int32)
        table = jnp.zeros((b, 2), jnp.int32)
        lens = jnp.ones((b,), jnp.int32)
        outs = {}
        import os as _os

        _os.environ["ATOM_TPU_FUSED_MLP"] = "1"  # opt-in since round 5
        for name, sp in (
            ("fused", spec), ("nofuse", spec.replace(fused_serving=False))
        ):
            state = make_serving_state(
                pcfg.num_layers, n_pages, b, pcfg.num_kv_heads, page,
                pcfg.head_dim,
            )
            x, st = decode_hidden(params, state, ids, table, lens, pcfg, sp)
            outs[name] = (
                np.asarray(x, np.float32),
                np.asarray(st.hot[0].k_codes),
                np.asarray(st.hot[0].v_codes),
            )
        _os.environ.pop("ATOM_TPU_FUSED_MLP", None)
        diff = np.abs(outs["fused"][0] - outs["nofuse"][0])
        moved = float(np.mean(diff > 0.05))
        kc_eq = float(np.mean(outs["fused"][1] == outs["nofuse"][1]))
        vc_eq = float(np.mean(outs["fused"][2] == outs["nofuse"][2]))
        print(
            f"parity_7b: hidden bitwise "
            f"{float(np.mean(outs['fused'][0] == outs['nofuse'][0])):.4%}, "
            f"frac>0.05 {moved:.4%}, kc equal {kc_eq:.6%}, "
            f"vc equal {vc_eq:.6%}"
        )
        assert moved < 0.02, f"7B-width fused/unfused divergence {moved:.2%}"

    return {
        "fused": w4a4_fused,
        "unfused": w4a4_unfused,
        "parity": parity,
        "parity_7b": parity_7b,
        "longctx2048": lambda: _longctx(0),
        "longctx2048_scan": lambda: _longctx(1024),
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
    from atom_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
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
