"""Benchmark entry point — prints ONE JSON line for the driver.

Current metric (interim, will become the full continuous-batching serving
benchmark as the Pallas serving path lands): fake-quant W4A4 Llama-7B-geometry
prefill throughput on one chip, extrapolated from a 4-layer slice to the full
32 layers.  Baseline: the reference's e2e serving throughput on RTX 4090
(2052.8 tok/s, ``e2e/punica-atom/README.md:22-27``) — not directly comparable
until the serving engine lands; recorded for trend tracking.
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.models import LLAMA_7B
    from atom_tpu.models import llama

    n_bench_layers = 4
    cfg = LLAMA_7B.replace(num_layers=n_bench_layers)
    spec = ATOM_W4A4

    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    batch, seqlen = 4, 512
    ids = jnp.zeros((batch, seqlen), jnp.int32)

    # NOTE: fetch a SCALAR per call — on the tunneled TPU platform,
    # block_until_ready() on a remote buffer returns immediately and bulk
    # device->host transfers are pathologically slow; a scalar reduction is the
    # only reliable execution barrier.
    fwd = jax.jit(lambda p, i: jnp.sum(llama.forward(p, i, cfg, spec)))
    float(fwd(params, ids))  # compile + first run

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        val = float(fwd(params, ids))
    dt = (time.perf_counter() - t0) / n_iters

    # Extrapolate 4 -> 32 layers (layer-dominated runtime).
    full_dt = dt * (LLAMA_7B.num_layers / n_bench_layers)
    tok_s = batch * seqlen / full_dt
    baseline = 2052.8
    print(
        json.dumps(
            {
                "metric": "llama7b_w4a4_prefill_tokens_per_s_per_chip",
                "value": round(tok_s, 1),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
