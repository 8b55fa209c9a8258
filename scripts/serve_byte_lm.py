#!/usr/bin/env python
"""Deployment PPL parity: the calibrated byte-LM served through real kernels.

The reference's accuracy story is simulated quantization (``model/``) and its
serving story is random-weight benchmarks (``e2e/.../bench_textgen.py``) — the
two never meet.  Here they do: calibrate the trained byte-LM (W4A4 GPTQ, the
ablation ladder's ``+kv_cache`` rung), export it with
``pack_calibrated_params`` (exact GPTQ code transfer via exported scales), and
score the SAME eval text through the real-kernel serving prefill.  The served
byte-PPL should track the accuracy pipeline's within cross-implementation
rounding noise — the end-to-end proof that deployment preserves calibrated
quality.

    PYTHONPATH=/root/repo PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/serve_byte_lm.py --seqlen 512 --windows 12
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="data/byte_lm_ckpt.npz")
    ap.add_argument("--corpus_dir", default="data/corpus")
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--windows", type=int, default=12)
    ap.add_argument("--calib_samples", type=int, default=16)
    ap.add_argument("--layers", type=int, default=0, help="truncate (smoke)")
    ap.add_argument("--page", type=int, default=256)
    args = ap.parse_args()

    from atom_tpu.calib.data import corpus_loaders
    from atom_tpu.calib.pipeline import calibrate
    from atom_tpu.config import ATOM_W4A4
    from atom_tpu.models import BYTE_LM, llama
    from atom_tpu.models.hf_loader import pack_calibrated_params
    from atom_tpu.serving.model import (
        _lm_head_logits,
        make_serving_state,
        prefill_hidden,
    )
    from atom_tpu.utils.checkpoint import restore_model_params
    from atom_tpu.utils.eval import perplexity

    cfg = BYTE_LM
    spec = ATOM_W4A4  # gptq + reorder + kv quant: the ladder's final rung

    params = restore_model_params(args.ckpt, llama, cfg, args.layers)
    if args.layers:
        cfg = cfg.replace(num_layers=args.layers)
    batches, test = corpus_loaders(
        nsamples=args.calib_samples, seqlen=args.seqlen,
        corpus_dir=args.corpus_dir,
    )
    test = np.asarray(test).reshape(-1)[: args.seqlen * args.windows]
    print(f"byte-LM L={cfg.num_layers} eval={len(test)} tokens "
          f"({args.windows} x {args.seqlen})", flush=True)

    t0 = time.time()
    scales = {}
    calib, _ = calibrate(
        params, cfg, spec, [jnp.asarray(b) for b in batches],
        scales_out=scales,
    )
    print(f"calibrated in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    ppl_acc = perplexity(calib, cfg, spec, test, seqlen=args.seqlen,
                         progress=True)
    print(f"accuracy-pipeline PPL in {time.time()-t0:.0f}s", flush=True)

    sp = pack_calibrated_params(calib, cfg, spec, gptq_scales=scales)

    npp = -(-args.seqlen // args.page)
    state = make_serving_state(
        cfg.num_layers, npp + 1, 1, cfg.num_kv_heads, args.page, cfg.head_dim
    )
    table_row = jnp.arange(1, npp + 1, dtype=jnp.int32)

    def serving_forward(p, ids_b, cfg_, spec_):
        x, _ = prefill_hidden(
            p, state.pages, ids_b[0], table_row, cfg_, spec_
        )
        return _lm_head_logits(x, p.lm_head, cfg_.vocab_size)[None]

    t0 = time.time()
    ppl_srv = perplexity(sp, cfg, spec, test, seqlen=args.seqlen,
                         forward=serving_forward, progress=True)
    print(f"served PPL in {time.time()-t0:.0f}s", flush=True)

    delta = ppl_srv - ppl_acc
    print(f"targetResult,corpus_accuracy_pipeline,{ppl_acc:.6f}", flush=True)
    print(f"targetResult,corpus_served_kernels,{ppl_srv:.6f}", flush=True)
    print(f"served-vs-accuracy byte-PPL delta: {delta:+.4f} "
          f"({100 * delta / ppl_acc:+.2f}%)", flush=True)


if __name__ == "__main__":
    main()
