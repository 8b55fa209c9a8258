#!/usr/bin/env python
"""Train the BYTE_LM accuracy-fixture model on the vendored corpus (TPU).

Produces the pretrained checkpoint the real-text ablation ladder
(`scripts/run_atom_ablation.sh byte-lm --ckpt ...`) quantizes and evaluates —
the stand-in for the HF checkpoints the reference downloads
(`model/main.py:17-51`), which this environment cannot.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_corpus_model.py \
        --steps 2400 --out data/byte_lm_ckpt.npz
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--corpus", default="data/corpus")
    ap.add_argument("--out", default="data/byte_lm_ckpt.npz")
    args = ap.parse_args()

    from atom_tpu.calib.data import corpus_loaders
    from atom_tpu.models import BYTE_LM
    from atom_tpu.models import llama as M
    from atom_tpu.utils import bytetok
    from atom_tpu.utils.checkpoint import save_pytree
    from atom_tpu.utils.train import eval_loss, train

    cfg = BYTE_LM
    print(f"devices: {jax.devices()}")
    print(f"BYTE_LM: L={cfg.num_layers} d={cfg.hidden_size} "
          f"heads={cfg.num_heads}x{cfg.head_dim} vocab={cfg.vocab_size}")

    import os
    train_tokens = bytetok.encode_file(os.path.join(args.corpus, "train.txt"))
    eval_tokens = bytetok.encode_file(os.path.join(args.corpus, "eval.txt"))
    print(f"corpus: {len(train_tokens)/1e6:.1f}M train / "
          f"{len(eval_tokens)/1e3:.0f}K eval bytes")

    params = M.init_params(jax.random.PRNGKey(args.seed), cfg, jnp.float32)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"{n_params/1e6:.1f}M params (fp32 train)")

    t0 = time.time()
    params, final = train(
        params, cfg, train_tokens, steps=args.steps, batch=args.batch,
        seqlen=args.seqlen, lr=args.lr, chunk=args.chunk, seed=args.seed,
    )
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s "
          f"(final train loss {final:.4f})")

    ev = eval_loss(params, cfg, eval_tokens, args.seqlen)
    print(f"eval: {ev:.4f} nats/byte = {ev/np.log(2):.3f} bits/byte "
          f"(byte-PPL {np.exp(ev):.3f})")

    # store bf16-ROUNDED fp32 (the ladder evaluates from reduced-precision
    # weights, like HF fp16 checkpoints; npz has no bf16 dtype so the values
    # are rounded through bf16 and stored as fp32 carriers).
    # NOTE: data/byte_lm_ckpt.npz predates this rounding (it is plain fp32);
    # all committed ladder rows use that checkpoint consistently.
    params_bf16 = jax.tree_util.tree_map(
        lambda x: np.asarray(
            jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32)
        ) if np.asarray(x).dtype == np.float32 else np.asarray(x),
        jax.device_get(params),
    )
    save_pytree(args.out, params_bf16)
    print(f"saved checkpoint to {args.out}")


if __name__ == "__main__":
    main()
