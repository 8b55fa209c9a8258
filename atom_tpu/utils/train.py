"""Minimal TPU pretraining loop for accuracy-fixture models.

The reference evaluates quantization on *pretrained* checkpoints; none can be
downloaded here, so the real-text accuracy artifact trains its own
OPT-125M-class byte-level model (``models.configs.BYTE_LM``) on the vendored
corpus and runs the ablation ladder on that.  Trained transformers develop
the activation-outlier channels Atom's reorder/keeper machinery targets —
random weights do not, which is why this exists.

TPU-idiomatic: one jitted update scans over a macro-chunk of steps (data for
the whole chunk is shipped as a single array — the tunnel pays ~30 ms per
dispatch, so per-step dispatch would dominate), layer bodies are
``jax.checkpoint``-rematerialized so the 2048-token backward fits HBM.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from atom_tpu.config import FP16_BASELINE
from atom_tpu.models import llama as M
from atom_tpu.models.configs import ModelConfig


def _forward_logits(params, ids, cfg: ModelConfig):
    """Remat-scanned forward -> fp32 logits [b, t, vocab] (train path).

    Mirrors ``models.llama.forward`` but wraps the layer body in
    ``jax.checkpoint`` so the backward pass recomputes attention instead of
    storing [b, h, t, t] probabilities for every layer.
    """
    b, t = ids.shape
    x = M.embed(params, ids)
    cos, sin, mask = M.layer_aux(params, cfg, t)

    @jax.checkpoint
    def body(carry, lp):
        y, _ = M.forward_layer(lp, carry, cos, sin, mask, cfg, FP16_BASELINE)
        return y, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return M.head(params, x, cfg)


def _loss(params, ids, cfg):
    """Next-byte cross entropy in nats/token; ids [b, t+1]."""
    logits = _forward_logits(params, ids[:, :-1], cfg)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, ids[:, 1:]
    ).mean()


def _is_none(x):
    return x is None


def split_trainable(params):
    """(float leaves, int leaves) — reorder-index buffers are not trained."""
    fl = jax.tree.map(
        lambda x: x if jnp.issubdtype(x.dtype, jnp.floating) else None, params
    )
    st = jax.tree.map(
        lambda x: None if jnp.issubdtype(x.dtype, jnp.floating) else x, params
    )
    return fl, st


def merge_trainable(fl, st):
    return jax.tree.map(
        lambda a, b: b if a is None else a, fl, st, is_leaf=_is_none
    )


def make_update_chunk(cfg: ModelConfig, tx, static_leaves):
    """jitted (float params, opt_state, data [k, b, t+1]) -> (params, opt_state, mean_loss)."""

    @jax.jit
    def update_chunk(fl, opt_state, data):
        def loss_fn(fl, ids):
            return _loss(merge_trainable(fl, static_leaves), ids, cfg)

        def step(carry, ids):
            fl, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(fl, ids)
            updates, opt_state = tx.update(grads, opt_state, fl)
            fl = optax.apply_updates(fl, updates)
            return (fl, opt_state), loss

        (fl, opt_state), losses = jax.lax.scan(step, (fl, opt_state), data)
        return fl, opt_state, losses.mean()

    return update_chunk


def sample_windows(
    rng: np.random.Generator, tokens: np.ndarray, k: int, b: int, t: int
) -> np.ndarray:
    """[k, b, t+1] int32 random windows of a flat token stream."""
    starts = rng.integers(0, len(tokens) - t - 1, size=(k, b))
    idx = starts[..., None] + np.arange(t + 1)[None, None, :]
    return tokens[idx].astype(np.int32)


def eval_loss(params, cfg: ModelConfig, tokens: np.ndarray, seqlen: int,
              batch: int = 8, max_windows: int = 32) -> float:
    """Mean next-byte NLL (nats) over non-overlapping eval windows."""
    n = min(len(tokens) // (seqlen + 1), max_windows)
    wins = tokens[: n * (seqlen + 1)].reshape(n, seqlen + 1).astype(np.int32)
    loss_fn = jax.jit(functools.partial(_loss, cfg=cfg))
    tot = 0.0
    for i in range(0, n, batch):
        chunk = jnp.asarray(wins[i : i + batch])
        tot += float(loss_fn(params, chunk)) * chunk.shape[0]
    return tot / n


def train(
    params,
    cfg: ModelConfig,
    tokens: np.ndarray,
    steps: int = 2400,
    batch: int = 8,
    seqlen: int = 2048,
    lr: float = 3e-4,
    warmup: int = 100,
    chunk: int = 50,
    seed: int = 0,
    log=print,
) -> Tuple[object, float]:
    """Train ``params`` on a flat token stream; returns (params, final loss)."""
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(steps, warmup + 1), end_value=lr * 0.1
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=0.01),
    )
    fl, st = split_trainable(params)
    opt_state = tx.init(fl)
    upd = make_update_chunk(cfg, tx, st)
    rng = np.random.default_rng(seed)
    done, loss = 0, float("nan")
    while done < steps:
        k = min(chunk, steps - done)
        data = jnp.asarray(sample_windows(rng, tokens, k, batch, seqlen))
        fl, opt_state, loss = upd(fl, opt_state, data)
        done += k
        log(f"  step {done}/{steps}  loss {float(loss):.4f} nats "
            f"({float(loss)/np.log(2):.3f} bits/byte)")
    return merge_trainable(fl, st), float(loss)
