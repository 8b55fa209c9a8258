"""Perplexity evaluation harness.

Equivalent of the reference's streamed PPL eval (``model/eval.py:14-95``): the
test stream is cut into non-overlapping ``seqlen`` windows; per-window NLL is the
mean causal cross-entropy; PPL = exp(mean over windows) — identical to the
reference's ``exp(sum(mean_ce * seqlen) / (n * seqlen))``.

Unlike the reference (which swaps layers between CPU and GPU to fit), memory is
managed by jit donation and, for big models, per-layer scanning already present
in the model forward; a 7B bf16 model fits a single v5e chip.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from atom_tpu.config import QuantSpec
from atom_tpu.models.configs import ModelConfig


def window_nll(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean causal cross-entropy of one window.

    ``logits``: [t, vocab] fp32 for tokens [0..t-1]; ``targets``: [t] token ids.
    Shifted internally: logits[:-1] predict targets[1:].
    """
    lp = jax.nn.log_softmax(logits[:-1].astype(jnp.float32), axis=-1)
    tgt = targets[1:]
    return -jnp.mean(jnp.take_along_axis(lp, tgt[:, None], axis=-1))


def perplexity(
    params,
    cfg: ModelConfig,
    spec: QuantSpec,
    tokens: np.ndarray,
    seqlen: int = 2048,
    forward: Optional[Callable] = None,
    progress: bool = False,
) -> float:
    """PPL of a flat token stream, non-overlapping ``seqlen`` windows."""
    if forward is None:
        from atom_tpu.calib.pipeline import _model_api

        forward = _model_api(cfg).forward
    tokens = np.asarray(tokens).reshape(-1)
    n_windows = len(tokens) // seqlen
    assert n_windows > 0, "token stream shorter than one window"

    nll_fn = jax.jit(
        lambda p, ids: window_nll(forward(p, ids[None], cfg, spec)[0], ids)
    )
    total = 0.0
    for i in range(n_windows):
        window = jnp.asarray(tokens[i * seqlen : (i + 1) * seqlen])
        total += float(nll_fn(params, window))
        if progress:
            print(f"  ppl window {i + 1}/{n_windows}", flush=True)
    return float(np.exp(total / n_windows))
