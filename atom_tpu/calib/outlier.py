"""Activation saliency statistics and channel reorder indices.

The reference collects per-channel saliency for every linear's input/output with
forward hooks while streaming the model layer by layer (``model/outlier.py:9-106``),
then derives reorder indices (``model/outlier.py:210-252``):

  * inputs — ascending sort, so the most-salient ("outlier") channels land LAST,
    where the keeper block lives;
  * outputs — per-head (head_dim-wide) descending sort, used to pick per-head
    outliers for QKV outputs.

JAX has no hooks; our models expose explicit activation taps (every layer forward
can return the tensors that feed each linear — see ``atom_tpu.models``), and the
statistics here are plain jittable reducers folded over calibration batches.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class ActStats(NamedTuple):
    """Accumulated per-channel saliency for one tap point.

    For the 'hessian' metric, ``value[c]`` accumulates ``(2 / nsamples) * sum_t
    x[t, c]^2`` over calibration samples — the diagonal of ``2/n X^T X``
    (``model/outlier.py:18-28``).  For 'abs_mean' it holds the running max over
    samples of the per-sample mean |x| (``model/outlier.py:23-30``).
    """

    value: jnp.ndarray  # float32 [channels]


def hessian_diag_update(
    stats: jnp.ndarray | None, x: jnp.ndarray, nsamples: int
) -> jnp.ndarray:
    """Fold one calibration sample into the Hessian-diagonal saliency.

    ``x`` is any [..., channels] activation; summed over all leading axes.
    """
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    contrib = (2.0 / nsamples) * jnp.sum(x2 * x2, axis=0)
    return contrib if stats is None else stats + contrib


def abs_mean_update(
    stats: jnp.ndarray | None, x: jnp.ndarray, nsamples: int = 0
) -> jnp.ndarray:
    """Fold one sample into the abs-mean saliency (running max over samples)."""
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    contrib = jnp.mean(jnp.abs(x2), axis=0)
    return contrib if stats is None else jnp.maximum(stats, contrib)


def reorder_index_ascending(saliency: jnp.ndarray) -> jnp.ndarray:
    """Ascending argsort: outlier channels go last (``model/outlier.py:213-219``).

    The returned index is a gather permutation: ``x[..., idx]`` produces the
    reordered activation with keepers at the end.
    """
    assert saliency.ndim == 1
    return jnp.argsort(saliency)  # ascending: outliers last


def reorder_index_per_head(saliency: jnp.ndarray, head_dim: int = 128) -> jnp.ndarray:
    """Per-head descending argsort for QKV outputs (``model/outlier.py:221-233``).

    Each head's channels are sorted independently (descending — per-head outliers
    first), and offsets restore absolute positions.
    """
    assert saliency.ndim == 1 and saliency.shape[0] % head_dim == 0
    n_heads = saliency.shape[0] // head_dim
    per_head = saliency.reshape(n_heads, head_dim)
    idx = jnp.argsort(-per_head, axis=-1)  # descending within each head
    offsets = (jnp.arange(n_heads) * head_dim)[:, None]
    return (idx + offsets).reshape(-1)


def invert_permutation(idx: jnp.ndarray) -> jnp.ndarray:
    """Inverse permutation: if y = x[idx], then x = y[inv]."""
    inv = jnp.zeros_like(idx)
    return inv.at[idx].set(jnp.arange(idx.shape[0], dtype=idx.dtype))


# ---------------------------------------------------------------------------
# Saliency accumulator over named tap points
# ---------------------------------------------------------------------------


class SaliencyAccumulator:
    """Accumulates saliency for a dict of named activation taps.

    Host-side convenience wrapper (the per-tap reducers above are the jittable
    hot path).  Replaces the reference's forward-hook + dict machinery
    (``model/outlier.py:14-51``).
    """

    def __init__(self, metric: str = "hessian", nsamples: int = 1):
        assert metric in ("hessian", "abs_mean")
        self.metric = metric
        self.nsamples = nsamples
        self.stats: Dict[str, jnp.ndarray] = {}
        self._update = (
            hessian_diag_update if metric == "hessian" else abs_mean_update
        )

    def update(self, taps: Dict[str, jnp.ndarray]) -> None:
        for name, x in taps.items():
            self.stats[name] = self._update(
                self.stats.get(name), x, self.nsamples
            )

    def reorder_indices(self, head_dim: int = 128) -> Dict[str, jnp.ndarray]:
        """Derive reorder indices: '.input' taps ascending, '.output' taps
        per-head descending (``model/outlier.py:235-252``)."""
        out: Dict[str, jnp.ndarray] = {}
        for name, sal in self.stats.items():
            if name.endswith(".output") and sal.shape[0] % head_dim == 0:
                out[name] = reorder_index_per_head(sal, head_dim)
            elif name.endswith(".output"):
                # Outputs narrower than a head (e.g. a MoE router gate) have no
                # per-head structure; their index is never used for reordering.
                out[name] = reorder_index_ascending(sal)
            else:
                out[name] = reorder_index_ascending(sal)
        return out
