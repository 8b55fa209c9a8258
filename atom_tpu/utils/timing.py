"""Kernel micro-benchmark timing that survives a high-latency dispatch path.

The tunneled TPU platform costs ~30 ms per dispatch round-trip, so wall-timing
individual calls measures the tunnel, not the kernel (and
``block_until_ready()`` on remote buffers returns immediately).  The NVBench
analog here (SURVEY.md §2.2 "NVBench drivers") runs the op N times INSIDE one
jitted program, chained through a numerically-inert carry so neither LICM nor
DCE can elide iterations, and fetches one scalar at the end.
"""
from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def bench_op(
    op: Callable[..., jnp.ndarray],
    args: Sequence,
    *,
    iters: int = 100,
    perturb_arg: int = 0,
    warmup: bool = True,
) -> float:
    """Seconds per op execution, dispatch-latency free.

    ``op(*args) -> array``; ``perturb_arg`` selects a float argument that gets
    a +carry*1e-30 perturbation to chain iterations (pick a scale/float input).
    The per-call dispatch round-trip (tens of ms on the tunneled platform) is
    eliminated by timing the SAME compiled program at two trip counts and
    taking the slope.
    """
    args = list(args)

    def chained(n, carry, a):
        def body(i, c):
            a2 = list(a)
            a2[perturb_arg] = _perturb(a2[perturb_arg], c)
            out = op(*a2)
            leaves = jax.tree_util.tree_leaves(out)
            acc = jnp.float32(0.0)
            for leaf in leaves:
                acc = acc + jnp.sum(leaf).astype(jnp.float32)
            return acc * 1e-30

        return jax.lax.fori_loop(0, n, body, carry)

    fn = jax.jit(chained)
    n_lo, n_hi = jnp.int32(1), jnp.int32(iters + 1)
    if warmup:
        float(fn(n_lo, jnp.float32(0.0), args))
        float(fn(n_hi, jnp.float32(0.0), args))

    def run(n):
        t0 = time.perf_counter()
        float(fn(n, jnp.float32(0.0), args))
        return time.perf_counter() - t0

    t_lo = min(run(n_lo) for _ in range(3))
    t_hi = min(run(n_hi) for _ in range(3))
    return max(t_hi - t_lo, 1e-9) / iters


def _perturb(x, carry):
    if isinstance(x, tuple) and hasattr(x, "_fields"):  # NamedTuple container
        # Perturb the first float leaf.
        vals = list(x)
        for i, v in enumerate(vals):
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
                vals[i] = v + carry.astype(v.dtype)
                return type(x)(*vals)
        return x
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x + carry.astype(x.dtype)
    return x


def dispatch_latency(n: int = 5) -> float:
    """Measured per-dispatch round-trip of the current backend (diagnostics)."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    float(jnp.sum(f(x)))
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
        float(jnp.sum(x))
    return (time.perf_counter() - t0) / n
