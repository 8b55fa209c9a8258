"""Shared numerics pins for the bf16 dtype contract.

XLA's excess-precision mode may elide a producer's f32->bf16->f32 round-trip
inside one program, handing downstream consumers (norm statistics, dynamic
activation quantizers) UNROUNDED values that a real kernel boundary would
have rounded — boundary-sitting INT4 codes then flip between the fused and
unfused paths (see ``ops/formats.quantize_activation_packed``).  Round 4
pinned those roundings with ``lax.reduce_precision`` on every path; this
module centralizes the pins so

* the XLA chains (``models/nn.rmsnorm``, ``ops/formats``), the hoisted
  serving statistic (``serving/model._rms_rstd``) and the in-kernel rstd
  FALLBACKS (``ops/pallas_mlp.fused_mlp_packed``,
  ``ops/pallas_gemm_packed.packed_w4_gemm_qkv_ring_fused``) all compute the
  same statistic bitwise (ADVICE r4: the fallbacks previously skipped the
  pin), and
* ``ATOM_TPU_NO_RP=1`` disables every XLA-side pin at trace time for perf
  attribution A/Bs (the round-4 bench regression suspect) — numerics-parity
  tests must NOT set it.

In-kernel roundings (``pallas_gemm_packed._rp``) are integer bit math and
stay unconditional: they define the fused kernels' numerics.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def rp_enabled() -> bool:
    return not os.environ.get("ATOM_TPU_NO_RP")


def rp_bf16(x32: jnp.ndarray) -> jnp.ndarray:
    """Pin a bf16 rounding on an f32 carrier (identity if already rounded).

    ``lax.reduce_precision`` is not elidable, unlike an astype round-trip.
    """
    if not rp_enabled():
        return x32
    return jax.lax.reduce_precision(x32, 8, 7)


def rms_rstd(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm reciprocal std with the bf16 input pin — the ONE statistic
    shared (bitwise) by ``models/nn.rmsnorm``, the fused kernels' hoisted
    ``rstd`` argument, and their in-kernel fallbacks."""
    x32 = x.astype(jnp.float32)
    if x.dtype == jnp.bfloat16:
        x32 = rp_bf16(x32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return jax.lax.rsqrt(var + eps)
