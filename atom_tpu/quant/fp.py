"""Floating-point mini-format fake casts: FP8 (E5M2 / E4M3) and FP4.

The reference implements FP8 fake casts with int16 bit surgery on fp16 tensors
(``model/quant.py:9-64``) and FP4 through bitsandbytes' codebook kernels
(``model/quant.py:134-137``).  On TPU we do it the native way:

  * FP8 — JAX ships hardware-backed ``float8_e5m2`` / ``float8_e4m3fn`` dtypes;
    a round-trip cast is exactly the round-to-nearest-even fake quantization the
    reference hand-rolls.  (E4M3 note: we use the ``fn`` variant with max 448; the
    reference clamps at ±480.  The difference only affects values in (448, 480],
    which never survive the preceding absmax scaling in practice.)
  * FP4 — the bitsandbytes FP4 codebook is 16 values; a vectorized
    nearest-code lookup on the VPU replaces the CUDA binary-search kernel.
"""
from __future__ import annotations

import jax.numpy as jnp

# The bitsandbytes FP4 code values, normalized to [-1, 1] (sign x magnitude).
# Magnitudes are {0, 0.0625, 2, 3, 4, 6, 8, 12} / 12 — an E2M1 layout where the
# per-block absmax maps to code 12.  See also the MX spec referenced by the
# reference's GPTQ (``model/gptq.py:81-84``: "[0, 0.0625, 8.0, 12.0, 4.0, 6.0,
# 2.0, 3.0]", maxq = 2 * 12.0).
_FP4_MAGNITUDES = jnp.array(
    [0.0, 0.0625, 2.0, 3.0, 4.0, 6.0, 8.0, 12.0], dtype=jnp.float32
) / 12.0

# Midpoints between consecutive magnitudes: used for nearest-value rounding via
# searchsorted-style comparison (7 thresholds for 8 magnitudes).
_FP4_MIDPOINTS = (_FP4_MAGNITUDES[1:] + _FP4_MAGNITUDES[:-1]) / 2.0


def fake_cast_e5m2(x: jnp.ndarray) -> jnp.ndarray:
    """Round-trip through FP8 E5M2 (1-5-2), the reference's keeper_precision=1."""
    return x.astype(jnp.float8_e5m2).astype(x.dtype)


def fake_cast_e4m3(x: jnp.ndarray) -> jnp.ndarray:
    """Round-trip through FP8 E4M3 (1-4-3), the reference's keeper_precision=2."""
    return x.astype(jnp.float8_e4m3fn).astype(x.dtype)


def fp4_round_normalized(v: jnp.ndarray) -> jnp.ndarray:
    """Map values in [-1, 1] to the nearest FP4 code value (also in [-1, 1]).

    Vectorized nearest-neighbour on the 8 magnitude codes + sign, equivalent to
    bitsandbytes' per-element binary search.
    """
    mag = jnp.abs(v).astype(jnp.float32)
    # index = number of midpoints below mag  (mag > 1 clamps to the last code).
    idx = jnp.sum(mag[..., None] > _FP4_MIDPOINTS, axis=-1)
    code = _FP4_MAGNITUDES[idx]
    return jnp.sign(v) * code


def fake_quantize_fp4(w: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """FP4 fake quantization with per-block absmax scaling along ``axis``.

    Equivalent to ``quantize_fp4`` -> ``dequantize_fp4`` with blocksize equal to the
    axis length (``model/quant.py:136-137``): normalize each block to [-1, 1] by its
    absmax, round to the FP4 codebook, rescale.
    """
    orig_dtype = w.dtype
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    absmax = jnp.maximum(absmax, 1e-12)
    return (fp4_round_normalized(w32 / absmax) * absmax).astype(orig_dtype)
