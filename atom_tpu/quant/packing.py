"""INT4 <-> INT8 carrier packing for storage and Pallas kernels.

TPU has no native 4-bit storage dtype usable for our layouts, so INT4 codes travel
packed two-per-byte in int8 carriers (the reference packs 8-per-u32 for CUDA's
``mma.sync.s4``; the 2-per-i8 layout is the TPU equivalent that unpacks with two
VPU ops into the int8 operands the MXU consumes natively).

Layout: element ``2*i`` occupies the LOW nibble of byte ``i``, element ``2*i + 1``
the HIGH nibble.  Signed values are stored as two's-complement nibbles.

HBM traffic — the actual source of Atom's decode speedup — stays 4-bit/element.
"""
from __future__ import annotations

import jax.numpy as jnp


def pack_int4(codes: jnp.ndarray) -> jnp.ndarray:
    """Pack signed int4 codes (int8 array, values in [-8, 7]) along the last axis.

    [..., N] int8 -> [..., N // 2] int8, two nibbles per byte.
    """
    assert codes.shape[-1] % 2 == 0, "pack_int4 needs an even last dim"
    u = codes.astype(jnp.uint8) & 0x0F  # two's complement nibble
    lo = u[..., 0::2]
    hi = u[..., 1::2]
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`: [..., N//2] int8 -> [..., N] int8 in [-8, 7].

    Sign extension via the shift trick: place the nibble in the high bits of an
    int8 and arithmetic-shift back down — two VPU ops per nibble, no table.
    """
    b = packed.astype(jnp.int8)
    lo = (b << 4) >> 4  # arithmetic shift sign-extends the low nibble
    hi = b >> 4
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(packed.shape[:-1] + (packed.shape[-1] * 2,))


def pack_uint4(codes: jnp.ndarray) -> jnp.ndarray:
    """Pack unsigned int4 codes (values in [0, 15]) along the last axis."""
    assert codes.shape[-1] % 2 == 0, "pack_uint4 needs an even last dim"
    u = codes.astype(jnp.uint8) & 0x0F
    lo = u[..., 0::2]
    hi = u[..., 1::2]
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_uint4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_uint4`: values in [0, 15], dtype int8."""
    b = packed.astype(jnp.uint8)
    lo = (b & 0x0F).astype(jnp.int8)
    hi = (b >> 4).astype(jnp.int8)
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(packed.shape[:-1] + (packed.shape[-1] * 2,))
