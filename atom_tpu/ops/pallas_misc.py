"""Small Pallas utility kernels.

``embed_gather``: token-embedding row fetch.  XLA's row gather from a
[V, D] table lowers to a ~750us serial path on TPU at batch 32, and the
one-hot-matmul idiom reads the ENTIRE table (262 MB for a 32k x 4096 bf16
vocab — ~320us of pure HBM).  This kernel block-fetches exactly the 8-row
groups containing the requested ids (~2 MB for batch 32) via a
scalar-prefetched index map.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(ids_ref, e_ref, o_ref):
    b = pl.program_id(0)
    r = ids_ref[b] % 8
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    rows = e_ref[0].astype(jnp.float32)  # [8, D]
    row = jnp.sum(jnp.where(sub == r, rows, 0.0), axis=0, keepdims=True)
    o_ref[0] = jnp.broadcast_to(row, o_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def embed_gather(
    embed: jnp.ndarray,  # [V, D] (V % 8 == 0)
    ids: jnp.ndarray,    # int32 [B]
    interpret: bool = False,
) -> jnp.ndarray:
    """rows ``embed[ids]`` -> [B, D] in embed's dtype."""
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    v, d = embed.shape
    b = ids.shape[0]
    assert v % 8 == 0
    e3 = embed.reshape(v // 8, 8, d)
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 8, d), lambda i, ids_: (ids_[i] // 8, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, d), lambda i, ids_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, d), embed.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(ids.astype(jnp.int32), e3)
    return out[:, 0, :]
