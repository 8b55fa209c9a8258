"""GPTQ weight calibration in JAX (blocked error-propagating quantization).

Functional re-implementation of the reference's GPTQ engine (``model/gptq.py``),
which is itself derived from IST-DASLab/gptq.  Semantics preserved:

  * Hessian accumulation with running renormalization (``gptq.py:219-241``);
  * dead-column handling + percdamp damping (``gptq.py:260-269``);
  * the inverse-Cholesky trick: ``Hinv_U = chol_upper(inv(H))`` (``gptq.py:271-274``);
  * per-column round / error-propagate inside a block, rank-``B`` update of the
    trailing columns after each block (``gptq.py:276-307``);
  * per-``channel_group`` scale search with clip ratio (``Quantizer_GPTQ.find_params``,
    ``gptq.py:100-145``) recomputed at every group boundary from the
    error-compensated weights;
  * the last ``keeper`` columns are EXCLUDED from the GPTQ loop but still receive
    trailing error compensation, then are quantized at keeper precision at the end
    (``gptq.py:276,307,313-324``).

TPU-first design (SURVEY.md §7 "hard parts" #1): the sequential column loop is a
``lax.fori_loop`` over a static-width block held in registers/VMEM, with the
column-``i`` rank-1 update expressed as a masked outer product so the whole loop
jits to one fused program; blocks advance under ``lax.scan``.  The block width is
tied to the quantization group size so scale recomputation lands exactly on block
boundaries (no data-dependent control flow inside the loop).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from atom_tpu.config import KeeperPrecision, QuantSpec, QuantType
from atom_tpu.quant.core import quantize_keeper
from atom_tpu.quant.fp import fp4_round_normalized

_FP4_MAXQ = 24.0  # 2 * 12.0, see gptq.py:84


class GPTQState(NamedTuple):
    """Running Hessian estimate for one linear layer."""

    hessian: jnp.ndarray  # float32 [in, in]
    nsamples: jnp.ndarray  # int32 scalar


def gptq_init(in_features: int) -> GPTQState:
    return GPTQState(
        hessian=jnp.zeros((in_features, in_features), jnp.float32),
        nsamples=jnp.zeros((), jnp.int32),
    )


@jax.jit
def gptq_add_batch(state: GPTQState, x: jnp.ndarray) -> GPTQState:
    """Fold one calibration batch of layer inputs into the Hessian.

    ``x``: [..., in_features].  Matches ``GPTQ.add_batch`` (gptq.py:219-241): with
    batch weight t = number of leading-axis samples, H <- H * n/(n+t) then
    H += (2/(n+t)) X^T X summed over tokens.
    """
    t = 1 if x.ndim <= 2 else int(x.shape[0])
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    n_new = state.nsamples + t
    ratio = state.nsamples.astype(jnp.float32) / n_new.astype(jnp.float32)
    h = state.hessian * ratio + (2.0 / n_new.astype(jnp.float32)) * (x2.T @ x2)
    return GPTQState(hessian=h, nsamples=n_new)


# ---------------------------------------------------------------------------
# Scale search (Quantizer_GPTQ.find_params, weight path)
# ---------------------------------------------------------------------------


def _find_params(
    slab: jnp.ndarray,
    bits: int,
    sym: bool,
    channel_group: int,
    clip_ratio: float,
    quant_type: QuantType,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(channel-group) scale/zero over a [rows, g_cols] slab.

    Returns ``scale, zero`` with shape [rows // channel_group, 1].
    """
    rows = slab.shape[0]
    x = slab.reshape(rows // channel_group, -1)
    xmin = jnp.minimum(jnp.min(x, axis=1), 0.0)
    xmax = jnp.maximum(jnp.max(x, axis=1), 0.0)
    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)

    maxq = _FP4_MAXQ if quant_type == QuantType.FP else float(2**bits - 1)
    scale = (xmax - xmin) * clip_ratio / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)
    return scale[:, None], zero[:, None]


def _quantize_column(
    w: jnp.ndarray,
    scale: jnp.ndarray,
    zero: jnp.ndarray,
    bits: int,
    channel_group: int,
    quant_type: QuantType,
) -> jnp.ndarray:
    """Round one weight column [rows] on the current scale grid (gptq.py:27-60)."""
    rows = w.shape[0]
    x = w.reshape(rows // channel_group, channel_group)
    if quant_type == QuantType.FP:
        v = jnp.clip(x / scale, -_FP4_MAXQ / 2, _FP4_MAXQ / 2)
        q = fp4_round_normalized(v / (_FP4_MAXQ / 2)) * (_FP4_MAXQ / 2) * scale
    else:
        maxq = float(2**bits - 1)
        q = jnp.clip(jnp.round(x / scale) + zero, 0.0, maxq)
        q = scale * (q - zero)
    return q.reshape(rows)


# ---------------------------------------------------------------------------
# The blocked quantization loop
# ---------------------------------------------------------------------------


def _process_block(
    w_full: jnp.ndarray,  # [rows, cols] current error-compensated weights
    hinv: jnp.ndarray,  # [cols, cols] upper-Cholesky of H^-1
    i1: jnp.ndarray,  # dynamic block start
    block: int,  # static block width (== group size when grouped)
    find_scale_at_start: bool,
    scale0: jnp.ndarray,
    zero0: jnp.ndarray,
    *,
    bits: int,
    sym: bool,
    channel_group: int,
    clip_ratio: float,
    quant_type: QuantType,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize one column block in place and propagate errors right.

    Returns ``(w_full, scale)``: the updated full weight matrix —
    W[:, i1:i1+block] holds the quantized values, trailing columns the
    compensated ones — and the [rows // channel_group, 1] scale the block was
    quantized on (needed to recover the integer codes exactly for the packed
    serving format; see :func:`ops.formats.pack_gptq_output`).
    """
    rows, cols = w_full.shape
    w1 = jax.lax.dynamic_slice(w_full, (0, i1), (rows, block))
    hinv1 = jax.lax.dynamic_slice(hinv, (i1, i1), (block, block))

    if find_scale_at_start:
        scale, zero = _find_params(
            w1, bits, sym, channel_group, clip_ratio, quant_type
        )
    else:
        scale, zero = scale0, zero0

    col_ids = jnp.arange(block)

    def body(i, carry):
        w1, err = carry
        w = jax.lax.dynamic_slice(w1, (0, i), (rows, 1))[:, 0]
        d = jax.lax.dynamic_slice(hinv1, (i, i), (1, 1))[0, 0]
        q = _quantize_column(w, scale, zero, bits, channel_group, quant_type)
        e = (w - q) / d
        # Masked rank-1 update over columns >= i.  Column i itself becomes
        # w - e*d = q, so the quantized value lands in place for free.
        hrow = jax.lax.dynamic_slice(hinv1, (i, 0), (1, block))[0]
        hrow = jnp.where(col_ids >= i, hrow, 0.0)
        w1 = w1 - e[:, None] * hrow[None, :]
        err = jax.lax.dynamic_update_slice(err, e[:, None], (0, i))
        return w1, err

    err0 = jnp.zeros((rows, block), w_full.dtype)
    w1q, err = jax.lax.fori_loop(0, block, body, (w1, err0))

    # Write the quantized block back, then the trailing rank-`block` update:
    # W[:, i1+block:] -= Err @ Hinv[i1:i1+block, i1+block:]   (gptq.py:307)
    w_full = jax.lax.dynamic_update_slice(w_full, w1q, (0, i1))
    hrows = jax.lax.dynamic_slice(hinv, (i1, 0), (block, cols))
    tail_mask = (jnp.arange(cols)[None, :] >= (i1 + block)).astype(w_full.dtype)
    w_full = w_full - err @ (hrows * tail_mask)
    return w_full, scale


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits",
        "sym",
        "group_size",
        "channel_group",
        "keeper",
        "keeper_precision",
        "quant_type",
        "percdamp",
        "clip_ratio",
        "return_scales",
    ),
)
def gptq_quantize_weight(
    w: jnp.ndarray,
    hessian: jnp.ndarray,
    *,
    bits: int = 4,
    sym: bool = True,
    group_size: int = 128,
    channel_group: int = 2,
    keeper: int = 128,
    keeper_precision: KeeperPrecision = KeeperPrecision.INT8,
    quant_type: QuantType = QuantType.INT,
    percdamp: float = 0.01,
    clip_ratio: float = 1.0,
    return_scales: bool = False,
):
    """GPTQ-quantize a [out, in] weight given its input Hessian.

    Returns the fake-quantized weight (same dtype/shape), with the last ``keeper``
    input channels error-compensated and quantized at keeper precision.

    With ``return_scales=True`` also returns the per-group scales the blocks
    were quantized on, [n_groups, out // channel_group] f32 over the non-keeper
    columns.  GPTQ derives each group's scale from the ERROR-COMPENSATED
    weights at the moment the block is reached (gptq.py:281-284), so the grid
    cannot be recovered from the fake-quantized output alone — exporting it is
    the only exact path into the packed serving format
    (:func:`atom_tpu.ops.formats.pack_gptq_output`).
    """
    orig_dtype = w.dtype
    rows, cols = w.shape
    n_nonout = cols - keeper
    assert n_nonout > 0

    w32 = w.astype(jnp.float32)
    h = hessian.astype(jnp.float32)

    # Dead columns: unit diagonal, zero weights (gptq.py:260-262).
    dead = jnp.diag(h) == 0
    h = h + jnp.diag(jnp.where(dead, 1.0, 0.0))
    w32 = jnp.where(dead[None, :], 0.0, w32)

    # Damping (gptq.py:267-269).
    damp = percdamp * jnp.mean(jnp.diag(h))
    h = h + damp * jnp.eye(cols, dtype=h.dtype)

    # Hinv upper Cholesky: U with inv(H) = U^T U (gptq.py:271-274).
    chol = jnp.linalg.cholesky(h)
    hinv_full = jax.scipy.linalg.cho_solve((chol, True), jnp.eye(cols, dtype=h.dtype))
    # Symmetrize against fp32 solve noise before the second factorization.
    hinv_full = (hinv_full + hinv_full.T) / 2
    hinv = jnp.linalg.cholesky(hinv_full).T  # upper: inv(H) = hinv^T hinv? (see note)
    # Note: for lower L with A = L L^T, the upper factor with A = U^T U is U = L^T.

    grouped = group_size > 0
    if grouped:
        block = min(group_size, n_nonout)
    else:
        block = min(128, n_nonout)

    if not grouped:
        scale0, zero0 = _find_params(
            w32[:, :n_nonout], bits, sym, channel_group, clip_ratio, quant_type
        )
    else:
        cg_rows = rows // channel_group
        scale0 = jnp.zeros((cg_rows, 1), jnp.float32)
        zero0 = jnp.zeros((cg_rows, 1), jnp.float32)

    process = functools.partial(
        _process_block,
        block=block,
        find_scale_at_start=grouped,
        scale0=scale0,
        zero0=zero0,
        bits=bits,
        sym=sym,
        channel_group=channel_group,
        clip_ratio=clip_ratio,
        quant_type=quant_type,
    )

    n_full_blocks = n_nonout // block
    remainder = n_nonout - n_full_blocks * block

    def scan_body(w_acc, blk_idx):
        w_acc, scale = process(w_acc, hinv, blk_idx * block)
        return w_acc, scale[:, 0]

    w32, block_scales = jax.lax.scan(
        scan_body, w32, jnp.arange(n_full_blocks, dtype=jnp.int32)
    )
    if remainder:
        process_rem = functools.partial(
            _process_block,
            block=remainder,
            find_scale_at_start=grouped,
            scale0=scale0,
            zero0=zero0,
            bits=bits,
            sym=sym,
            channel_group=channel_group,
            clip_ratio=clip_ratio,
            quant_type=quant_type,
        )
        w32, rem_scale = process_rem(
            w32, hinv, jnp.asarray(n_full_blocks * block, jnp.int32)
        )
        block_scales = jnp.concatenate(
            [block_scales, rem_scale[:, 0][None]], axis=0
        )

    # Keeper columns: error-compensated above, now quantized at keeper precision
    # (gptq.py:313-324).
    if keeper > 0:
        keep = quantize_keeper(w32[:, n_nonout:], keeper_precision)
        w32 = w32.at[:, n_nonout:].set(keep)

    if return_scales:
        return w32.astype(orig_dtype), block_scales
    return w32.astype(orig_dtype)


def gptq_quantize_weight_spec(
    w: jnp.ndarray,
    hessian: jnp.ndarray,
    spec: QuantSpec,
    return_scales: bool = False,
):
    """Convenience wrapper taking a :class:`QuantSpec`."""
    return gptq_quantize_weight(
        w,
        hessian,
        bits=spec.wbits,
        sym=spec.w_sym,
        group_size=spec.weight_group_size,
        channel_group=spec.weight_channel_group,
        keeper=spec.keeper,
        keeper_precision=spec.keeper_precision,
        quant_type=spec.quant_type,
        percdamp=spec.percdamp,
        clip_ratio=spec.w_clip_ratio,
        return_scales=return_scales,
    )
