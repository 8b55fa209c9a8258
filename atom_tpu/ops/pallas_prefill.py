"""Pallas TPU kernel: causal flash-prefill attention over affine INT4 codes.

TPU-first counterpart of the reference's FlashInfer prefill kernel
(``SinglePrefillWithKVCacheKernel``, ``kernels/include/flashinfer/
prefill.cuh:79-460``) — the long-context path the XLA alternatives can't
serve well: the one-pass path materializes [HQ, Tq, Tk] f32 scores
(quadratic HBM), and the ``lax.scan`` path keeps everything in f32 einsums
(the MXU runs f32 at a fraction of its bf16 rate, and XLA materializes the
``jnp.repeat``-ed GQA key tensor).

Design (same conventions as ``pallas_decode``):

  * K is consumed CHANNEL-major ([Hkv, D, Tk], one transpose per layer
    outside the kernel) so the q.K^T score dot is a standard-orientation
    MXU dot; V stays slot-major ([Hkv, Tk, D]) for the standard p.V dot.
  * Score dots run in bf16: q arrives bf16 and the u4 codes are small
    integers, so every product is exact and the MXU accumulates in f32 —
    identical values to the oracle's f32 einsum.  The p.V dot stays f32
    (probabilities genuinely lose precision in bf16), matching
    ``serving/model.causal_code_attention``.
  * K is never dequantized: ``q . k = (q . codes) * scale + rowsum(q) *
    zero`` — affine correction as two lane-wise multiply-adds.  V's dequant
    folds into the probability vector.
  * TRIANGULAR grid: the (query-block, key-block) pairs below the causal
    diagonal are enumerated host-side FOR THE LARGEST runtime offset the
    compile serves and drive the BlockSpec index maps through scalar
    prefetch (the CUDA analog iterates ``chunk_start .. chunk_end``,
    ``prefill.cuh:210-250``).  At a smaller runtime offset (SP shards
    share one compile) the tail pairs of each run clamp their K/V index
    maps to the last visible block — Mosaic's revisiting pipeline skips
    the repeated DMA — and skip their compute under ``pl.when``; fully
    masked key blocks therefore cost neither bandwidth nor FLOPs at any
    offset.  Online softmax state lives in VMEM scratch across each
    key-block run; the output block is written on the run's last step.
  * GQA: grid axis 0 is the QUERY head; index maps divide by ``groups`` so
    sibling query heads re-read the same K/V blocks (Mosaic's revisiting
    pipeline keeps them in VMEM across consecutive steps of the same head).

Grid: (HQ, n_pairs), pairs innermost, ordered (qb asc, kb asc) per head.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _prefill_kernel(
    # scalar prefetch
    qb_ref,     # int32 [n_pairs] — query-block index per grid step
    kb_ref,     # int32 [n_pairs] — key-block index per grid step
    last_ref,   # int32 [n_pairs] — 1 on the final key block of a q run
    off_ref,    # int32 [1] — global position of query row 0
    # inputs
    q_ref,      # bf16 [1, tq_blk, D]
    kc_ref,     # int8 [1, D, tk_blk] — channel-major u4 codes
    kp_ref,     # f32 [1, 2, tk_blk] — (scale, zero) per key slot
    vc_ref,     # int8 [1, tk_blk, D] — slot-major u4 codes
    vp_ref,     # f32 [1, 2, tk_blk]
    # output
    o_ref,      # bf16 [1, tq_blk, D]
    # scratch
    acc_ref,    # f32 [tq_blk, D]
    m_ref,      # f32 [tq_blk, 128]
    l_ref,      # f32 [tq_blk, 128]
    *,
    tq_blk: int,
    tk_blk: int,
    sm_scale: float,
):
    i = pl.program_id(1)
    kb = kb_ref[i]

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Pairs are enumerated for offset_max (the largest runtime offset the
    # compile serves); at a SMALLER runtime offset the tail key blocks of a
    # run are fully masked.  Their math is an exact no-op (alpha=1, p=0), so
    # skip the compute — the index maps clamp their DMAs away too.
    visible = kb * tk_blk <= off_ref[0] + (qb_ref[i] + 1) * tq_blk - 1

    @pl.when(visible)
    def _process():
        q = q_ref[0]  # [tq_blk, D] bf16
        raw = jax.lax.dot_general(
            q, kc_ref[0].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tq_blk, tk_blk] — exact: u4 codes x bf16 q
        q_sum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
        k_scale = kp_ref[0, 0:1, :]  # [1, tk_blk]
        k_zero = kp_ref[0, 1:2, :]
        scores = (raw * k_scale + q_sum * k_zero) * sm_scale

        row = (
            off_ref[0] + qb_ref[i] * tq_blk
            + jax.lax.broadcasted_iota(jnp.int32, (tq_blk, 1), 0)
        )
        col = kb * tk_blk + jax.lax.broadcasted_iota(
            jnp.int32, (1, tk_blk), 1
        )
        scores = jnp.where(col <= row, scores, _NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # masked cols underflow to 0
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)

        pw = p * vp_ref[0, 0:1, :]  # fold v_scale into the probabilities
        pv = jax.lax.dot_general(
            pw, vc_ref[0].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tq_blk, D]
        z = jnp.sum(p * vp_ref[0, 1:2, :], axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + pv + z
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(last_ref[i] == 1)
    def _emit():
        o_ref[0] = (
            acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-20)
        ).astype(o_ref.dtype)


@functools.lru_cache(maxsize=64)
def _pairs(nq: int, nk: int, tq_blk: int, tk_blk: int, offset_max: int):
    """Causal (qb, kb) pair enumeration: for each query block, every key
    block whose first slot can be visible to the block's LAST row at the
    largest runtime offset (``offset_max``; 0 for single-chip prefill)."""
    qbs, kbs, last = [], [], []
    for qb in range(nq):
        top_row = offset_max + (qb + 1) * tq_blk - 1
        kmax = min(nk - 1, top_row // tk_blk)
        for kb in range(kmax + 1):
            qbs.append(qb)
            kbs.append(kb)
            last.append(1 if kb == kmax else 0)
    return (
        np.asarray(qbs, np.int32),
        np.asarray(kbs, np.int32),
        np.asarray(last, np.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "groups", "sm_scale", "offset_max", "tq_blk", "tk_blk", "interpret"
    ),
)
def flash_code_attention(
    q: jnp.ndarray,        # [Tq, HQ, D] bf16 (RoPE'd)
    k_codes: jnp.ndarray,  # int8 [Tk, Hkv, D] — u4 values
    k_params: jnp.ndarray,  # f32 [Tk, Hkv, 2] — (scale, zero)
    v_codes: jnp.ndarray,
    v_params: jnp.ndarray,
    groups: int,
    sm_scale: float,
    row_offset: jnp.ndarray = None,  # int32 scalar; queries at offset+arange
    offset_max: int = 0,   # static upper bound on row_offset (grid sizing)
    tq_blk: int = 512,
    tk_blk: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal affine-code attention -> [Tq, HQ*D] bf16.

    Same mathematics as ``serving.model.causal_code_attention`` (the jnp
    oracle); numerics agree to quantization-flip tolerance (bf16-exact score
    dots, f32 softmax and p.V chain, different f32 contraction order).
    """
    from atom_tpu.ops.runtime import interpret_default

    interpret = interpret_default(interpret)
    tq, hq, dh = q.shape
    tk, hkv, _ = k_codes.shape
    assert hq == hkv * groups
    tq_blk = min(tq_blk, max(128, 1 << (tq - 1).bit_length()))
    tk_blk = min(tk_blk, max(128, 1 << (tk - 1).bit_length()))
    if row_offset is None:
        row_offset = jnp.int32(0)

    pad_q = -tq % tq_blk
    pad_k = -tk % tk_blk
    # channel-major K, slot-major V, params lane-major — one relayout per
    # layer, amortized over the HQ x pairs grid
    q_t = jnp.pad(q, ((0, pad_q), (0, 0), (0, 0))).swapaxes(0, 1)
    kc_t = jnp.pad(k_codes, ((0, pad_k), (0, 0), (0, 0))).transpose(1, 2, 0)
    kp_t = jnp.pad(k_params, ((0, pad_k), (0, 0), (0, 0))).transpose(1, 2, 0)
    vc_t = jnp.pad(v_codes, ((0, pad_k), (0, 0), (0, 0))).swapaxes(0, 1)
    vp_t = jnp.pad(v_params, ((0, pad_k), (0, 0), (0, 0))).transpose(1, 2, 0)
    # padded key positions are >= tk > every real row position, so the causal
    # mask silently discards them; padded query rows are sliced off below.

    nq = (tq + pad_q) // tq_blk
    nk = (tk + pad_k) // tk_blk
    qbs, kbs, last = _pairs(nq, nk, tq_blk, tk_blk, offset_max)

    kernel = functools.partial(
        _prefill_kernel, tq_blk=tq_blk, tk_blk=tk_blk, sm_scale=sm_scale,
    )
    kv_h = lambda h: h // groups  # noqa: E731

    def kb_rt(i, qb, kb, off):
        # Clamp to the last key block VISIBLE at the runtime offset: pairs
        # past it (enumerated for offset_max) re-request the same block, so
        # Mosaic's revisiting pipeline skips their DMAs, and the kernel
        # skips their compute (see ``visible`` in _prefill_kernel).
        return jnp.minimum(
            kb[i], (off[0] + (qb[i] + 1) * tq_blk - 1) // tk_blk
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(hq, len(qbs)),
            in_specs=[
                pl.BlockSpec(
                    (1, tq_blk, dh),
                    lambda h, i, qb, kb, la, off: (h, qb[i], 0),
                ),
                pl.BlockSpec(
                    (1, dh, tk_blk),
                    lambda h, i, qb, kb, la, off: (
                        kv_h(h), 0, kb_rt(i, qb, kb, off)),
                ),
                pl.BlockSpec(
                    (1, 2, tk_blk),
                    lambda h, i, qb, kb, la, off: (
                        kv_h(h), 0, kb_rt(i, qb, kb, off)),
                ),
                pl.BlockSpec(
                    (1, tk_blk, dh),
                    lambda h, i, qb, kb, la, off: (
                        kv_h(h), kb_rt(i, qb, kb, off), 0),
                ),
                pl.BlockSpec(
                    (1, 2, tk_blk),
                    lambda h, i, qb, kb, la, off: (
                        kv_h(h), 0, kb_rt(i, qb, kb, off)),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, tq_blk, dh),
                lambda h, i, qb, kb, la, off: (h, qb[i], 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((tq_blk, dh), jnp.float32),
                pltpu.VMEM((tq_blk, 128), jnp.float32),
                pltpu.VMEM((tq_blk, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((hq, tq + pad_q, dh), jnp.bfloat16),
        interpret=interpret,
    )(
        jnp.asarray(qbs), jnp.asarray(kbs), jnp.asarray(last),
        jnp.asarray([row_offset], jnp.int32).reshape(1),
        q_t.astype(jnp.bfloat16), kc_t, kp_t.astype(jnp.float32),
        vc_t, vp_t.astype(jnp.float32),
    )
    return out.swapaxes(0, 1)[:tq].reshape(tq, hq * dh)
