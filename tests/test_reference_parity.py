"""Differential parity vs the reference's OWN torch quantization code.

The only accuracy-parity evidence obtainable in this environment (no egress,
no real checkpoints): import the reference's pure-Python implementations
(``/root/reference/model/{quant,gptq,outlier}.py`` — treated strictly as data)
and assert that the JAX re-implementations produce the same numbers on shared
random inputs across the flag matrix.

Covered:
  * ``quantize_tensor``              == ``quant.core.fake_quantize_tensor``
    over bits x sym x group x clip x exponential (int paths; the fp4/fp8
    paths need bitsandbytes/CUDA, which this environment lacks).
  * ``quantize_tensor_channel_group`` == ``quant.core.quantize_weight_grouped``
    over channel_group x sym x clip.
  * ``GPTQ.add_batch``               == ``calib.gptq.gptq_add_batch``.
  * ``GPTQ.fasterquant``             == ``calib.gptq.gptq_quantize_weight``
    (grouped + per-channel, channel_group 1/2, asym + sym, keeper INT8).
  * reorder index construction       == ``calib.outlier`` sorts
    (ascending input / per-head descending output, ``outlier.py:210-252``).
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/model"


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference modules with their CUDA-only deps stubbed out.

    ``bitsandbytes`` is not installed (fp4 paths — untested here) and torch
    has no CUDA (``torch.cuda.synchronize`` in ``fasterquant`` is a no-op'd).
    """
    import importlib.machinery

    bnb = types.ModuleType("bitsandbytes")
    bnb_f = types.ModuleType("bitsandbytes.functional")
    bnb.__spec__ = importlib.machinery.ModuleSpec("bitsandbytes", None)
    bnb_f.__spec__ = importlib.machinery.ModuleSpec(
        "bitsandbytes.functional", None
    )

    def _unavailable(*a, **k):  # pragma: no cover
        raise NotImplementedError("bitsandbytes fp4 unavailable in this env")

    bnb_f.quantize_fp4 = _unavailable
    bnb_f.dequantize_fp4 = _unavailable
    bnb.functional = bnb_f
    saved = {}
    for name, mod in (("bitsandbytes", bnb), ("bitsandbytes.functional", bnb_f)):
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    sys.path.insert(0, REF)
    sync = torch.cuda.synchronize
    torch.cuda.synchronize = lambda *a, **k: None
    try:
        import gptq as ref_gptq  # noqa: F401
        import quant as ref_quant  # noqa: F401

        yield ref_quant, ref_gptq
    finally:
        torch.cuda.synchronize = sync
        sys.path.remove(REF)
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from atom_tpu.calib.gptq import (  # noqa: E402
    gptq_add_batch,
    gptq_init,
    gptq_quantize_weight,
)
from atom_tpu.calib.outlier import (  # noqa: E402
    reorder_index_ascending,
    reorder_index_per_head,
)
from atom_tpu.config import KeeperPrecision  # noqa: E402
from atom_tpu.quant.core import (  # noqa: E402
    fake_quantize_tensor,
    quantize_weight_grouped,
)


def _rand(shape, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    return (rng.standard_normal(shape) * 2.0).astype(np.float32)


@pytest.mark.parametrize("bits", [3, 4, 8])
@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("group", [0, 128])
@pytest.mark.parametrize("clip", [1.0, 0.9])
def test_quantize_tensor_matches_reference(ref_modules, bits, sym, group, clip):
    ref_quant, _ = ref_modules
    w = _rand((16, 256), seed=bits * 100 + sym * 10 + group + int(clip * 7))
    ref = ref_quant.quantize_tensor(
        torch.from_numpy(w.copy()), n_bits=bits, group_size=group, tiling=0,
        sym=sym, clip_ratio=clip, exponential=False, quant_type="int",
    ).numpy()
    ours = np.asarray(fake_quantize_tensor(
        jnp.asarray(w), bits=bits, group_size=group, sym=sym, clip_ratio=clip
    ))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("sym", [True, False])
def test_quantize_tensor_exponential_matches_reference(ref_modules, sym):
    ref_quant, _ = ref_modules
    w = _rand((8, 256), seed=41 + sym)
    ref = ref_quant.quantize_tensor(
        torch.from_numpy(w.copy()), n_bits=4, group_size=128, tiling=0,
        sym=sym, clip_ratio=1.0, exponential=True, quant_type="int",
    ).numpy()
    ours = np.asarray(fake_quantize_tensor(
        jnp.asarray(w), bits=4, group_size=128, sym=sym, exponential=True
    ))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


# channel_group == 1 is excluded: the reference wrapper then passes a
# non-contiguous column slice into quantize_tensor, which asserts (its own
# pipelines only use cg > 1 or the group_size == 0 path there).  cg == 1
# semantics are covered by test_quantize_tensor_matches_reference (the
# wrapper degenerates to plain grouped quantization).
@pytest.mark.parametrize("channel_group", [2, 4])
@pytest.mark.parametrize("sym", [True, False])
def test_channel_group_matches_reference(ref_modules, channel_group, sym):
    ref_quant, _ = ref_modules
    w = _rand((32, 512), seed=7 * channel_group + sym)
    ref = ref_quant.quantize_tensor_channel_group(
        torch.from_numpy(w.copy()), n_bits=4, group_size=128, tiling=0,
        sym=sym, channel_group=channel_group, clip_ratio=0.9,
        exponential=False, quant_type="int",
    ).numpy()
    ours = np.asarray(quantize_weight_grouped(
        jnp.asarray(w), bits=4, group_size=128, sym=sym,
        channel_group=channel_group, clip_ratio=0.9,
    ))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_hessian_accumulation_matches_reference(ref_modules):
    _, ref_gptq = ref_modules
    d_in, d_out = 64, 32
    layer = torch.nn.Linear(d_in, d_out, bias=False)
    eng = ref_gptq.GPTQ(layer, n_out=0)
    state = gptq_init(d_in)
    for s in range(3):
        x = _rand((2, 5, d_in), seed=100 + s)  # [batch, tokens, d]
        eng.add_batch(torch.from_numpy(x.copy()), None)
        state = gptq_add_batch(state, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(state.hessian), eng.H.numpy(), rtol=1e-4, atol=1e-4
    )
    assert int(state.nsamples) == eng.nsamples


def _ref_fasterquant(ref_gptq, w, xs, *, bits, sym, channel_group, clip,
                     groupsize, keeper, keeper_precision):
    d_out, d_in = w.shape
    layer = torch.nn.Linear(d_in, d_out, bias=False)
    layer.weight.data = torch.from_numpy(w.copy())
    eng = ref_gptq.GPTQ(layer, n_out=keeper, keeper_precision=keeper_precision)
    eng.quantizer = ref_gptq.Quantizer_GPTQ()
    eng.quantizer.configure(
        bits, perchannel=True, sym=sym, mse=False,
        channel_group=channel_group, clip_ratio=clip, quant_type="int",
    )
    for x in xs:
        eng.add_batch(torch.from_numpy(x.copy()), None)
    h = eng.H.numpy().copy()  # fasterquant deletes self.H
    eng.fasterquant(percdamp=0.01, groupsize=groupsize)
    return layer.weight.data.numpy(), h


@pytest.mark.parametrize(
    "sym,channel_group,groupsize,keeper",
    [
        (False, 1, 128, 0),
        (False, 2, 128, 128),   # Atom canonical: asym, cg=2, g128, keeper 128
        (True, 1, 128, 128),
        (False, 1, -1, 0),      # per-channel (no grouping)
    ],
)
def test_gptq_fasterquant_matches_reference(
    ref_modules, sym, channel_group, groupsize, keeper
):
    _, ref_gptq = ref_modules
    d_in, d_out = 384, 64
    w = _rand((d_out, d_in), seed=500 + channel_group + keeper)
    xs = [_rand((4, d_in), seed=600 + s) for s in range(4)]

    ref_w, h = _ref_fasterquant(
        ref_gptq, w, xs, bits=4, sym=sym, channel_group=channel_group,
        clip=0.9, groupsize=groupsize, keeper=keeper,
        keeper_precision=3 if keeper else 0,  # 3 = INT8 keepers
    )
    ours = np.asarray(gptq_quantize_weight(
        jnp.asarray(w), jnp.asarray(h),
        bits=4, sym=sym, group_size=max(groupsize, 0),
        channel_group=channel_group, keeper=keeper,
        keeper_precision=KeeperPrecision.INT8 if keeper else KeeperPrecision.FLOAT,
        percdamp=0.01, clip_ratio=0.9,
    ))
    # Error propagation compounds across 384 sequential columns through two
    # Cholesky factorizations; torch-CPU vs XLA GEMM summation orders leave
    # ~1e-4 noise in the compensated weights.  The 4-bit body grid decisions
    # must still agree elementwise.  The INT8 keeper block re-rounds the
    # compensated values on a ~0.05-wide grid, so inputs sitting within noise
    # of a .5 boundary may flip by exactly one step — allow at most a handful
    # of single-step flips and tight agreement everywhere else.
    diff = np.abs(ours - ref_w)
    close = diff <= 2e-4 + 2e-4 * np.abs(ref_w)
    n_mismatch = int((~close).sum())
    assert n_mismatch <= max(1, ours.size // 500), (
        f"{n_mismatch}/{ours.size} elements disagree beyond f32 noise"
    )
    if n_mismatch:
        assert keeper > 0, "body (4-bit) grid decisions must agree exactly"
        keeper_block = diff[:, -keeper:]
        step = np.abs(ref_w[:, -keeper:]).max(axis=1, keepdims=True) / 127.0
        assert (keeper_block <= 1.1 * step + 2e-4).all(), (
            "keeper mismatches exceed one INT8 grid step"
        )
        assert (diff[:, :-keeper] <= 2e-4 + 2e-4 * np.abs(ref_w[:, :-keeper])).all()


def test_reorder_indices_match_reference_sorts():
    """The reference's index builders are 5-line nested closures inside
    ``get_reorder_index`` (outlier.py:210-252): ascending sort for inputs,
    per-128 descending for QKV outputs.  Mirror them in torch here and
    compare our jnp implementations on the same saliency vectors."""
    rng = np.random.Generator(np.random.PCG64(9))
    sal = rng.standard_normal(1024).astype(np.float32)

    # reorder_tensor (outlier.py:212-219): ascending argsort
    _, ref_idx = torch.sort(torch.from_numpy(sal), descending=False)
    ours = np.asarray(reorder_index_ascending(jnp.asarray(sal)))
    np.testing.assert_array_equal(ours, ref_idx.numpy())

    # reorder_tensor_heads (outlier.py:221-233): per-head-128 descending
    slices = []
    t = torch.from_numpy(sal)
    for i in range(1024 // 128):
        _, u = torch.sort(t[i * 128:(i + 1) * 128], descending=True)
        slices.append(u + i * 128)
    ref_heads = torch.cat(slices).numpy()
    ours_heads = np.asarray(reorder_index_per_head(jnp.asarray(sal), 128))
    np.testing.assert_array_equal(ours_heads, ref_heads)
