"""Calibration pipeline orchestration: stats -> reorder -> (GPTQ | RTN) weights.

TPU-native analog of the reference's per-arch drivers
(``model/modelutils_llama.py``) and of ``model/main.py``'s pipeline sequencing
(calibrate -> reorder -> act-quant-wrap -> weight-quant -> eval).  Differences by
design:

  * no forward hooks — the models return explicit taps;
  * activation quantization is not "installed" as module state; the same
    ``QuantSpec`` that will be used at eval time is simply passed to the
    tap-collecting forwards (matching the reference's ordering where act-quant
    wrappers are installed before GPTQ runs, ``model/main.py:252-263``);
  * q/k/v (and gate/up) share one Hessian — they see the same input tensor, so
    the reference's three separate accumulators are redundant work.

The per-layer streaming structure (embed once, walk layers, feed each layer the
previous layer's QUANTIZED outputs) matches ``quantize_model_gptq_llama``
(modelutils_llama.py:155-273): quantization error propagates into the
calibration data of later layers.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from atom_tpu.config import QuantSpec, FP16_BASELINE
from atom_tpu.calib.gptq import gptq_add_batch, gptq_init, gptq_quantize_weight
from atom_tpu.calib.outlier import SaliencyAccumulator
from atom_tpu.models.configs import Arch, ModelConfig

def _model_api(cfg: ModelConfig):
    """Late import of the per-arch functional model module."""
    if cfg.arch == Arch.LLAMA:
        from atom_tpu.models import llama as m
    elif cfg.arch == Arch.OPT:
        from atom_tpu.models import opt as m
    elif cfg.arch == Arch.MIXTRAL:
        from atom_tpu.models import mixtral as m
    else:
        raise ValueError(cfg.arch)
    return m


def collect_saliency(
    params,
    cfg: ModelConfig,
    batches: Sequence[jnp.ndarray],
    metric: str = "hessian",
) -> Dict[str, jnp.ndarray]:
    """Run the UNQUANTIZED model over calibration batches, fold act stats.

    Equivalent of ``get_act_stats_llama`` (outlier.py:9-106): stats come from the
    original fp model, before any reorder or quantization.
    """
    m = _model_api(cfg)
    acc = SaliencyAccumulator(metric=metric, nsamples=len(batches))
    for b in batches:
        _, taps = m.forward_collect_taps(params, b, cfg, FP16_BASELINE)
        acc.update({k: v for k, v in taps.items()})
    return acc.stats


def compute_reorder_indices(
    saliency: Dict[str, jnp.ndarray], head_dim: int
) -> Dict[str, jnp.ndarray]:
    acc = SaliencyAccumulator()
    acc.stats = dict(saliency)
    return acc.reorder_indices(head_dim=head_dim)


def reorder_model(
    params, cfg: ModelConfig, indices: Dict[str, jnp.ndarray]
):
    m = _model_api(cfg)
    return m.apply_reorder(params, cfg, indices)


def quantize_model_rtn(params, cfg: ModelConfig, spec: QuantSpec):
    m = _model_api(cfg)
    return m.quantize_weights_rtn(params, cfg, spec)


def quantize_model_gptq(
    params,
    cfg: ModelConfig,
    spec: QuantSpec,
    batches: Sequence[jnp.ndarray],
    scales_out: Optional[Dict[str, jnp.ndarray]] = None,
):
    """Layer-streamed GPTQ over the (already reordered) model.

    For each layer: accumulate one Hessian per distinct linear input from
    tap-collecting forwards (activations already fake-quantized per ``spec``),
    GPTQ-quantize every linear against its Hessian, then recompute the layer's
    outputs with the quantized weights as the next layer's calibration inputs.

    ``scales_out``: pass a dict to receive the per-group GPTQ scales, keyed
    ``"{layer_idx}.{weight_name}"`` -> [n_groups, out // channel_group] f32.
    GPTQ derives each group's grid from the error-compensated weights, so these
    scales are required for exact conversion into the packed serving format
    (``models.hf_loader.pack_calibrated_params``).
    """
    m = _model_api(cfg)
    xs = [m.embed(params, b) for b in batches]
    aux = m.layer_aux(params, cfg, batches[0].shape[1])

    layer_fwd = jax.jit(
        lambda lp, x: m.forward_layer(lp, x, *aux, cfg, spec)[0]
    )

    tap_specs = m.hessian_tap_specs(cfg)
    for i in range(cfg.num_layers):

        def quantize_fn(w_out_in, hessian, name=None, _layer=i):
            out = gptq_quantize_weight(
                w_out_in,
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
                return_scales=scales_out is not None,
            )
            if scales_out is None:
                return out
            wq, scales = out
            scales_out[f"{_layer}.{name}"] = scales
            return wq

        lp = m.get_layer(params, i)
        states = {t: gptq_init(f) for t, f in tap_specs.items()}
        for x in xs:
            _, taps = m.forward_layer(
                lp, x, *aux, cfg, spec, collect_taps=True
            )
            for tapname in states:
                states[tapname] = gptq_add_batch(states[tapname], taps[tapname])

        lp_q = m.gptq_apply(
            lp, {t: s.hessian for t, s in states.items()}, quantize_fn
        )
        params = m.set_layer(params, i, lp_q)
        xs = [layer_fwd(lp_q, x) for x in xs]
    return params


def calibrate(
    params,
    cfg: ModelConfig,
    spec: QuantSpec,
    batches: Sequence[jnp.ndarray],
    scales_out: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[object, Dict[str, jnp.ndarray]]:
    """Full pipeline: saliency -> reorder -> weight quant (GPTQ or RTN).

    Mirrors the ``model/main.py:224-266`` sequencing.  Returns (params, indices).
    ``scales_out`` (GPTQ only): see :func:`quantize_model_gptq` — required for
    exact export into the packed serving format.
    """
    indices: Dict[str, jnp.ndarray] = {}
    if spec.reorder:
        saliency = collect_saliency(params, cfg, batches, spec.act_sort_metric)
        indices = compute_reorder_indices(saliency, head_dim=cfg.head_dim)
        params = reorder_model(params, cfg, indices)
    if spec.quantize_weights:
        if spec.use_gptq:
            params = quantize_model_gptq(params, cfg, spec, batches, scales_out)
        else:
            params = quantize_model_rtn(params, cfg, spec)
    return params, indices
