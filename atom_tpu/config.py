"""Quantization configuration — the single source of truth for the Atom W4A4 scheme.

The reference (efeslab/Atom) spreads its quantization configuration over ~30 argparse
flags (``model/main.py:58-191``) consumed independently by the fake-quant Python path
and the CUDA kernels (which hard-code group=128, keeper=128, head_dim=128).  Here the
scheme is one frozen dataclass consumed by

  * the pure-jnp reference implementation (``atom_tpu.quant.core``) — the test oracle
    and the "simulated quantization" accuracy path, and
  * the Pallas kernels (``atom_tpu.ops``) — the real serving path.

Being frozen + hashable it can be passed as a static argument to ``jax.jit``.

Canonical Atom setting (``scripts/run_atom_ppl.sh:11-16``): W4A4, symmetric weights and
activations, group 128 on both, weight channel-group 2, Hessian reorder, 128 INT8
keeper channels, clip 0.9 (act) / 0.85 (weight) / 1.0 (KV), INT4 asymmetric KV cache,
GPTQ weight calibration.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class KeeperPrecision(enum.IntEnum):
    """Precision of the mixed-precision outlier ("keeper") channels.

    Mirrors the reference's ``--keeper_precision`` flag (``model/main.py:126-129``):
    0 = leave in float (fp16/bf16), 1 = FP8 E5M2 cast, 2 = FP8 E4M3 cast,
    3 = INT8 symmetric per-row quantization (the paper's setting).
    """

    FLOAT = 0
    FP8_E5M2 = 1
    FP8_E4M3 = 2
    INT8 = 3


class QuantType(str, enum.Enum):
    """Uniform INT vs non-uniform FP4 code mapping (``--quant_type``)."""

    INT = "int"
    FP = "fp"


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Full description of the Atom quantization scheme.

    Defaults are the canonical paper configuration.  ``wbits/abits >= 16`` disables
    the corresponding quantization, matching ``model/quant.py:189-190`` and
    ``model/qLinearLayer.py:44-45``.
    """

    # Bit widths.
    wbits: int = 4
    abits: int = 4

    # Symmetric (absmax) vs asymmetric (min/max affine) uniform quantization.
    w_sym: bool = True
    a_sym: bool = True

    # Group sizes along the channel (last) dimension; 0 = per-channel/per-token.
    weight_group_size: int = 128
    act_group_size: int = 128

    # Number of adjacent output channels (weight rows) sharing one scale, for
    # scale-load efficiency in the real kernels (``--weight_channel_group``).
    weight_channel_group: int = 2

    # Mixed precision: the `keeper` most-salient channels (moved last by the
    # calibration reorder) stay at higher precision.
    keeper: int = 128
    keeper_precision: KeeperPrecision = KeeperPrecision.INT8

    # Clip ratios: new_max = max * clip_ratio.
    w_clip_ratio: float = 0.85
    a_clip_ratio: float = 0.9
    kv_clip_ratio: float = 1.0

    # Asymmetric per-head KV-cache quantization at `abits`.
    kv_cache: bool = True

    # INT vs FP4 code mapping, and the exponent-only experimental mode
    # (``model/quant.py:147-163``; unused by Atom's canonical config).
    quant_type: QuantType = QuantType.INT
    exponential: bool = False

    # Calibration: channel reordering by activation saliency.
    reorder: bool = True
    act_sort_metric: str = "hessian"  # or "abs_mean"

    # Serving: allow the fused norm+quant-prologue kernels on the decode
    # path (``serving/model.py``).  The fused kernels match the unfused op
    # chain up to rare quantization-boundary code flips (f32 reductions
    # reassociate between separately-compiled programs); parity tests that
    # require BITWISE equality between two serving configurations (e.g. TP
    # vs single-chip) disable them.
    fused_serving: bool = True

    # GPTQ weight calibration.
    use_gptq: bool = True
    percdamp: float = 0.01

    # Static (pre-calibrated scale) activation quantization is deprecated in Atom;
    # dynamic per-token quantization is the only supported path
    # (``model/quant.py:269-272``).

    def __post_init__(self):
        if self.quant_type == QuantType.FP and self.wbits not in (4, 16):
            raise ValueError("FP quant_type only supports 4-bit (FP4) weights")
        if self.weight_channel_group < 1:
            raise ValueError("weight_channel_group must be >= 1")
        if self.keeper < 0:
            raise ValueError("keeper must be >= 0")

    # -- Derived helpers -----------------------------------------------------
    @property
    def quantize_weights(self) -> bool:
        return self.wbits < 16

    @property
    def quantize_acts(self) -> bool:
        return self.abits < 16

    def replace(self, **kw) -> "QuantSpec":
        return dataclasses.replace(self, **kw)


# Canonical presets -----------------------------------------------------------

ATOM_W4A4 = QuantSpec()

ATOM_W4A4_FP4 = QuantSpec(quant_type=QuantType.FP)

ATOM_W8A8 = QuantSpec(
    wbits=8,
    abits=8,
    weight_channel_group=1,
    keeper=0,
    keeper_precision=KeeperPrecision.FLOAT,
    w_clip_ratio=1.0,
    a_clip_ratio=1.0,
)

FP16_BASELINE = QuantSpec(
    wbits=16,
    abits=16,
    keeper=0,
    keeper_precision=KeeperPrecision.FLOAT,
    kv_cache=False,
    reorder=False,
    use_gptq=False,
)
