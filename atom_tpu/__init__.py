"""atom-tpu: a TPU-native W4A4 quantized LLM inference framework.

A from-scratch JAX/XLA/Pallas implementation of the Atom (MLSys'24) quantization
scheme and the serving system around it — see SURVEY.md at the repo root for the
blueprint and the mapping to the reference implementation.
"""

from atom_tpu.config import (
    ATOM_W4A4,
    ATOM_W4A4_FP4,
    ATOM_W8A8,
    FP16_BASELINE,
    KeeperPrecision,
    QuantSpec,
    QuantType,
)

__version__ = "0.1.0"

__all__ = [
    "ATOM_W4A4",
    "ATOM_W4A4_FP4",
    "ATOM_W8A8",
    "FP16_BASELINE",
    "KeeperPrecision",
    "QuantSpec",
    "QuantType",
    "__version__",
]
