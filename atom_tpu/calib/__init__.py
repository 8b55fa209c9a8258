from atom_tpu.calib.outlier import (
    ActStats,
    hessian_diag_update,
    abs_mean_update,
    reorder_index_ascending,
    reorder_index_per_head,
)
from atom_tpu.calib.gptq import GPTQState, gptq_quantize_weight

__all__ = [
    "ActStats",
    "hessian_diag_update",
    "abs_mean_update",
    "reorder_index_ascending",
    "reorder_index_per_head",
    "GPTQState",
    "gptq_quantize_weight",
]
