from atom_tpu.quant.core import (
    GroupQuant,
    dequantize_groups,
    fake_quantize_tensor,
    quantize_activation,
    quantize_groups,
    quantize_keeper,
    quantize_kv_head,
    quantize_kv_head_real,
    quantize_weight,
    quantize_weight_grouped,
)
from atom_tpu.quant.fp import (
    fake_cast_e4m3,
    fake_cast_e5m2,
    fake_quantize_fp4,
)
from atom_tpu.quant.packing import (
    pack_int4,
    pack_uint4,
    unpack_int4,
    unpack_uint4,
)

__all__ = [
    "GroupQuant",
    "dequantize_groups",
    "fake_quantize_tensor",
    "quantize_activation",
    "quantize_groups",
    "quantize_keeper",
    "quantize_kv_head",
    "quantize_kv_head_real",
    "quantize_weight",
    "quantize_weight_grouped",
    "fake_cast_e4m3",
    "fake_cast_e5m2",
    "fake_quantize_fp4",
    "pack_int4",
    "pack_uint4",
    "unpack_int4",
    "unpack_uint4",
]
