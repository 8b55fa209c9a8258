from atom_tpu.parallel.mesh import make_mesh
from atom_tpu.parallel.shardings import (
    llama_param_specs,
    mixtral_param_specs,
    opt_param_specs,
    shard_params,
)

__all__ = [
    "make_mesh",
    "llama_param_specs",
    "mixtral_param_specs",
    "opt_param_specs",
    "shard_params",
]
