"""Device mesh construction for multi-chip serving.

The reference has no distributed backend at all (SURVEY.md §2.4 — its only
multi-GPU support is host-driven per-layer placement,
``model/parallel_utils.py:89-163``).  Scaling here is the TPU-native way: a
``jax.sharding.Mesh`` whose axes map onto ICI (intra-slice) and DCN
(inter-slice), with XLA GSPMD inserting and overlapping the collectives.

Axes:
  * ``dp`` — data parallel over requests/batch (DCN-friendly outermost axis);
  * ``tp`` — tensor parallel over heads / hidden (wants ICI bandwidth);
  * Mixtral adds expert parallelism by sharding the stacked expert axis over
    ``tp`` (see ``shardings.mixtral_param_specs``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the ``tp`` axis (single-host serving wants maximum
    tensor parallelism; ``dp`` grows across hosts).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n) if len(axis_names) == 2 else (n,)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)
