"""Device-mesh construction.

The reference has no distributed layer at all (SURVEY.md §2.6: a pthread
pool and a TCP socket). Here parallelism is first-class: a 2-D logical mesh
with ``data`` (DP, batch sharding — multi-host over DCN) and ``model``
(TP, weight sharding — intra-slice over ICI) axes, per the scaling-book
recipe. All sharded execution (bert_tpu.parallel.spmd, bert_tpu.train)
builds on this mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices.

    ``tp`` is the model-axis size; the data axis takes the rest. On real
    hardware the default device order keeps the model axis on ICI-adjacent
    chips (jax device order is mesh-local-major).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        # fail clearly up front: slicing would silently truncate and then
        # surface as a cryptic numpy reshape error below (review r4)
        raise ValueError(f"requested {n_devices} devices but only "
                         f"{len(devices)} are available")
    devices = list(devices)[:n_devices]
    if n_devices % tp != 0:
        raise ValueError(f"n_devices {n_devices} not divisible by tp {tp}")
    dp = n_devices // tp
    import numpy as np

    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names)
